"""Per-primitive shading rows: one fetch per bounce for ALL shading inputs.

The reference dereferences ``rec.mat_ptr`` then the material's texture per
path vertex (reference: raytracer/src/main.rs:244-245 ->
material/mod.rs:51-57 -> texture/mod.rs:26-28).  Round 1 mirrored that with
separate per-ray one-hot contractions over the material and texture tables
at every bounce stage — profiling showed those fetches costing as much as
intersection on material-heavy scenes (random_scene has ~500 materials).

TPU-native fix: resolve material -> texture -> parameters *per primitive*
once per trace into a dense ``(S, P)`` matrix (two tiny one-hot dots over
the small tables, still differentiable w.r.t. the table leaves), and let
``hit_details`` fetch these rows together with the geometry rows in its ONE
per-ray contraction.  ``emitted``/``scatter`` then read pre-fetched values.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from ..scene.types import SceneData, TEX_CHECKER
from .tables import take_cols_multi


@flax.struct.dataclass
class Shade:
    """Per-ray shading inputs for the winning primitive."""

    mat_kind: jnp.ndarray  # i32[N]
    mat_param: jnp.ndarray  # f32[N] (metal fuzz / dielectric ir)
    tex_kind: jnp.ndarray  # i32[N]
    color: jnp.ndarray  # f32[3, N] solid color / emission
    scale: jnp.ndarray  # f32[N] noise scale
    img: jnp.ndarray  # i32[N] atlas index
    img_h: jnp.ndarray  # i32[N]
    img_w: jnp.ndarray  # i32[N]
    odd: jnp.ndarray  # f32[3, N] checker odd color
    even: jnp.ndarray  # f32[3, N] checker even color


def n_shade_rows(features: frozenset) -> int:
    return 10 + (6 if "checker" in features else 0)


def shade_table_mats(scene: SceneData) -> jnp.ndarray:
    """Resolve mat -> tex -> params per MATERIAL -> f32[S, M].

    All shading inputs are functions of the material id alone, so the table
    is keyed by material — the per-ray fetch is then a one-hot dot over the
    small material table even when the scene has tens of thousands of
    primitives (the round-3 wwscene fetch went through the 13k-prim table
    and fell off the one-hot path into per-element gathers).

    Differentiable w.r.t. ``materials.param`` and ``textures.color`` (the
    one-hot contraction VJP is an MXU scatter-add back into the tables).
    Runs once per trace; cost is O(M), negligible next to the wavefront.
    """
    mt, tt = scene.materials, scene.textures
    tex_tables = [tt.kind, tt.color, tt.scale, tt.img, tt.atlas_size[:, tt.img]]
    if "checker" in scene.stats.features:
        # checker sub-textures are always solids (texture/mod.rs:40-48)
        tex_tables.append(tt.color[:, tt.sub[0]])
        tex_tables.append(tt.color[:, tt.sub[1]])
    rows = take_cols_multi(tex_tables, mt.tex)
    tk, color, sc, img, wh = rows[:5]
    parts = [
        mt.kind.astype(jnp.float32)[None],
        mt.param[None],
        tk.astype(jnp.float32)[None],
        color,
        sc[None],
        img.astype(jnp.float32)[None],
        wh.astype(jnp.float32),
    ]
    if "checker" in scene.stats.features:
        parts.append(rows[5])
        parts.append(rows[6])
    return jnp.concatenate(parts, axis=0)


def shade_table(scene: SceneData) -> jnp.ndarray:
    """Per-primitive shading rows f32[S, P] (compat wrapper: the mat-keyed
    table gathered at each primitive's material id)."""
    return shade_table_mats(scene)[:, scene.mat_id]


def shade_from_rows(rows: jnp.ndarray, features: frozenset) -> Shade:
    """Split fetched ``(S, N)`` rows back into a :class:`Shade`."""
    has_checker = "checker" in features
    zeros3 = jnp.zeros_like(rows[3:6])

    def as_i32(r):
        return jnp.round(r).astype(jnp.int32)

    return Shade(
        mat_kind=as_i32(rows[0]),
        mat_param=rows[1],
        tex_kind=as_i32(rows[2]),
        color=rows[3:6],
        scale=rows[6],
        img=as_i32(rows[7]),
        img_h=as_i32(rows[8]),
        img_w=as_i32(rows[9]),
        odd=rows[10:13] if has_checker else zeros3,
        even=rows[13:16] if has_checker else zeros3,
    )
