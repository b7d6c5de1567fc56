"""Compiled flat SoA scene representation.

The reference scene is a tree of ``Arc<dyn Hittable>`` trait objects
(reference: raytracer/src/hittable/mod.rs:59-133).  Dynamic dispatch and
pointer chasing do not exist on a TPU; instead the scene *compiler*
(:mod:`raytracer2022_tpu.scene.builder`) lowers every hittable into rows of
flat device arrays, and dispatch happens by integer ``kind`` with masked
vectorized evaluation.

Layout conventions (TPU-first):
  * All per-primitive arrays are **field-leading**: ``params[j]`` is a
    ``[P]``-shaped lane-tiled array, never ``[P, 16]``.
  * Vectors are component-leading ``(3, ...)`` (see ``ops.vecmath``).

Primitive param slots (``params: f32[NPARAM, P]``):

  SPHERE   (sphere.rs:11-91)       0:cx 1:cy 2:cz 3:radius
  MSPHERE  (sphere.rs:93-178)      0:c0x 1:c0y 2:c0z 3:radius 4:c1x 5:c1y
                                   6:c1z 7:time0 8:time1
  RECT     (aarect.rs, unified)    0:a0 1:a1 2:b0 3:b1 4:k 5:const-axis
                                   (axis 2 = XYRect, 1 = XZRect, 0 = YZRect)
  TRIANGLE (triangle.rs)           0-8: vertices a,b,c; 9-14: per-vertex
                                   (u,v) pairs for ObjTexture; 15: has_uv
  RING     (ring.rs)               0:r 1:t 2:dist_min 3:dist_max (squared)
  MEDIUM   (constantmedium.rs)     0:neg_inv_density;
                                   iparams 0:boundary_start 1:boundary_count
  BOX      (boxes.rs, fused)       0-2: lo, 3-5: hi.  The reference lowers a
                                   box to 6 face rects in a HittableList
                                   (boxes.rs:23-66); the closest hit over
                                   those 6 rects IS the box slab test, so
                                   one BOX row replaces 6 RECT rows at ~1
                                   rect's cost (winning-face t, normal and
                                   uv are identical).  Rotated boxes carry
                                   the usual world->object similarity.

Instance wrappers ``Translate/RotateY/Zoom/FlipFace``
(hittable/mod.rs:135-331) are baked per primitive: either directly into the
geometry params (spheres/triangles under any similarity transform) or into a
per-primitive world->object similarity ``(rot, inv_scale, trans)`` plus a
``flip`` bit.  Note the reference's ``Zoom`` scales only the ray origin
(mod.rs:321-330); per SURVEY.md §2 row 15 we implement the intended
capability — a proper uniform-scale similarity transform.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.struct
import jax.numpy as jnp

# Primitive kinds
SPHERE = 0
MSPHERE = 1
RECT = 2
TRIANGLE = 3
RING = 4
MEDIUM = 5
BOX = 6

NPARAM = 16

# Material kinds (reference material/mod.rs)
LAMBERTIAN = 0
METAL = 1
DIELECTRIC = 2
DIFFUSE_LIGHT = 3
ISOTROPIC = 4

# Texture kinds (reference texture/mod.rs)
TEX_SOLID = 0
TEX_CHECKER = 1
TEX_NOISE = 2
TEX_IMAGE = 3
TEX_OBJUV = 4


@flax.struct.dataclass
class TextureTable:
    """Flat texture table (reference texture/mod.rs traits -> integer ids).

    ``color`` doubles as the solid color / emission value and is a
    differentiable leaf.  ``sub`` holds the checker odd/even sub-texture ids
    (sub-textures must be solids — the only form the reference ever builds,
    texture/mod.rs:40-48).  ``atlas`` is a padded stack of images with
    per-image sizes for clamping, u32-PACKED (R | G<<8 | B<<16) so a texel
    fetch is ONE per-lane gather instead of three channel gathers.
    """

    kind: jnp.ndarray  # i32[T]
    color: jnp.ndarray  # f32[3, T] (differentiable)
    sub: jnp.ndarray  # i32[2, T] checker (odd, even)
    scale: jnp.ndarray  # f32[T] noise scale
    img: jnp.ndarray  # i32[T] atlas index
    atlas: jnp.ndarray  # u32[I, Hmax, Wmax] packed RGB
    atlas_size: jnp.ndarray  # i32[2, I] (h, w)
    perlin_vec: jnp.ndarray  # f32[3, 256] unit gradient vectors (perlin.rs:17-31)
    perlin_perm: jnp.ndarray  # i32[3, 256] shuffled permutations (perlin.rs:33-48)


@flax.struct.dataclass
class MaterialTable:
    """Flat material table (reference material/mod.rs:15-25).

    ``param`` is fuzz for METAL (clamped <= 1 at build), ir for DIELECTRIC;
    differentiable leaf.
    """

    kind: jnp.ndarray  # i32[M]
    tex: jnp.ndarray  # i32[M] albedo / emission texture id
    param: jnp.ndarray  # f32[M] (differentiable)


@flax.struct.dataclass
class ClusterTree:
    """Two-level acceleration structure: fixed-size primitive clusters.

    Replaces the reference's deep ``Arc<dyn Hittable>`` BVH
    (bvh/mod.rs:12-15) with the TPU-native shape: the host BVH build is cut
    into treelets of <= M primitives ("clusters", contiguous windows of the
    reordered primitive array).  Traversal tests every ray against all C
    cluster AABBs densely (one fused VPU pass), then visits clusters
    front-to-back per ray *block* with early exit — every step is a dense
    (M, block) primitive test plus one one-hot MXU fetch of the cluster's
    packed columns.  Worst case equals brute force; typical blocks touch a
    small fraction of clusters.

    ``pack`` columns (cluster-major): row 0 = window start prim id, row 1 =
    window count, rows 2.. = params param-major ([q * M + j] for param q of
    slot j; padding slots replicate the cluster's LAST prim — the traversal
    maps winner slot j to prim ``start + min(j, count-1)``), then — when
    the tree's prims carry transforms — rot(9M), trans(3M), inv_scale(M).
    """

    bmin: jnp.ndarray  # f32[3, C]
    bmax: jnp.ndarray  # f32[3, C]
    pack: jnp.ndarray  # f32[R, C]


@dataclasses.dataclass(frozen=True)
class SceneStats:
    """Static (hashable, non-traced) per-scene metadata.

    ``mediums``: tuple of (medium_prim_id, boundary_start, boundary_count);
    ``features``: which texture kinds the scene uses (lets XLA skip dead
    evaluators); ``light_ids``: concrete light prim ids for unrolled light
    sampling loops.
    """

    mediums: Tuple[Tuple[int, int, int], ...] = ()
    features: frozenset = frozenset()
    light_ids: Tuple[int, ...] = ()
    light_kinds: Tuple[int, ...] = ()
    light_axes: Tuple[int, ...] = ()  # rect constant axis per light (0 otherwise)
    n_in_bvh: int = 0
    # One cluster tree per large homogeneous kind, aligned with
    # SceneData.clusters: (kind, n_clusters, cluster_size, nparam, has_xf).
    # Homogeneous trees keep the leaf test a single static formula.
    trees: Tuple[Tuple[int, int, int, int, bool], ...] = ()
    time0: float = 0.0
    time1: float = 1.0
    # Homogeneous (kind, start, stop) windows covering the brute-forced
    # primitive region — the compiler groups prims by kind so candidate_t
    # evaluates exactly one intersection formula per window.
    kind_ranges: Tuple[Tuple[int, int, int], ...] = ()
    # All prim kinds present anywhere in the scene (gates the masked
    # formula switch in gathered-row evaluation / BVH leaves).
    kinds_present: Tuple[int, ...] = ()
    # Static world AABB (min, max) — quantization box for the per-bounce
    # ray-coherence sort key (ops/sort.py).
    world_bounds: Tuple[Tuple[float, float, float], Tuple[float, float, float]] = (
        (0.0, 0.0, 0.0),
        (1.0, 1.0, 1.0),
    )


@flax.struct.dataclass
class SceneData:
    """The complete compiled scene: geometry + shading tables + lights."""

    # Geometry (P primitives, including inactive medium-boundary rows).
    # Medium boundary windows are static metadata (stats.mediums), not a
    # device array — the bounce loop never reads them per ray.
    kind: jnp.ndarray  # i32[P]
    params: jnp.ndarray  # f32[NPARAM, P]
    mat_id: jnp.ndarray  # i32[P]
    flip: jnp.ndarray  # bool[P]  (FlipFace, hittable/mod.rs:267-292)
    active: jnp.ndarray  # bool[P] (False for medium boundary shadow prims)

    # Per-primitive world->object similarity transform
    xf_rot: jnp.ndarray  # f32[3, 3, P]
    xf_inv_scale: jnp.ndarray  # f32[P]
    xf_trans: jnp.ndarray  # f32[3, P]

    materials: MaterialTable
    textures: TextureTable

    lights: jnp.ndarray  # i32[L] prim ids used for light sampling (may be empty)

    # Per-kind cluster forest (see SceneStats.trees); empty tuple = all-dense
    clusters: Tuple[ClusterTree, ...] = ()
    # 8-ary packet trees aligned with ``clusters`` (ops/bvh8.py) — the
    # Pallas forward fast path; None where the tree carries transforms
    bvh8: Tuple = ()

    # Static (non-traced) metadata
    any_xform: bool = flax.struct.field(pytree_node=False, default=False)
    any_medium: bool = flax.struct.field(pytree_node=False, default=False)
    stats: SceneStats = flax.struct.field(pytree_node=False, default=SceneStats())

    @property
    def n_prims(self) -> int:
        return self.kind.shape[0]

    @property
    def n_lights(self) -> int:
        return self.lights.shape[0]

    @property
    def use_bvh(self) -> bool:
        return len(self.clusters) > 0
