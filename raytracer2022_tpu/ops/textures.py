"""Batched texture evaluation over the flat texture table.

Replaces the reference's ``Texture`` trait objects
(reference: raytracer/src/texture/mod.rs) with integer-id dispatch and
masked evaluation.  Static per-scene ``features`` flags let XLA skip whole
sub-evaluators (perlin / image gathers) for scenes that never use them.

Vectors are component-leading (3, N); see ops.vecmath.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..scene.types import (
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
    TEX_OBJUV,
    TextureTable,
)

PI = math.pi


def _hermite(x):
    return x * x * (3.0 - 2.0 * x)


def perlin_noise(tt: TextureTable, p: jnp.ndarray) -> jnp.ndarray:
    """Perlin gradient noise (reference texture/perlin.rs:52-99).

    Reproduces the reference exactly, including its double Hermite smoothing
    quirk: ``noise()`` smooths (u,v,w) in place (perlin.rs:56-58) and
    ``trilinear_interp`` smooths the already-smoothed values again for the
    interpolation weights (perlin.rs:81-83) while using the single-smoothed
    values in the gradient offset vectors (perlin.rs:90).
    """
    xs = p  # (3, N)
    fl = jnp.floor(xs)
    uvw1 = _hermite(xs - fl)  # single-smoothed (the reference's u,v,w)
    uvw2 = _hermite(uvw1)  # double-smoothed weights (uu,vv,ww)
    ijk = fl.astype(jnp.int32)  # (3, N)

    from .tables import take_cols_nib

    # per-axis permutation lookups: ONE nibble-factored contraction per
    # axis fetches BOTH offsets — row 1 of the stacked table is the rolled
    # permutation, so perm[i] and perm[(i+1)&255] ride the same dot.
    # Per-ray gathers from the 256-entry tables are the TPU anti-pattern;
    # the (256, N) one-hot builds those fetches need were the dominant
    # texture cost, so all perlin fetches use the 32x8 factorization
    # (take_cols_nib: 6.4x fewer compare ops, and the measured-best
    # lo/hi split — see its docstring).  Perm values are 0..255, exact
    # in one bf16 pass.
    perm = []
    for a in range(3):
        stacked = jnp.stack([tt.perlin_perm[a], jnp.roll(tt.perlin_perm[a], -1)])
        both = take_cols_nib(stacked, ijk[a] & 255, passes=1)  # (2, N)
        perm.append([both[0], both[1]])
    accum = jnp.zeros_like(p[0])
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                idx = perm[0][di] ^ perm[1][dj] ^ perm[2][dk]
                # 2 bf16 passes keep ~16 mantissa bits of the gradient
                # vectors — noise error ~1e-5, far below MC noise
                g = take_cols_nib(tt.perlin_vec, idx, passes=2)  # (3, N)
                w0 = uvw1[0] - di
                w1 = uvw1[1] - dj
                w2 = uvw1[2] - dk
                grad_dot = g[0] * w0 + g[1] * w1 + g[2] * w2
                wx = uvw2[0] if di else (1.0 - uvw2[0])
                wy = uvw2[1] if dj else (1.0 - uvw2[1])
                wz = uvw2[2] if dk else (1.0 - uvw2[2])
                accum = accum + grad_dot * wx * wy * wz
    return accum


def perlin_turb(tt: TextureTable, p: jnp.ndarray, depth: int = 7) -> jnp.ndarray:
    """Turbulence: |sum of 7 halved octaves| (perlin.rs:100-112)."""
    accum = jnp.zeros_like(p[0])
    tmp_p = p
    weight = 1.0
    for _ in range(depth):
        accum = accum + weight * perlin_noise(tt, tmp_p)
        weight *= 0.5
        tmp_p = tmp_p * 2.0
    return jnp.abs(accum)


def _image_lookup(tt: TextureTable, img_id, w, h, i, j):
    """Gather a texel (atlas rows are pre-v-flipped like the reference's
    loader, texture/mod.rs:96-105). Returns (3, N) in [0, ~1].

    The atlas is u32-packed RGB: ONE per-lane gather, then bit unpack on
    the VPU (3x fewer gathers than a channel-planar atlas)."""
    i = jnp.clip(i, 0, w - 1)
    j = jnp.clip(j, 0, h - 1)
    packed = tt.atlas[img_id, j, i].astype(jnp.uint32)  # (N,)
    color_scale = 1.0 / 255.999
    return (
        jnp.stack(
            [
                (packed & 0xFF).astype(jnp.float32),
                ((packed >> 8) & 0xFF).astype(jnp.float32),
                ((packed >> 16) & 0xFF).astype(jnp.float32),
            ]
        )
        * color_scale
    )


def _eval_image(tt: TextureTable, img_id, w, h, u, v):
    """ImageTexture nearest-neighbor sample (texture/mod.rs:111-138)."""
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    i = (u * w.astype(jnp.float32)).astype(jnp.int32)
    j = (v * h.astype(jnp.float32)).astype(jnp.int32)
    return _image_lookup(tt, img_id, w, h, i, j)


def _eval_objuv(tt: TextureTable, img_id, w, h, tex_uv):
    """ObjTexture sample (texture/mod.rs:167-188): uv already interpolated
    from the triangle's per-vertex uvs in the hit record; this indexes from
    the image TOP (j = (1-v)*H), so flip against our pre-flipped atlas."""
    u = tex_uv[0]
    v = tex_uv[1]
    i = (u * w.astype(jnp.float32)).astype(jnp.int32)
    j_top = ((1.0 - v) * h.astype(jnp.float32)).astype(jnp.int32)
    j_top = jnp.clip(j_top, 0, h - 1)
    j = h - 1 - j_top  # atlas is stored bottom-up
    return _image_lookup(tt, img_id, w, h, i, j)


def eval_texture_shade(
    tt: TextureTable,
    shade,  # ops.shade.Shade — pre-fetched per-ray texture rows
    u: jnp.ndarray,
    v: jnp.ndarray,
    p: jnp.ndarray,  # (3, N)
    tex_uv: jnp.ndarray,  # (2, N)
    features: frozenset = frozenset(),
) -> jnp.ndarray:
    """Texture value from pre-fetched shading rows (Texture::value dispatch).

    The per-ray table fetches live in ``hit_details``' single one-hot
    contraction (ops/shade.py); only the global resources — perlin tables,
    the image atlas — are read here.
    """
    kind = shade.tex_kind
    value = shade.color  # TEX_SOLID (texture/mod.rs:26-28)
    if "noise" in features:
        # NoiseTexture marble (texture/mod.rs:76-78)
        noise_val = 0.5 * (1.0 + jnp.sin(shade.scale * p[2] + 10.0 * perlin_turb(tt, p)))
        value = jnp.where(kind[None] == TEX_NOISE, noise_val[None], value)
    if "image" in features:
        img_val = _eval_image(tt, shade.img, shade.img_w, shade.img_h, u, v)
        value = jnp.where(kind[None] == TEX_IMAGE, img_val, value)
    if "objuv" in features:
        obj_val = _eval_objuv(tt, shade.img, shade.img_w, shade.img_h, tex_uv)
        value = jnp.where(kind[None] == TEX_OBJUV, obj_val, value)
    if "checker" in features:
        # CheckerTexture sine-product select (texture/mod.rs:52-59)
        sines = jnp.sin(10.0 * p[0]) * jnp.sin(10.0 * p[1]) * jnp.sin(10.0 * p[2])
        checker_val = jnp.where((sines < 0.0)[None], shade.odd, shade.even)
        value = jnp.where(kind[None] == TEX_CHECKER, checker_val, value)
    return value
