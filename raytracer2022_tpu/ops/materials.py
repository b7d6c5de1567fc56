"""Batched material scatter / emission from pre-fetched shading rows.

Replaces the reference's ``Material`` trait objects
(reference: raytracer/src/material/mod.rs:15-231) with one masked scatter
pass switching on integer ``kind``.  Albedo/emission colors, metal fuzz and
dielectric IOR live in differentiable table leaves, which is what makes the
whole renderer differentiable w.r.t. materials.

All per-ray material/texture parameters arrive pre-fetched in an
:class:`~raytracer2022_tpu.ops.shade.Shade` (fetched together with the
geometry rows in ``hit_details``' single one-hot contraction); only global
resources (perlin tables, image atlas) are read from the texture table here.
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp

from ..scene.types import (
    DIELECTRIC,
    DIFFUSE_LIGHT,
    ISOTROPIC,
    METAL,
    TextureTable,
)
from .intersect import Hit
from .sampling import uniform_in_unit_sphere
from .shade import Shade
from .textures import eval_texture_shade
from .vecmath import dot, reflect, refract, scale, to_unit

PI = math.pi


@flax.struct.dataclass
class Scatter:
    """SoA ScatterRecord (reference material/mod.rs:217-231)."""

    has_scatter: jnp.ndarray  # bool[N] — False for DiffuseLight (absorbs)
    is_specular: jnp.ndarray  # bool[N] — metal/dielectric/isotropic
    spec_dir: jnp.ndarray  # f32[3, N]
    spec_time: jnp.ndarray  # f32[N]
    attenuation: jnp.ndarray  # f32[3, N]


def texture_value(
    tt: TextureTable,
    shade: Shade,
    hit: Hit,
    features: frozenset,
) -> jnp.ndarray:
    """The winning primitive's texture value (3, N) — computed ONCE per
    bounce and shared by :func:`emitted` and :func:`scatter` (the reference
    evaluates it once per material method too, but each evaluation here is a
    full perlin/atlas pass over the wavefront, so sharing it halves the
    shading cost of textured scenes)."""
    return eval_texture_shade(tt, shade, hit.u, hit.v, hit.p, hit.tex_uv, features)


def emitted(
    shade: Shade,
    hit: Hit,
    tex_val: jnp.ndarray,
) -> jnp.ndarray:
    """DiffuseLight::emitted — texture value only on front faces
    (material/mod.rs:174-180); all other kinds emit black."""
    is_light = shade.mat_kind == DIFFUSE_LIGHT
    return jnp.where((is_light & hit.front & hit.hit)[None], tex_val, 0.0)


def scatter(
    shade: Shade,
    hit: Hit,
    tex_val: jnp.ndarray,  # f32[3, N] pre-evaluated texture value (albedo)
    d_in: jnp.ndarray,  # f32[3, N] incoming ray direction
    tm: jnp.ndarray,  # f32[N] incoming ray time
    key,
) -> Scatter:
    """One masked pass implementing all five scatter functions."""
    kind = shade.mat_kind
    param = shade.mat_param
    n = hit.normal

    albedo = tex_val

    k_fuzz, k_diel, k_iso = jax.random.split(key, 3)
    shape = tm.shape

    # Metal (material/mod.rs:85-96): reflect + fuzz * in-ball jitter;
    # scattered ray time is hard-coded 0 in the reference (mod.rs:92).
    unit_d = to_unit(d_in)
    metal_dir = reflect(unit_d, n) + scale(uniform_in_unit_sphere(k_fuzz, shape), param)

    # Dielectric (material/mod.rs:120-147).  Use a neutral IOR on
    # non-dielectric lanes: param is 0 there and 1/0 = inf would poison the
    # masked branch's VJP.
    ir = jnp.where(kind == DIELECTRIC, param, 1.5)
    refraction_ratio = jnp.where(hit.front, 1.0 / ir, ir)
    cos_theta = jnp.minimum(dot(-unit_d, n), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    cannot_refract = refraction_ratio * sin_theta > 1.0
    r0 = (1.0 - refraction_ratio) / (1.0 + refraction_ratio)
    r0 = r0 * r0
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    rnd = jax.random.uniform(k_diel, shape)
    do_reflect = cannot_refract | (reflectance > rnd)
    diel_dir = jnp.where(
        do_reflect[None], reflect(unit_d, n), refract(unit_d, n, refraction_ratio)
    )

    # Isotropic (material/mod.rs:207-213): uniform in-ball direction
    iso_dir = uniform_in_unit_sphere(k_iso, shape)

    is_metal = kind == METAL
    is_diel = kind == DIELECTRIC
    is_iso = kind == ISOTROPIC
    is_specular = is_metal | is_diel | is_iso
    has_scatter = kind != DIFFUSE_LIGHT

    spec_dir = jnp.where(
        is_metal[None], metal_dir, jnp.where(is_diel[None], diel_dir, iso_dir)
    )
    spec_time = jnp.where(is_metal, 0.0, tm)

    # Dielectric attenuation is (1,1,1) (mod.rs:144)
    attenuation = jnp.where(is_diel[None], 1.0, albedo)

    return Scatter(
        has_scatter=has_scatter,
        is_specular=is_specular,
        spec_dir=spec_dir,
        spec_time=spec_time,
        attenuation=attenuation,
    )


def scattering_pdf_lambertian(normal: jnp.ndarray, scattered_dir: jnp.ndarray) -> jnp.ndarray:
    """Lambertian::scattering_pdf = max(cos, 0)/pi (material/mod.rs:58-65)."""
    cosine = dot(normal, to_unit(scattered_dir))
    return jnp.where(cosine < 0.0, 0.0, cosine / PI)
