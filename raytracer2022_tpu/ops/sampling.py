"""Closed-form batched samplers on component-leading ``(3, *batch)`` vectors.

The reference uses rejection loops (raytracer/src/basic/vec.rs:69-106) which
are TPU-hostile (data-dependent trip counts).  Every sampler here is a
closed-form transform of uniform variates producing the *same distribution*,
so renders agree within Monte-Carlo noise.  All samplers take a
``jax.random`` key (counter-based threefry: reproducible, order-independent,
shardable) and a batch ``shape``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .vecmath import dot, onb_from_w, onb_local, scale, to_unit, vec3

PI = math.pi


def uniform_on_unit_sphere(key, shape) -> jnp.ndarray:
    """Uniform direction on the unit sphere, via z/phi closed form."""
    kz, kp = jax.random.split(key)
    z = jax.random.uniform(kz, shape, minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(kp, shape, minval=0.0, maxval=2.0 * PI)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_in_unit_sphere(key, shape) -> jnp.ndarray:
    """Uniform point in the unit ball (vec.rs:69-76, closed form).

    radius ~ U^(1/3) times a uniform direction matches the rejection
    sampler's distribution exactly.
    """
    kd, kr = jax.random.split(key)
    direction = uniform_on_unit_sphere(kd, shape)
    radius = jax.random.uniform(kr, shape) ** (1.0 / 3.0)
    return scale(direction, radius)


def uniform_in_unit_disk(key, shape) -> jnp.ndarray:
    """Uniform point in the unit XY disk, z=0 (vec.rs:88-96, closed form)."""
    kr, kp = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(kr, shape))
    phi = jax.random.uniform(kp, shape, minval=0.0, maxval=2.0 * PI)
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r))


def cosine_direction(key, shape) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction about +z (reference pdf.rs:12-21)."""
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, shape)
    r2 = jax.random.uniform(k2, shape)
    z = jnp.sqrt(1.0 - r2)
    phi = 2.0 * PI * r1
    sq_r2 = jnp.sqrt(r2)
    return vec3(jnp.cos(phi) * sq_r2, jnp.sin(phi) * sq_r2, z)


def cosine_about_normal(key, normal: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted direction about ``normal`` (CosPdf::generate, pdf.rs:43-45)."""
    local = cosine_direction(key, normal.shape[1:])
    u, v, w = onb_from_w(normal)
    return onb_local(u, v, w, local)


def to_sphere(key, radius: jnp.ndarray, dist_sqr: jnp.ndarray) -> jnp.ndarray:
    """Cone sample toward a sphere of ``radius`` at squared distance
    ``dist_sqr``, in the local frame whose +z points at the sphere center
    (reference vec.rs:108-117)."""
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, radius.shape)
    r2 = jax.random.uniform(k2, radius.shape)
    rel = 1.0 - radius * radius / dist_sqr
    cos_max = jnp.where(rel > 0.0, jnp.sqrt(jnp.where(rel > 0.0, rel, 1.0)), 0.0)
    z = 1.0 + r2 * (cos_max - 1.0)
    phi = 2.0 * PI * r1
    zz = 1.0 - z * z
    s = jnp.where(zz > 0.0, jnp.sqrt(jnp.where(zz > 0.0, zz, 1.0)), 0.0)
    return vec3(jnp.cos(phi) * s, jnp.sin(phi) * s, z)


def cos_pdf_value(direction: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Cosine-hemisphere pdf of ``direction`` about unit axis ``w``
    (CosPdf::value, pdf.rs:46-53): cos/pi clamped to 0 below the horizon."""
    cos = dot(to_unit(direction), w)
    return jnp.where(cos <= 0.0, 0.0, cos / PI)
