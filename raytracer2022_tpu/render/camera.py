"""Thin-lens camera as a differentiable pytree + batched ray generation.

Reference: raytracer/src/basic/camera.rs.  ``make_camera`` mirrors
``Camera::new`` (camera.rs:24-62); ``get_rays`` mirrors ``Camera::get_ray``
(camera.rs:64-73) vectorized over a whole wavefront.  The raw look-at
parameters stay differentiable through the basis construction, so camera
gradients flow (BASELINE north star).
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.sampling import uniform_in_unit_disk
from ..ops.vecmath import cross, scale, to_unit


@flax.struct.dataclass
class Camera:
    origin: jnp.ndarray  # f32[3]
    lower_left: jnp.ndarray  # f32[3]
    horizontal: jnp.ndarray  # f32[3]
    vertical: jnp.ndarray  # f32[3]
    u: jnp.ndarray  # f32[3]
    v: jnp.ndarray  # f32[3]
    w: jnp.ndarray  # f32[3]
    lens_radius: jnp.ndarray  # f32[]
    time0: jnp.ndarray  # f32[]
    time1: jnp.ndarray  # f32[]


def make_camera(
    lookfrom,
    lookat,
    vup,
    vfov: float,
    aspect_ratio: float,
    aperture: float = 0.0,
    focus_dist: float = 1.0,
    time0: float = 0.0,
    time1: float = 1.0,
) -> Camera:
    """Camera::new (camera.rs:24-62).  ``vup`` may be non-unit (the final
    scene deliberately passes (1,5,0) for a dutch tilt, main.rs:43)."""
    lookfrom = jnp.asarray(lookfrom, dtype=jnp.float32)
    lookat = jnp.asarray(lookat, dtype=jnp.float32)
    vup = jnp.asarray(vup, dtype=jnp.float32)

    theta = jnp.deg2rad(jnp.asarray(vfov, dtype=jnp.float32))
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = aspect_ratio * viewport_height

    w = to_unit(lookfrom - lookat)
    u = to_unit(cross(vup, w))
    v = cross(w, u)

    origin = lookfrom
    horizontal = u * viewport_width * focus_dist
    vertical = v * viewport_height * focus_dist
    lower_left = origin - horizontal / 2.0 - vertical / 2.0 - w * focus_dist

    return Camera(
        origin=origin,
        lower_left=lower_left,
        horizontal=horizontal,
        vertical=vertical,
        u=u,
        v=v,
        w=w,
        lens_radius=jnp.asarray(aperture / 2.0, dtype=jnp.float32),
        time0=jnp.asarray(time0, dtype=jnp.float32),
        time1=jnp.asarray(time1, dtype=jnp.float32),
    )


def get_rays(cam: Camera, s: jnp.ndarray, t: jnp.ndarray, key):
    """Camera::get_ray (camera.rs:64-73) for a batch of (s, t) in [0,1].

    Returns (origins (3,N), directions (3,N), times (N,)).  Defocus offset
    uses the closed-form unit-disk sampler; shutter time is uniform in
    [time0, time1).
    """
    n = s.shape[0]
    k_disk, k_time = jax.random.split(key)
    rd = scale(uniform_in_unit_disk(k_disk, (n,)), cam.lens_radius)
    offset = cam.u[:, None] * rd[0][None] + cam.v[:, None] * rd[1][None]
    o = cam.origin[:, None] + offset
    d = (
        cam.lower_left[:, None]
        + cam.horizontal[:, None] * s[None]
        + cam.vertical[:, None] * t[None]
        - cam.origin[:, None]
        - offset
    )
    tm = jax.random.uniform(k_time, (n,), minval=cam.time0, maxval=cam.time1)
    return o, d, tm
