"""Light importance sampling: the reference's ``HittablePdf`` over the
lights ``HittableList`` (reference: raytracer/src/basic/pdf.rs:56-77,
hittable/mod.rs:121-132).

Light prims live in the scene's primitive arrays; their ids and kinds are
static Python ints (scene.stats.light_ids/light_kinds), so the loops below
unroll at trace time — the reference scenes have 1-2 lights.  Per-kind:

  * Sphere: solid-angle pdf + cone sample (sphere.rs:75-90);
  * Rect: area pdf + uniform surface point (aarect.rs:74-93 et al.);
  * anything else: the Hittable defaults pdf=0 / dir=(1,0,0)
    (hittable/mod.rs:62-67).

Light prims are assumed untransformed (always true in the reference: lights
are bare rects/spheres) — the builder bakes sphere transforms anyway.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..scene.types import RECT, SPHERE, SceneData
from .intersect import candidate_t_static
from .sampling import to_sphere
from .vecmath import length_sqr, onb_from_w, onb_local, vec3

PI = math.pi


def _light_random(scene: SceneData, idx: int, p, key):
    """Sample a direction from ``p`` toward light #idx -> (3, N)."""
    pid = scene.stats.light_ids[idx]
    kind = scene.stats.light_kinds[idx]
    prm = scene.params[:, pid]  # (16,) traced scalars
    n = p.shape[1]
    if kind == SPHERE:
        # Sphere::random (sphere.rs:85-90)
        center = prm[0:3][:, None]
        direction = center - p
        dist_sqr = length_sqr(direction)
        u, v, w = onb_from_w(direction)
        local = to_sphere(key, jnp.broadcast_to(prm[3], (n,)), dist_sqr)
        return onb_local(u, v, w, local)
    if kind == RECT:
        # XZRect::random et al. (aarect.rs:85-93, 168-176, 251-259)
        ka = scene.stats.light_axes[idx]
        k1, k2 = jax.random.split(key)
        a = jax.random.uniform(k1, (n,), minval=prm[0], maxval=prm[1])
        b = jax.random.uniform(k2, (n,), minval=prm[2], maxval=prm[3])
        kv = jnp.broadcast_to(prm[4], (n,))
        if ka == 0:  # YZ: point = (k, a, b)
            point = vec3(kv, a, b)
        elif ka == 1:  # XZ: point = (a, k, b)
            point = vec3(a, kv, b)
        else:  # XY: point = (a, b, k)
            point = vec3(a, b, kv)
        return point - p
    # Hittable default (hittable/mod.rs:66)
    return jnp.broadcast_to(jnp.array([[1.0], [0.0], [0.0]]), (3, n))


def _light_pdf(scene: SceneData, idx: int, p, v, tm):
    """pdf_value of direction ``v`` from ``p`` for light #idx -> [N]."""
    pid = scene.stats.light_ids[idx]
    kind = scene.stats.light_kinds[idx]
    prm = scene.params[:, pid]
    n = p.shape[1]
    if kind == SPHERE:
        # Sphere::pdf_value (sphere.rs:75-83): requires an actual hit
        t = candidate_t_static(scene, pid, kind, p, v, tm, 1e-3, jnp.inf)
        center = prm[0:3][:, None]
        rel = 1.0 - prm[3] * prm[3] / length_sqr(center - p)
        # the reference takes sqrt of a possibly negative value (origin
        # inside the sphere, sphere.rs:77) -> NaN pdf; we keep the NaN primal
        # (the integrator kills those samples) but keep the VJP clean
        cos_max = jnp.where(rel > 0.0, jnp.sqrt(jnp.where(rel > 0.0, rel, 1.0)), jnp.nan)
        solid_angle = 2.0 * PI * (1.0 - cos_max)
        return jnp.where(jnp.isfinite(t), 1.0 / solid_angle, 0.0)
    if kind == RECT:
        # XZRect::pdf_value et al. (aarect.rs:74-83): dist^2 / (cos * area)
        ka = scene.stats.light_axes[idx]
        t = candidate_t_static(scene, pid, kind, p, v, tm, 1e-3, jnp.inf)
        ok = jnp.isfinite(t)
        t_safe = jnp.where(ok, t, 0.0)  # keep inf out of the VJP
        area = (prm[1] - prm[0]) * (prm[3] - prm[2])
        vlen_sqr = length_sqr(v)
        dist_sqr = t_safe * t_safe * vlen_sqr
        cos = jnp.abs(v[ka]) / jnp.sqrt(vlen_sqr)
        # cos == 0 (direction in the light's plane): the reference returns an
        # inf pdf, which zeroes the contribution; we return pdf 0 and the
        # integrator kills the sample — same black result, NaN-free VJP
        denom = cos * area
        ok = ok & (denom > 0.0)
        return jnp.where(ok, dist_sqr / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    # Hittable default (hittable/mod.rs:63-64)
    return jnp.zeros((n,))


def sample_lights(scene: SceneData, p, key):
    """HittableList::random (hittable/mod.rs:129-132): pick a light
    uniformly, then delegate.  Returns a (3, N) direction."""
    n_lights = len(scene.stats.light_ids)
    n = p.shape[1]
    k_pick, k_gen = jax.random.split(key)
    dirs = [
        _light_random(scene, i, p, jax.random.fold_in(k_gen, i))
        for i in range(n_lights)
    ]
    if len(dirs) == 1:
        return dirs[0]
    pick = jax.random.randint(k_pick, (n,), 0, n_lights)
    out = dirs[0]
    for i in range(1, len(dirs)):
        out = jnp.where((pick == i)[None], dirs[i], out)
    return out


def lights_pdf(scene: SceneData, p, v, tm):
    """HittableList::pdf_value (hittable/mod.rs:121-128): mean over lights."""
    n_lights = len(scene.stats.light_ids)
    total = jnp.zeros((p.shape[1],))
    for i in range(n_lights):
        total = total + _light_pdf(scene, i, p, v, tm)
    return total / float(n_lights)
