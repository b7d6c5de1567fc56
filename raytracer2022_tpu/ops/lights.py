"""Light importance sampling: the reference's ``HittablePdf`` over the
lights ``HittableList`` (reference: raytracer/src/basic/pdf.rs:56-77,
hittable/mod.rs:121-132).

The reference loops over lights per ray (mean pdf, uniform pick).  Scenes
range from 1 light (Cornell) to 102 (wwscene's star field), so the loop is
vectorized the TPU way:

  * ``lights_pdf`` — ONE dense ``(L, N)`` evaluation per light kind
    (kind groups are static per scene), then a mean over L.  Per-kind:
    sphere solid-angle pdf (sphere.rs:75-83), rect area pdf
    (aarect.rs:74-83); others contribute the Hittable default 0
    (hittable/mod.rs:63-64).
  * ``sample_lights`` — pick a light uniformly per ray, fetch its params
    with one tiny one-hot contraction over L, then evaluate both samplers
    masked on the picked kind (sphere cone sample sphere.rs:85-90, rect
    uniform point aarect.rs:85-93).

Light prims are assumed untransformed (always true in the reference: lights
are bare rects/spheres) — the builder bakes sphere transforms anyway.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..scene.types import RECT, SPHERE, SceneData
from .intersect import _rect_t, _sphere_t
from .sampling import to_sphere
from .tables import take_cols_multi
from .vecmath import length_sqr, onb_from_w, onb_local, vec3

PI = math.pi


def _light_groups(scene: SceneData):
    """Static per-kind index groups into stats.light_ids."""
    kinds = scene.stats.light_kinds
    sph = tuple(i for i, k in enumerate(kinds) if k == SPHERE)
    rect = tuple(i for i, k in enumerate(kinds) if k == RECT)
    return sph, rect


def _light_params(scene: SceneData, group) -> jnp.ndarray:
    """(16, G) param rows of a static id group (static gather)."""
    ids = [scene.stats.light_ids[i] for i in group]
    return scene.params[:, jnp.asarray(ids, dtype=jnp.int32)]


def lights_pdf(scene: SceneData, p, v, tm):
    """HittableList::pdf_value (hittable/mod.rs:121-128): mean over lights."""
    n_lights = len(scene.stats.light_ids)
    n = p.shape[1]
    total = jnp.zeros((n,))
    sph, rect = _light_groups(scene)

    pb = p[:, None, :]  # (3, 1, N)
    vb = v[:, None, :]

    if sph:
        prm = _light_params(scene, sph)[:, :, None]  # (16, Gs, 1)
        # Sphere::pdf_value (sphere.rs:75-83): requires an actual hit
        t = _sphere_t((prm[0], prm[1], prm[2]), prm[3], pb, vb, 1e-3, jnp.inf)
        dx = prm[0] - pb[0]
        dy = prm[1] - pb[1]
        dz = prm[2] - pb[2]
        dist_sqr = dx * dx + dy * dy + dz * dz
        rel = 1.0 - prm[3] * prm[3] / dist_sqr
        # the reference takes sqrt of a possibly negative value (origin
        # inside the sphere, sphere.rs:77) -> NaN pdf; we keep the NaN primal
        # (the integrator kills those samples) but keep the VJP clean
        cos_max = jnp.where(rel > 0.0, jnp.sqrt(jnp.where(rel > 0.0, rel, 1.0)), jnp.nan)
        solid_angle = 2.0 * PI * (1.0 - cos_max)
        total = total + jnp.sum(
            jnp.where(jnp.isfinite(t), 1.0 / solid_angle, 0.0), axis=0
        )

    if rect:
        prm = _light_params(scene, rect)[:, :, None]  # (16, Gr, 1)
        # XZRect::pdf_value et al. (aarect.rs:74-83): dist^2 / (cos * area)
        t = _rect_t(prm, pb, vb, 1e-3, jnp.inf)  # (Gr, N)
        ok = jnp.isfinite(t)
        t_safe = jnp.where(ok, t, 0.0)  # keep inf out of the VJP
        area = (prm[1, :, 0] - prm[0, :, 0]) * (prm[3, :, 0] - prm[2, :, 0])  # (Gr,)
        vlen_sqr = length_sqr(v)[None]  # (1, N)
        dist_sqr = t_safe * t_safe * vlen_sqr
        ka = prm[5].astype(jnp.int32)  # (Gr, 1)
        vk = jnp.where(ka == 0, vb[0], jnp.where(ka == 1, vb[1], vb[2]))
        cos = jnp.abs(vk) / jnp.sqrt(vlen_sqr)
        # cos == 0 (direction in the light's plane): the reference returns an
        # inf pdf, which zeroes the contribution; we return pdf 0 and the
        # integrator kills the sample — same black result, NaN-free VJP
        denom = cos * area[:, None]
        ok = ok & (denom > 0.0)
        total = total + jnp.sum(
            jnp.where(ok, dist_sqr / jnp.where(denom > 0.0, denom, 1.0), 0.0), axis=0
        )

    return total / float(max(n_lights, 1))


def sample_lights(scene: SceneData, p, key):
    """HittableList::random (hittable/mod.rs:129-132): pick a light
    uniformly, then delegate.  Returns a (3, N) direction."""
    n_lights = len(scene.stats.light_ids)
    n = p.shape[1]
    k_pick, k_sph, k_a, k_b = jax.random.split(key, 4)

    ids = jnp.asarray(scene.stats.light_ids, dtype=jnp.int32)
    kinds = jnp.asarray(scene.stats.light_kinds, dtype=jnp.int32)
    lp_all = scene.params[:, ids]  # (16, L) static gather

    if n_lights == 1:
        prm = lp_all[:, 0][:, None]  # (16, 1)
        kind = jnp.broadcast_to(kinds[0], (n,))
    else:
        pick = jax.random.randint(k_pick, (n,), 0, n_lights)
        prm, kindf = take_cols_multi([lp_all, kinds], pick)
        kind = kindf

    # Sphere::random (sphere.rs:85-90): cone sample toward the center
    center = prm[0:3]
    direction = center - p
    dist_sqr = length_sqr(direction)
    u, v, w = onb_from_w(direction)
    local = to_sphere(k_sph, jnp.broadcast_to(prm[3], (n,)), dist_sqr)
    sphere_dir = onb_local(u, v, w, local)

    # XZRect::random et al. (aarect.rs:85-93, 168-176, 251-259)
    ua = jax.random.uniform(k_a, (n,))
    ub = jax.random.uniform(k_b, (n,))
    a = prm[0] + ua * (prm[1] - prm[0])
    b = prm[2] + ub * (prm[3] - prm[2])
    kv = jnp.broadcast_to(prm[4], (n,))
    ka = prm[5].astype(jnp.int32)
    point = jnp.where(
        ka == 0,
        vec3(kv, a, b),  # YZ: point = (k, a, b)
        jnp.where(ka == 1, vec3(a, kv, b), vec3(a, b, kv)),  # XZ / XY
    )
    rect_dir = point - p

    # Hittable default direction (1,0,0) (hittable/mod.rs:66)
    default = jnp.broadcast_to(jnp.array([[1.0], [0.0], [0.0]]), (3, n))
    return jnp.where(
        (kind == SPHERE)[None],
        sphere_dir,
        jnp.where((kind == RECT)[None], rect_dir, default),
    )
