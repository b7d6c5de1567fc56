"""Batched ray-primitive intersection (wavefront closest-hit).

Replaces the reference's per-ray virtual ``Hittable::hit`` recursion
(reference: raytracer/src/hittable/) with vectorized phases:

  * ``candidate_t`` — for N rays x P primitives compute candidate hit
    distances entirely elementwise on the broadcasted ``(N, P)`` grid so XLA
    fuses one VPU pass (the TPU-optimal strategy for small scenes);
  * ``traverse_clusters`` — two-level closest hit (dense cluster-AABB pass,
    then front-to-back cluster visits per ray block) in one ``lax.while_loop``;
  * ``hit_details`` — full hit record reconstructed only for the winning
    primitive per ray.

Constant mediums (constantmedium.rs) are stochastic and need their boundary
primitives; they are resolved in a separate small pass per medium and
min-combined.  All math mirrors the reference formulas in semantics; see the
per-kind helpers for file:line citations.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..scene.types import BOX, MEDIUM, MSPHERE, RECT, RING, SPHERE, TRIANGLE, SceneData
from .vecmath import cross, dot, masked_sqrt, safe_div, scale, to_unit, vec3

INF = jnp.inf
PI = math.pi


@flax.struct.dataclass
class Hit:
    """SoA hit record (reference HitRecord, hittable/mod.rs:18-57).

    ``normal`` is the face normal (flipped to oppose the ray by
    ``set_face_normal``, mod.rs:49-56).  ``front`` already includes the
    ``FlipFace`` toggle (mod.rs:267-292).  ``u, v`` are the surface params
    (barycentric beta/gamma for triangles); ``tex_uv`` is the
    ObjTexture-interpolated image uv for triangles that carry one.
    """

    hit: jnp.ndarray  # bool[N]
    t: jnp.ndarray  # f32[N]
    prim: jnp.ndarray  # i32[N]
    p: jnp.ndarray  # f32[3, N]
    normal: jnp.ndarray  # f32[3, N]
    front: jnp.ndarray  # bool[N]
    u: jnp.ndarray  # f32[N]
    v: jnp.ndarray  # f32[N]
    tex_uv: jnp.ndarray  # f32[2, N]
    mat: jnp.ndarray  # i32[N]


# --------------------------------------------------------------------------
# per-kind candidate-t formulas (shapes broadcast: grid or row variants)
# --------------------------------------------------------------------------


def _sphere_t(center, radius, o, d, t_min, t_max):
    """Quadratic two-root selection (sphere.rs:39-66).

    Accepts a root iff ``t_min <= root <= t_max`` (the reference rejects on
    ``root < t_min || t_max < root``).

    Written in component form: stacked (3, P, N) temporaries defeat XLA's
    reduce-fusion in the dense prim-chunk scan and get materialized; plain
    (P, N) component arithmetic fuses into the final min/argmin.
    """
    ocx = o[0] - center[0]
    ocy = o[1] - center[1]
    ocz = o[2] - center[2]
    a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    half_b = ocx * d[0] + ocy * d[1] + ocz * d[2]
    c = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
    disc = half_b * half_b - a * c
    ok = disc >= 0.0
    sq = masked_sqrt(disc, ok)  # grad-safe: no sqrt'(0)=inf on missed lanes
    root1 = safe_div(-half_b - sq, a)
    root2 = safe_div(-half_b + sq, a)
    v1 = ok & (root1 >= t_min) & (root1 <= t_max)
    v2 = ok & (root2 >= t_min) & (root2 <= t_max)
    return jnp.where(v1, root1, jnp.where(v2, root2, INF))


def _msphere_center(p, tm):
    """Lerped center at ray time (sphere.rs:124-127). p: (16, ...) params.

    Returns component tuple (cx, cy, cz) — see _sphere_t's layout note.
    safe_div: non-msphere rows have zero t0/t1 and this branch is masked out.
    """
    frac = safe_div(tm - p[7], p[8] - p[7])
    return (
        p[0] + (p[4] - p[0]) * frac,
        p[1] + (p[5] - p[1]) * frac,
        p[2] + (p[6] - p[2]) * frac,
    )


def _axis_select(v, axis):
    """Pick component ``axis`` (an integer array) out of a (3, ...) vector."""
    return jnp.where(axis == 0, v[0], jnp.where(axis == 1, v[1], v[2]))


def _rect_axes(ka):
    """Map the constant axis to the two in-plane axes.

    XYRect ka=2 -> (x, y); XZRect ka=1 -> (x, z); YZRect ka=0 -> (y, z)
    (aarect.rs:13-260, unified one-kernel form per SURVEY.md §2 row 10).
    """
    a_axis = jnp.where(ka == 0, 1, 0)
    b_axis = jnp.where(ka == 2, 1, 2)
    return a_axis, b_axis


def _rect_t(p, o, d, t_min, t_max):
    """Axis-rect plane solve + bounds (aarect.rs:47-66 et al.)."""
    ka = p[5].astype(jnp.int32)
    a0, a1, b0, b1, k = p[0], p[1], p[2], p[3], p[4]
    a_axis, b_axis = _rect_axes(ka)
    ok_ = _axis_select(o, ka)
    dk = _axis_select(d, ka)
    # grad-safe: dk==0 would give inf t (the reference then rejects via the
    # coordinate bounds); we reject explicitly instead
    t = safe_div(k - ok_, dk)
    av = _axis_select(o, a_axis) + t * _axis_select(d, a_axis)
    bv = _axis_select(o, b_axis) + t * _axis_select(d, b_axis)
    valid = (
        (dk != 0.0)
        & (t >= t_min)
        & (t <= t_max)
        & (av >= a0)
        & (av <= a1)
        & (bv >= b0)
        & (bv <= b1)
    )
    return jnp.where(valid, t, INF)


def _tri_t(p, o, d, t_min, t_max):
    """Plane hit + three cross-product sign tests (triangle.rs:33-63).

    Component form throughout — see _sphere_t's layout note.
    """

    def sub(ax, ay, az, bx, by, bz):
        return ax - bx, ay - by, az - bz

    def crs(ax, ay, az, bx, by, bz):
        return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx

    def dt(ax, ay, az, bx, by, bz):
        return ax * bx + ay * by + az * bz

    ax, ay, az = p[0], p[1], p[2]
    bx, by, bz = p[3], p[4], p[5]
    cx, cy, cz = p[6], p[7], p[8]
    ab = sub(bx, by, bz, ax, ay, az)
    ac = sub(cx, cy, cz, ax, ay, az)
    nx, ny, nz = crs(*ab, *ac)
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv = 1.0 / jnp.where(nlen == 0.0, 1.0, nlen)  # non-tri rows: zeros
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    denom = dt(d[0], d[1], d[2], nx, ny, nz)
    t = safe_div(dt(ax - o[0], ay - o[1], az - o[2], nx, ny, nz), denom)
    px, py, pz = o[0] + d[0] * t, o[1] + d[1] * t, o[2] + d[2] * t

    ca = sub(ax, ay, az, cx, cy, cz)  # a - c = -(c - a)
    e0 = crs(-ca[0], -ca[1], -ca[2], px - ax, py - ay, pz - az)
    r0 = crs(-ca[0], -ca[1], -ca[2], *ab)
    ba = sub(ax, ay, az, bx, by, bz)  # a - b
    e1 = crs(*ba, px - bx, py - by, pz - bz)
    r1 = crs(*ba, cx - bx, cy - by, cz - bz)
    cb = sub(bx, by, bz, cx, cy, cz)  # b - c
    e2 = crs(*cb, px - cx, py - cy, pz - cz)
    r2 = crs(*cb, ax - cx, ay - cy, az - cz)
    inside = (
        (dt(*e0, *r0) >= 0.0) & (dt(*e1, *r1) >= 0.0) & (dt(*e2, *r2) >= 0.0)
    )
    valid = (
        (denom != 0.0)
        & (nlen != 0.0)
        & (t >= t_min)
        & (t <= t_max)
        & inside
    )
    return jnp.where(valid, t, INF)


def _ring_t(p, o, d, t_min, t_max):
    """Flat annulus in plane y=0 (ring.rs:36-52)."""
    t = safe_div(-o[1], d[1])
    px = o[0] + t * d[0]
    pz = o[2] + t * d[2]
    dd = px * px + pz * pz
    valid = (
        (d[1] != 0.0)
        & (t >= t_min)
        & (t <= t_max)
        & (dd >= p[2])
        & (dd <= p[3])
    )
    return jnp.where(valid, t, INF)


def _box_t(p, o, d, t_min, t_max):
    """Axis-aligned box slab test ≡ closest hit over the 6 face rects the
    reference builds per box (boxes.rs:23-66, faces tested via aarect.rs).

    Entry face = slab near plane, exit face = slab far plane; if the entry
    lies before ``t_min`` (ray starts inside) the exit face wins — exactly
    the rect-list behavior.  Winning-face t is the same ``(k - o_a)/d_a``
    the rect kernel computes, so radiance is bit-identical up to FP
    reassociation.  d_a == 0 uses IEEE inf like the cluster slab test
    (aabb.rs:15-32); a ray lying exactly ON a face plane yields NaN -> miss
    (the rect version accepts the boundary; measure-zero discrepancy).
    """
    inv0 = 1.0 / d[0]
    inv1 = 1.0 / d[1]
    inv2 = 1.0 / d[2]
    a0 = (p[0] - o[0]) * inv0
    b0 = (p[3] - o[0]) * inv0
    a1 = (p[1] - o[1]) * inv1
    b1 = (p[4] - o[1]) * inv1
    a2 = (p[2] - o[2]) * inv2
    b2 = (p[5] - o[2]) * inv2
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(a0, b0), jnp.minimum(a1, b1)), jnp.minimum(a2, b2)
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(a0, b0), jnp.maximum(a1, b1)), jnp.maximum(a2, b2)
    )
    t = jnp.where(near >= t_min, near, far)
    valid = (far >= near) & (t >= t_min) & (t <= t_max)
    return jnp.where(valid, t, INF)


def _t_for_kind(k: int, p, o, d, tm, t_min, t_max):
    """Single-kind candidate t (k is a static Python int)."""
    if k == SPHERE:
        return _sphere_t((p[0], p[1], p[2]), p[3], o, d, t_min, t_max)
    if k == MSPHERE:
        return _sphere_t(_msphere_center(p, tm), p[3], o, d, t_min, t_max)
    if k == RECT:
        return _rect_t(p, o, d, t_min, t_max)
    if k == TRIANGLE:
        return _tri_t(p, o, d, t_min, t_max)
    if k == RING:
        return _ring_t(p, o, d, t_min, t_max)
    if k == BOX:
        return _box_t(p, o, d, t_min, t_max)
    # MEDIUM rows yield +inf here; they are resolved by ``_medium_t``
    return jnp.broadcast_to(
        INF, jnp.broadcast_shapes(o.shape[1:], jnp.shape(t_min), jnp.shape(t_max))
    )


def _t_switch(kind, p, o, d, tm, t_min, t_max, kinds=None):
    """Masked evaluation selected by integer ``kind``.

    ``kinds`` (static) lists the kinds that can actually occur — absent
    kinds cost nothing (the scene compiler records scene.stats.kinds_present
    so e.g. a rect-only Cornell box never evaluates sphere/triangle math).
    """
    kinds = [k for k in (kinds or (SPHERE, MSPHERE, RECT, TRIANGLE, RING, BOX)) if k != MEDIUM]
    shape = jnp.broadcast_shapes(jnp.shape(kind), o.shape[1:])
    t = jnp.broadcast_to(INF, shape)
    for k in kinds:
        t = jnp.where(kind == k, _t_for_kind(k, p, o, d, tm, t_min, t_max), t)
    return t


# --------------------------------------------------------------------------
# world -> object transforms
# --------------------------------------------------------------------------


def _apply_rot(rot, v):
    """rot: (3, 3, ...); v: (3, ...) -> R @ v."""
    return vec3(
        rot[0, 0] * v[0] + rot[0, 1] * v[1] + rot[0, 2] * v[2],
        rot[1, 0] * v[0] + rot[1, 1] * v[1] + rot[1, 2] * v[2],
        rot[2, 0] * v[0] + rot[2, 1] * v[1] + rot[2, 2] * v[2],
    )


def _apply_rot_t(rot, v):
    """rot: (3, 3, ...); v: (3, ...) -> R^T @ v."""
    return vec3(
        rot[0, 0] * v[0] + rot[1, 0] * v[1] + rot[2, 0] * v[2],
        rot[0, 1] * v[0] + rot[1, 1] * v[1] + rot[2, 1] * v[2],
        rot[0, 2] * v[0] + rot[1, 2] * v[1] + rot[2, 2] * v[2],
    )


def _xform_rays(rot, trans, inv_s, o, d):
    """World->object similarity: p' = R(p - t)/s, d' = R d / s.

    Preserves the hit parameter t (unlike the reference's Zoom quirk,
    hittable/mod.rs:321-330 — see SURVEY.md §2 row 15).
    """
    o2 = _apply_rot(rot, o - trans) * inv_s[None]
    d2 = _apply_rot(rot, d) * inv_s[None]
    return o2, d2


# --------------------------------------------------------------------------
# phase 1: candidate t
# --------------------------------------------------------------------------


def candidate_t(
    scene: SceneData,
    o: jnp.ndarray,  # (3, N)
    d: jnp.ndarray,  # (3, N)
    tm: jnp.ndarray,  # (N,)
    t_min,
    t_max,  # scalar or (N,)
    prim_slice: Optional[slice] = None,
    include_inactive: bool = False,
) -> jnp.ndarray:
    """Candidate hit t for every (prim, ray) pair -> f32[P_slice, N].

    Layout note: rays are the LAST axis so they map to TPU lanes — a
    (N, P) layout would put the (often tiny) primitive count in the
    128-wide lane dimension and waste most of the VPU.

    When the requested window is covered by the compiler's homogeneous
    ``kind_ranges``, each sub-window runs exactly ONE intersection formula
    (no masked switch): the dominant cost saving for brute-forced scenes.
    """
    lo = prim_slice.start if prim_slice is not None else 0
    hi = prim_slice.stop if prim_slice is not None else scene.n_prims

    t_min = jnp.asarray(t_min)  # scalar or (N,): broadcasts along lanes
    t_max = jnp.asarray(t_max)
    tmb = tm[None, :]  # (1, N)

    # static homogeneous sub-windows covering [lo, hi)
    windows = [
        (k, max(s, lo), min(e, hi))
        for (k, s, e) in scene.stats.kind_ranges
        if max(s, lo) < min(e, hi)
    ]
    if sum(e - s for _, s, e in windows) != hi - lo:
        # window not covered by range metadata (e.g. inside the BVH region):
        # fall back to the masked switch over present kinds
        windows = None

    def eval_window(sl, kinds):
        p = scene.params[:, sl][:, :, None]  # (16, W, 1)
        ob = o[:, None, :]  # (3, 1, N)
        db = d[:, None, :]
        if scene.any_xform:
            ob, db = _xform_rays(
                scene.xf_rot[:, :, sl, None],
                scene.xf_trans[:, sl, None],
                scene.xf_inv_scale[sl, None],
                ob,
                db,
            )
        if len(kinds) == 1:
            t = _t_for_kind(kinds[0], p, ob, db, tmb, t_min, t_max)
            t = jnp.broadcast_to(t, (sl.stop - sl.start, o.shape[1]))
        else:
            t = _t_switch(scene.kind[sl][:, None], p, ob, db, tmb, t_min, t_max, kinds)
        if not include_inactive:
            t = jnp.where(scene.active[sl][:, None], t, INF)
        return t

    if windows is None:
        return eval_window(slice(lo, hi), scene.stats.kinds_present or None)
    parts = [eval_window(slice(s, e), (k,)) for k, s, e in windows]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _medium_t(
    scene: SceneData,
    med_prim: int,
    b_start: int,
    b_count: int,
    o,
    d,
    tm,
    t_min,
    key,
) -> jnp.ndarray:
    """Stochastic constant-medium hit t per ray (constantmedium.rs:50-76).

    Entry = closest boundary hit in (-inf, inf); exit = closest boundary hit
    in (entry + 1e-4, inf); exponential free flight against density.  Uses
    unclamped t_max (equivalent to the reference's clamp-to-closest: a
    sampled point beyond the closest other hit simply loses the argmin).
    """
    bsl = slice(b_start, b_start + b_count)
    t_entry = jnp.min(
        candidate_t(scene, o, d, tm, -INF, INF, prim_slice=bsl, include_inactive=True),
        axis=0,
    )
    t_exit = jnp.min(
        candidate_t(
            scene, o, d, tm, t_entry + 1e-4, INF, prim_slice=bsl, include_inactive=True
        ),
        axis=0,
    )
    has_both = jnp.isfinite(t_entry) & jnp.isfinite(t_exit)

    neg_inv_density = scene.params[0, med_prim]
    # grad-safe: replace inf entries/exits on missing-boundary lanes before
    # any arithmetic (inf - inf = NaN would poison the VJP)
    rec1 = jnp.maximum(jnp.where(has_both, t_entry, 0.0), t_min)
    rec2 = jnp.where(has_both, t_exit, 0.0)
    ok_span = rec1 < rec2
    rec1 = jnp.maximum(rec1, 0.0)
    ray_len = jnp.sqrt(dot(d, d))
    dist_inside = (rec2 - rec1) * ray_len
    u = jax.random.uniform(jax.random.fold_in(key, med_prim), rec1.shape)
    # ln(U); U == 0 gives -inf -> hit_distance = +inf -> miss, matching the
    # reference's rnd.log(E) on (0,1).
    hit_distance = neg_inv_density * jnp.log(u)
    ok = has_both & ok_span & (hit_distance <= dist_inside)
    t = rec1 + hit_distance / ray_len
    return jnp.where(ok, t, INF)


# --------------------------------------------------------------------------
# cluster traversal (two-level: dense AABB pass + ordered cluster visits)
# --------------------------------------------------------------------------

# per-kind param-row count needed by the closest-hit t formulas (full rows —
# e.g. triangle uvs — are only fetched in hit_details for the winner)
NPARAM_T = {SPHERE: 4, MSPHERE: 9, RECT: 6, TRIANGLE: 9, RING: 4, BOX: 6}


def traverse_clusters(
    scene: SceneData,
    tree_idx: int,
    o,
    d,
    tm,
    t_min,
    t_max,
    block: int = 64,
    return_steps: bool = False,
):
    """Closest hit over one cluster tree -> (t_best f32[N], best i32[N]).

    TPU-native two-level traversal (replaces the reference's recursive BVH
    descent, bvh/mod.rs:86-101):

      1. ONE dense slab pass tests every ray against all C cluster AABBs
         (fused VPU elementwise + reduction);
      2. rays are grouped into blocks of ``block`` lanes; each block visits
         clusters in front-to-back order of the block-min entry distance,
         stopping as soon as the next cluster starts beyond every lane's
         current closest hit.  Each visit is one one-hot MXU fetch of the
         cluster's packed prim columns plus a dense (M, block) single-kind
         primitive test — no per-lane gathers anywhere.

    Worst case (every block visits every cluster) equals the dense
    brute-force scan; coherent blocks exit after a handful of visits.  The
    earlier lockstep *packet* walk of a deep skip-link BVH shared one node
    pointer per block and degenerated to ~1000 sequential 8-prim steps on
    incoherent bounce rays; front-to-back cluster visits bound the step
    count by C and do M prims of dense work per step.
    """
    ct = scene.clusters[tree_idx]
    kind, n_clusters, m, npar, has_xf = scene.stats.trees[tree_idx]
    n = o.shape[1]

    from .tables import onehot_dot

    # pad rays to a block multiple with rays that hit nothing
    n_pad = (-n) % block
    if n_pad:
        far = jnp.full((3, n_pad), 1e30)
        o = jnp.concatenate([o, far], axis=1)
        d = jnp.concatenate([d, jnp.ones((3, n_pad))], axis=1)
        tm = jnp.concatenate([tm, jnp.zeros(n_pad)])
    nb = (n + n_pad) // block

    ob = o.reshape(3, nb, block)
    db = d.reshape(3, nb, block)
    tmb = tm.reshape(nb, block)
    inv_d = 1.0 / db  # IEEE inf on zero components like the reference

    if jnp.ndim(t_max) == 0:
        t_cap = jnp.full((nb, block), t_max)
    else:
        t_cap = jnp.concatenate([t_max, jnp.zeros(n_pad)]).reshape(nb, block)

    # --- phase 1: block-min entry distance per cluster (slab, aabb.rs:15-32)
    # component form so XLA fuses the (C, nb, block) grid into the reduction
    def axis_minmax(a):
        t0 = (ct.bmin[a][:, None, None] - ob[a][None]) * inv_d[a][None]
        t1 = (ct.bmax[a][:, None, None] - ob[a][None]) * inv_d[a][None]
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    n0, f0 = axis_minmax(0)
    n1, f1 = axis_minmax(1)
    n2, f2 = axis_minmax(2)
    near = jnp.maximum(jnp.maximum(jnp.maximum(n0, n1), n2), t_min)
    far_ = jnp.minimum(jnp.minimum(jnp.minimum(f0, f1), f2), t_cap[None])
    entry = jnp.where(far_ >= near, near, INF)  # (C, nb, block)
    e_blk = jnp.min(entry, axis=2).T  # (nb, C)

    # front-to-back visit order per block + sorted entry values
    order = jnp.argsort(e_blk, axis=1).astype(jnp.int32)  # (nb, C)
    es = jnp.take_along_axis(e_blk, order, axis=1)  # (nb, C)
    es = jnp.concatenate([es, jnp.full((nb, 1), INF)], axis=1)  # sentinel

    t_best0 = jnp.full((nb, block), INF)
    best0 = jnp.zeros((nb, block), dtype=jnp.int32)
    done0 = ~jnp.isfinite(es[:, 0])  # blocks whose rays miss every cluster

    def cond(state):
        _, done, _, _ = state
        return jnp.any(~done)

    def body(state):
        i, done, t_best, best = state
        c = jax.lax.dynamic_slice_in_dim(order, i, 1, axis=1)[:, 0]  # [nb]

        # one one-hot MXU dot fetches the visited cluster's packed columns
        oh = (c[None, :] == jnp.arange(n_clusters, dtype=jnp.int32)[:, None]).astype(
            jnp.bfloat16
        )  # (C, nb)
        fetch = onehot_dot(ct.pack, oh, passes=3)  # (R, nb)

        start = fetch[0]  # [nb] window start prim id (exact)
        count = fetch[1]
        p = fetch[2 : 2 + npar * m].reshape(npar, m, nb)[:, :, :, None]
        oo, dd = ob[:, None], db[:, None]  # (3, 1, nb, block)
        if has_xf:
            base = 2 + npar * m
            rot = fetch[base : base + 9 * m].reshape(3, 3, m, nb)[:, :, :, :, None]
            trans = fetch[base + 9 * m : base + 12 * m].reshape(3, m, nb)[:, :, :, None]
            inv_s = fetch[base + 12 * m : base + 13 * m][:, :, None]  # (m, nb, 1)
            oo, dd = _xform_rays(rot, trans, inv_s, oo, dd)

        cur_max = jnp.minimum(t_best, t_cap)
        # homogeneous tree: one static formula, no masked switch
        t_j = _t_for_kind(kind, p, oo, dd, tmb[None], t_min, cur_max[None])
        t_j = jnp.broadcast_to(t_j, (m, nb, block))
        tw = jnp.min(t_j, axis=0)  # (nb, block)
        am = jnp.argmin(t_j, axis=0).astype(jnp.int32)
        # slot j holds prim start + min(j, count-1) (padding = last prim)
        bw = start.astype(jnp.int32)[:, None] + jnp.minimum(
            am, count.astype(jnp.int32)[:, None] - 1
        )
        upd = ~done[:, None] & (tw < t_best)
        t_best = jnp.where(upd, tw, t_best)
        best = jnp.where(upd, bw, best)

        # stop when the next cluster starts beyond every lane's closest hit
        e_next = jax.lax.dynamic_slice_in_dim(es, i + 1, 1, axis=1)[:, 0]
        blk_cap = jnp.max(jnp.minimum(t_best, t_cap), axis=1)
        done = done | (e_next >= blk_cap)
        return i + 1, done, t_best, best

    steps, _, t_best, best = jax.lax.while_loop(
        cond, body, (jnp.int32(0), done0, t_best0, best0)
    )
    if return_steps:
        return t_best.reshape(-1)[:n], best.reshape(-1)[:n], steps
    return t_best.reshape(-1)[:n], best.reshape(-1)[:n]


# --------------------------------------------------------------------------
# phase 2: hit details
# --------------------------------------------------------------------------


def _sphere_uv(n):
    """Spherical uv from the outward unit normal (sphere.rs:30-34).

    The clip stays strictly inside (-1, 1): arccos' diverges at the poles
    and would poison gradients (float-identical result elsewhere).
    """
    theta = jnp.arccos(jnp.clip(-n[1], -1.0 + 1e-7, 1.0 - 1e-7))
    phi = jnp.arctan2(-n[2], n[0]) + PI
    return phi / (2.0 * PI), theta / PI


def hit_details(
    scene: SceneData,
    o,
    d,
    tm,
    t_best,
    best,
    hit_mask,
    win_rows: Optional[jnp.ndarray] = None,
):
    """Reconstruct the full hit record for the winning primitive.

    Gathers the winning prim's row per ray and evaluates the per-kind
    normal/uv formulas masked on kind, all at O(N) (not O(N*P)).  Geometry
    rows are fetched in ONE one-hot contraction (ops/tables.py — per-ray
    gathers from small tables are the TPU anti-pattern); shading inputs are
    then fetched by MATERIAL id from the small mat-keyed table
    (ops/shade.py), so the fetch stays on the one-hot path regardless of
    primitive count.

    ``win_rows`` (f32[bvh8.NCOL, N], from the Pallas packet kernels) short-
    circuits the geometry fetch entirely for winners inside the BVH region:
    the kernel already extracted the winner's full leaf row, so only the
    (small) dense-tail window is fetched per ray.  Returns ``(Hit, Shade)``.
    """
    from .bvh8 import COL_FLIP, COL_KIND, COL_MAT
    from .shade import shade_from_rows, shade_table_mats
    from .tables import take_cols, take_cols_multi

    if win_rows is None:
        # per-prim shade rows ride the ONE geometry contraction (the
        # mat-keyed table expanded by prim id is O(P), built once per
        # bounce); splitting shade into its own dot cost cornell ~7%
        srows_p = shade_table_mats(scene)[:, scene.mat_id]
        if scene.any_xform:
            p, kind, mat, flip, srows, rot_f, trans, inv_s = take_cols_multi(
                [
                    scene.params,
                    scene.kind,
                    scene.mat_id,
                    scene.flip,
                    srows_p,
                    scene.xf_rot.reshape(9, -1),
                    scene.xf_trans,
                    scene.xf_inv_scale,
                ],
                best,
            )
            rot = rot_f.reshape(3, 3, -1)
        else:
            p, kind, mat, flip, srows = take_cols_multi(
                [scene.params, scene.kind, scene.mat_id, scene.flip, srows_p], best
            )
    else:
        # BVH-region winners: the traversal kernel's extracted leaf row.
        # Dense-tail winners (loose prims, mediums): window-local fetch.
        tail_lo = scene.stats.n_in_bvh
        is_tree = best < tail_lo
        kind_tree = jnp.round(win_rows[COL_KIND]).astype(jnp.int32)
        mat_tree = jnp.round(win_rows[COL_MAT]).astype(jnp.int32)
        flip_tree = win_rows[COL_FLIP] > 0.5
        if tail_lo < scene.n_prims:
            idx_t = jnp.maximum(best, tail_lo) - tail_lo
            tables = [
                scene.params[:, tail_lo:],
                scene.kind[tail_lo:],
                scene.mat_id[tail_lo:],
                scene.flip[tail_lo:],
            ]
            if scene.any_xform:
                tables += [
                    scene.xf_rot.reshape(9, -1)[:, tail_lo:],
                    scene.xf_trans[:, tail_lo:],
                    scene.xf_inv_scale[tail_lo:],
                ]
            fetched = take_cols_multi(tables, idx_t)
            tp, tkind, tmat, tflip = fetched[:4]
            p = jnp.where(is_tree[None], win_rows[: scene.params.shape[0]], tp)
            kind = jnp.where(is_tree, kind_tree, tkind)
            mat = jnp.where(is_tree, mat_tree, tmat)
            flip = jnp.where(is_tree, flip_tree, tflip)
            if scene.any_xform:
                # bvh8 trees hold identity-transform prims only
                rot_f, trans, inv_s = fetched[4:]
                eye = jnp.eye(3, dtype=jnp.float32).reshape(9, 1)
                rot = jnp.where(is_tree[None], eye, rot_f).reshape(3, 3, -1)
                trans = jnp.where(is_tree[None], 0.0, trans)
                inv_s = jnp.where(is_tree, 1.0, inv_s)
        else:
            p = win_rows[: scene.params.shape[0]]
            kind, mat, flip = kind_tree, mat_tree, flip_tree
            if scene.any_xform:
                n = best.shape[0]
                rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[:, :, None], (3, 3, n))
                trans = jnp.zeros((3, n))
                inv_s = jnp.ones((n,))

    if scene.any_xform:
        oo, od = _xform_rays(rot, trans, inv_s, o, d)
    else:
        oo, od = o, d
    if win_rows is not None:
        # winner-rows path: shading inputs by MATERIAL id — a one-hot over
        # the small material table regardless of primitive count
        srows = take_cols(shade_table_mats(scene), mat)
    shade = shade_from_rows(srows, scene.stats.features)

    pt = oo + scale(od, t_best)  # object-space hit point

    kinds = scene.stats.kinds_present or (SPHERE, MSPHERE, RECT, TRIANGLE, RING, MEDIUM, BOX)
    zeros = jnp.zeros_like(t_best)
    ones = jnp.ones_like(t_best)
    k = kind[None]

    # defaults; each present kind overrides its own rows below
    outward = vec3(ones, zeros, zeros)
    u = zeros
    v = zeros
    tex_u = zeros
    tex_v = zeros

    if SPHERE in kinds or MSPHERE in kinds:
        # sphere / moving sphere (sphere.rs:58-66, 138-165)
        c_static = vec3(p[0], p[1], p[2])
        if MSPHERE in kinds:
            center = jnp.where(k == MSPHERE, vec3(*_msphere_center(p, tm)), c_static)
        else:
            center = c_static
        n_sphere = (pt - center) / jnp.where(p[3] == 0.0, 1.0, p[3])[None]
        u_sph, v_sph = _sphere_uv(n_sphere)
        is_sph = kind <= MSPHERE
        outward = jnp.where(is_sph[None], n_sphere, outward)
        u = jnp.where(is_sph, u_sph, u)
        v = jnp.where(is_sph, v_sph, v)

    if RECT in kinds:
        # rect (aarect.rs:58-66 et al.)
        ka = p[5].astype(jnp.int32)
        a_axis, b_axis = _rect_axes(ka)
        av = _axis_select(pt, a_axis)
        bv = _axis_select(pt, b_axis)
        n_rect = vec3(
            jnp.where(ka == 0, ones, zeros),
            jnp.where(ka == 1, ones, zeros),
            jnp.where(ka == 2, ones, zeros),
        )
        is_rect = kind == RECT
        outward = jnp.where(is_rect[None], n_rect, outward)
        u = jnp.where(is_rect, safe_div(av - p[0], p[1] - p[0]), u)
        v = jnp.where(is_rect, safe_div(bv - p[2], p[3] - p[2]), v)

    if TRIANGLE in kinds:
        # triangle (triangle.rs:51-72): flat normal + (beta, gamma) 2x2 solve
        ta = vec3(p[0], p[1], p[2])
        tb = vec3(p[3], p[4], p[5])
        tc = vec3(p[6], p[7], p[8])
        tcr = cross(tb - ta, tc - ta)
        tlen = jnp.sqrt(dot(tcr, tcr))
        n_tri = tcr / jnp.where(tlen == 0.0, 1.0, tlen)[None]
        a1 = ta[0] - tb[0]
        b1 = ta[0] - tc[0]
        c1 = ta[0] - pt[0]
        a2 = ta[1] - tb[1]
        b2 = ta[1] - tc[1]
        c2 = ta[1] - pt[1]
        det = a1 * b2 - b1 * a2
        beta = safe_div(c1 * b2 - b1 * c2, det)
        gamma = safe_div(a1 * c2 - a2 * c1, det)
        # ObjTexture uv interpolation (texture/mod.rs:167-188)
        alpha = 1.0 - beta - gamma
        is_tri = kind == TRIANGLE
        outward = jnp.where(is_tri[None], n_tri, outward)
        u = jnp.where(is_tri, beta, u)
        v = jnp.where(is_tri, gamma, v)
        tex_u = jnp.where(is_tri, p[9] * alpha + p[11] * beta + p[13] * gamma, tex_u)
        tex_v = jnp.where(is_tri, p[10] * alpha + p[12] * beta + p[14] * gamma, tex_v)

    if RING in kinds:
        # ring (ring.rs:48-51): +y normal, uv left at 0
        outward = jnp.where((kind == RING)[None], vec3(zeros, ones, zeros), outward)

    if BOX in kinds:
        # box (boxes.rs via aarect.rs): identify the winning face by
        # recomputing the 6 face-plane t's with the same arithmetic as
        # _box_t — the winner matches t_best exactly, so the argmin of
        # |t_face - t| picks its axis.  Outward normal and uv are then the
        # winning face rect's (normal +e_axis before set_face_normal;
        # uv from the two in-plane axes' extents).
        # grad-safe: an axis-parallel ray (od[a] == 0) cannot hit the
        # a-faces — excluded by construction rather than via 1/0 = inf,
        # whose NaN primals would poison reverse-mode through abs' VJP
        # (sign(NaN) * 0-cotangent = NaN) even though only the discrete
        # argmin consumes these values
        errs = []
        for a in range(3):
            t_lo = safe_div(p[a] - oo[a], od[a])
            t_hi = safe_div(p[3 + a] - oo[a], od[a])
            err_a = jnp.minimum(jnp.abs(t_best - t_lo), jnp.abs(t_best - t_hi))
            errs.append(jnp.where(od[a] == 0.0, INF, err_a))
        err3 = jnp.stack(errs)  # (3, N)
        ka_box = jnp.argmin(err3, axis=0).astype(jnp.int32)
        a_axis, b_axis = _rect_axes(ka_box)
        lo3 = vec3(p[0], p[1], p[2])
        hi3 = vec3(p[3], p[4], p[5])
        av = _axis_select(pt, a_axis)
        bv = _axis_select(pt, b_axis)
        a0 = _axis_select(lo3, a_axis)
        a1 = _axis_select(hi3, a_axis)
        b0 = _axis_select(lo3, b_axis)
        b1 = _axis_select(hi3, b_axis)
        n_box = vec3(
            jnp.where(ka_box == 0, ones, zeros),
            jnp.where(ka_box == 1, ones, zeros),
            jnp.where(ka_box == 2, ones, zeros),
        )
        is_box = kind == BOX
        outward = jnp.where(is_box[None], n_box, outward)
        u = jnp.where(is_box, safe_div(av - a0, a1 - a0), u)
        v = jnp.where(is_box, safe_div(bv - b0, b1 - b0), v)

    # medium (constantmedium.rs:69-76) keeps the (1,0,0) default normal

    # set_face_normal in the object frame (hittable/mod.rs:49-56); for a
    # similarity transform the sign agrees with the world frame.  Mediums set
    # front_face = true unconditionally (constantmedium.rs:69-76).
    is_medium = kind == MEDIUM
    front = (dot(od, outward) < 0.0) | is_medium
    face_normal = jnp.where(front[None], outward, -outward)

    # back to world space: n_w = R^T n_obj, p_w = R^T (p_obj * s) + trans
    if scene.any_xform:
        s = 1.0 / inv_s  # fetched above (never a per-lane gather)
        p_world = _apply_rot_t(rot, pt * s[None]) + trans
        n_world = _apply_rot_t(rot, face_normal)
    else:
        p_world = pt
        n_world = face_normal

    # FlipFace toggles front_face only (hittable/mod.rs:279-284)
    front = front ^ flip

    return (
        Hit(
            hit=hit_mask,
            t=t_best,
            prim=best,
            p=p_world,
            normal=n_world,
            front=front,
            u=u,
            v=v,
            tex_uv=jnp.stack([tex_u, tex_v], axis=0),
            mat=mat,
        ),
        shade,
    )


# --------------------------------------------------------------------------
# unified closest hit
# --------------------------------------------------------------------------


def _dense_window_scan(scene, k, s, e, chunk, o, d, tm, t_min, t_max, t_best, best):
    """Scan a large homogeneous window in fixed prim chunks.

    Each scan step dynamic-slices ``chunk`` primitive rows, evaluates the
    single kind-``k`` formula densely against all rays, and folds the chunk
    min into the running (t_best, best).  Peak memory is O(N * chunk).
    """
    n_chunks = (e - s + chunk - 1) // chunk
    # clamp starts so every slice stays in bounds (dynamic_slice clamps the
    # start itself, which would silently shift the window): overlapping rows
    # are re-tested, which is harmless for a running min
    starts = jnp.minimum(
        s + jnp.arange(n_chunks, dtype=jnp.int32) * chunk, scene.n_prims - chunk
    )
    col = jnp.arange(chunk, dtype=jnp.int32)

    # rays on the LAST (lane) axis throughout — see candidate_t
    t_min_b = jnp.asarray(t_min)
    t_max_b = jnp.asarray(t_max)
    ob = o[:, None, :]  # (3, 1, N)
    db = d[:, None, :]
    tmb = tm[None, :]

    def body(carry, cs):
        t_best, best = carry
        p = jax.lax.dynamic_slice_in_dim(scene.params, cs, chunk, axis=1)[:, :, None]
        oo, dd = ob, db
        if scene.any_xform:
            oo, dd = _xform_rays(
                jax.lax.dynamic_slice_in_dim(scene.xf_rot, cs, chunk, axis=2)[:, :, :, None],
                jax.lax.dynamic_slice_in_dim(scene.xf_trans, cs, chunk, axis=1)[:, :, None],
                jax.lax.dynamic_slice_in_dim(scene.xf_inv_scale, cs, chunk, axis=0)[:, None],
                ob,
                db,
            )
        t_w = _t_for_kind(k, p, oo, dd, tmb, t_min_b, t_max_b)  # (chunk, N)
        rows = cs + col
        in_window = ((rows >= s) & (rows < e))[:, None]
        act = jax.lax.dynamic_slice_in_dim(scene.active, cs, chunk, axis=0)[:, None]
        t_w = jnp.where(in_window & act, t_w, INF)
        tw = jnp.min(t_w, axis=0)
        bw = jnp.argmin(t_w, axis=0).astype(jnp.int32) + cs
        take = tw < t_best
        return (jnp.where(take, tw, t_best), jnp.where(take, bw, best)), None

    (t_best, best), _ = jax.lax.scan(body, (t_best, best), starts)
    return t_best, best


def closest_hit(
    scene: SceneData,
    o,
    d,
    tm,
    t_min,
    t_max,
    key,
    use_pallas: bool = False,
    recompute_t: bool = True,
):
    """Closest hit over the whole scene -> ``(Hit, Shade)``.

    Small scenes: one fused brute-force O(N*P) pass (beats any traversal for
    P up to a few hundred on the VPU).  Large scenes: BVH walk over the
    reordered prefix + brute force over the loose tail (mediums, boundary
    shadows), min-combined.

    ``use_pallas`` routes tree walks through the per-packet 8-ary kernel
    (ops/bvh8.py) — forward-only and TPU-only; the default XLA cluster walk
    is differentiable and runs on any backend.
    """
    n = o.shape[1]
    t_best = jnp.full((n,), INF)
    best = jnp.zeros((n,), dtype=jnp.int32)
    brute_lo = scene.stats.n_in_bvh
    run_pallas = (
        use_pallas
        and jax.default_backend() == "tpu"
        and not isinstance(t_min, jax.core.Tracer)
    )
    # The packet kernels run under stop_gradient (Mosaic has no VJP) and
    # the winner's hit distance is RECOMPUTED differentiably from its leaf
    # row below — the classic split: accelerate the DISCRETE decision
    # (which primitive wins), differentiate the CONTINUOUS quantity.
    # Caveat: geometry-parameter gradients flow only through the XLA
    # cluster-walk path (the kernel's leaf rows are host-baked constants);
    # material/texture/camera gradients — the BASELINE north-star set —
    # are exact here.
    sg = jax.lax.stop_gradient

    # --- dense (brute) region FIRST: the loose tail is cheap (a few
    # hundred prims) but often holds the scene's LARGE occluders (planets,
    # ring plane, ground), so folding it into t_best before the tree walks
    # hands the packet kernel a tight t_init — whole subtrees then fail
    # the slab test's t_best clamp and are never visited (wwscene:
    # bench +7%, the shuttle sits behind planets/rings for most rays).
    # Stream homogeneous windows: each window's [N, W] candidate matrix
    # reduces to a running (t_best, best) without ever materializing the
    # full [N, P] grid; windows larger than CHUNK prims run as a lax.scan
    # over fixed chunks so the transient stays bounded regardless of XLA
    # fusion decisions.
    ranges = [r for r in scene.stats.kind_ranges if r[2] > brute_lo]
    if not ranges and not scene.clusters and scene.n_prims > 0:
        ranges = [(-1, 0, scene.n_prims)]  # legacy: full masked switch
    # bound the dense (N, chunk) transient: ~128M f32 elements regardless of
    # wavefront size, so multi-million-ray launches don't OOM on a 530-prim
    # scene (the transient is ~3x this for the vec temporaries)
    CHUNK = max(32, min(512, (128 << 20) // max(n, 1)))
    for k, s, e in ranges:
        s = max(s, brute_lo)
        if k == MEDIUM:
            continue  # handled stochastically below
        if e - s <= CHUNK:
            t_w = candidate_t(scene, o, d, tm, t_min, t_max, prim_slice=slice(s, e))
            tw = jnp.min(t_w, axis=0)
            bw = jnp.argmin(t_w, axis=0).astype(jnp.int32) + s
            take = tw < t_best
            t_best = jnp.where(take, tw, t_best)
            best = jnp.where(take, bw, best)
        else:
            t_best, best = _dense_window_scan(
                scene, k, s, e, CHUNK, o, d, tm, t_min, t_max, t_best, best
            )

    # winner-row fast path: when EVERY tree runs the packet kernel, the
    # kernels hand hit_details the winning leaf rows and no per-ray fetch
    # over the (possibly huge) BVH-region primitive table is ever needed
    want_rows = (
        run_pallas
        and len(scene.clusters) > 0
        and all(t8 is not None for t8 in scene.bvh8)
        and len(scene.bvh8) == len(scene.clusters)
    )
    win_rows = None
    for i in range(len(scene.clusters)):
        tree8 = scene.bvh8[i] if run_pallas and i < len(scene.bvh8) else None
        if tree8 is not None:
            from .bvh8 import traverse_bvh8

            out = traverse_bvh8(
                tree8,
                scene.stats.trees[i][0],
                sg(o),
                sg(d),
                sg(tm),
                float(t_min),
                t_init=sg(t_best),
                return_rows=want_rows,
            )
            t_i, b_i = out[0], out[1]
            take = (b_i >= 0) & (t_i < t_best) & (t_i <= t_max)
            if want_rows:
                rows_i = out[2]
                win_rows = (
                    rows_i
                    if win_rows is None
                    else jnp.where(take[None], rows_i, win_rows)
                )
        else:
            # the lockstep walk's while_loop is not reverse-differentiable;
            # stop-grad the discrete search here — the winner's t is
            # recomputed differentiably below for the whole BVH region
            t_i, b_i = traverse_clusters(
                scene, i, sg(o), sg(d), sg(tm), t_min, sg(jnp.asarray(t_max))
            )
            take = t_i < t_best
        t_best = jnp.where(take, t_i, t_best)
        best = jnp.where(take, b_i, best)

    if scene.any_medium:
        for med_prim, b_start, b_count in scene.stats.mediums:
            tmed = _medium_t(scene, med_prim, b_start, b_count, o, d, tm, t_min, key)
            take = (tmed <= t_max) & (tmed < t_best)
            t_best = jnp.where(take, tmed, t_best)
            best = jnp.where(take, med_prim, best)

    if scene.clusters and recompute_t:
        # differentiable t-recompute for BVH-region winners: one per-lane
        # evaluation of the winner's own intersection formula — O(N).  The
        # traversals above run under stop_gradient (Mosaic has no VJP and
        # the lockstep walk's while_loop is not reverse-differentiable);
        # this reconnects t to the ray/camera gradients they cut.
        if win_rows is not None:
            # The kernel's leaf rows are host-baked CONSTANTS: using them
            # here would cut gradients w.r.t. the geometry tables (sphere
            # centers/radii sphere.rs:11-19, triangle vertices
            # triangle.rs:22-35).  Re-fetch the winner's param row from
            # scene.params (numerically identical — leaf rows were baked
            # from the same table) so d(t)/d(geometry) flows; the fetched
            # rows are also grafted into win_rows below so hit_details'
            # normals/uvs carry geometry gradients too.  BVH8 trees hold
            # identity-transform prims only, so no xform fetch is needed.
            from .bvh8 import COL_KIND
            from .tables import take_cols

            kind_w = jnp.round(win_rows[COL_KIND]).astype(jnp.int32)
            npar = scene.params.shape[0]
            pid_w = jnp.clip(best, 0, brute_lo - 1)  # only tree winners used
            p_w = take_cols(scene.params[:, :brute_lo], pid_w)
            is_tree_w = best < brute_lo
            win_rows = win_rows.at[:npar].set(
                jnp.where(is_tree_w[None], p_w, win_rows[:npar])
            )
            oo_w, od_w = o, d
        else:
            from .tables import take_cols_multi

            if scene.any_xform:
                p_w, kind_w, rot_f, trans_w, inv_s_w = take_cols_multi(
                    [
                        scene.params,
                        scene.kind,
                        scene.xf_rot.reshape(9, -1),
                        scene.xf_trans,
                        scene.xf_inv_scale,
                    ],
                    best,
                )
                oo_w, od_w = _xform_rays(
                    rot_f.reshape(3, 3, -1), trans_w, inv_s_w, o, d
                )
            else:
                p_w, kind_w = take_cols_multi([scene.params, scene.kind], best)
                oo_w, od_w = o, d
        t_rec = _t_switch(
            kind_w, p_w, oo_w, od_w, tm, t_min, INF, scene.stats.kinds_present
        )
        sel = (best < brute_lo) & jnp.isfinite(t_best) & jnp.isfinite(t_rec)
        t_best = jnp.where(sel, t_rec, t_best)

    hit_mask = jnp.isfinite(t_best)
    safe_t = jnp.where(hit_mask, t_best, 1.0)
    return hit_details(scene, o, d, tm, safe_t, best, hit_mask, win_rows=win_rows)
