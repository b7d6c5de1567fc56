"""8-ary BVH with per-packet Pallas traversal (the forward fast path).

The reference descends a binary ``Arc<dyn Hittable>`` BVH per ray
(reference: raytracer/src/hittable/bvh/mod.rs:86-101).  The TPU-native
replacement runs 128-ray packets: one 8-wide AABB slab test per visited
group lands on a full (8, 128) vreg, leaves hold 8 primitives tested as one
(8, 128) masked formula, and each packet walks its OWN stack (SMEM) — so a
packet whose rays miss the tree root costs two loop steps, unlike a
lockstep whole-wavefront walk where one straggler block keeps every lane
burning (measured: the XLA cluster walk spends 12.4 of a 16 ms wwscene
bounce; this kernel replaces exactly that).

Forward-only: ``best`` is discrete and ``t`` is consumed through
``hit_details``'s winner reconstruction.  The differentiable scan
integrator keeps the XLA cluster traversal (ops/intersect.py), which
autodiffs; the regen renderer (forward) uses this kernel.

Host build: recursive 8-way largest-axis median split (3 binary levels per
group), leaves of <= 8 primitives — same splitting policy as the cluster
builder, finer granularity.  All primitive params are COPIED into leaf rows
(16 f32 columns, global prim id in the last), so the tree is independent of
cluster windows and only valid for identity-transform primitives (the scene
compiler bakes sphere/msphere/triangle transforms; rect/ring trees are only
built when untransformed, scene/builder.py).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..scene.types import MSPHERE, RECT, RING, SPHERE, TRIANGLE

LEAF = 16  # prims per leaf: 16 beat 8 by ~4% on wwscene (fewer serial visits)
FANOUT = 8
MAX_STACK = 160
SENT = 0x7FFFFFFF  # empty-child tag, never pushed
# Leaf-row columns: 0-15 the primitive's full global param row (so the
# winner row carries everything hit_details needs, incl. triangle uvs),
# then COL_PID / COL_MAT / COL_FLIP / COL_KIND; padded to 24 for tiling.
NCOL = 24
COL_PID = 16
COL_MAT = 17
COL_FLIP = 18
COL_KIND = 19
PACKET = 128
PACKETS_PER_PROGRAM = 8
FAR = 1e30


@flax.struct.dataclass
class Bvh8Tree:
    """Device arrays of one 8-ary tree (kind is static metadata in
    SceneStats.bvh8_kinds, aligned by index)."""

    entries: jnp.ndarray  # i32[Ng*8] tagged: >=0 group id, <0 leaf -(ptr+1), SENT empty
    boxes: jnp.ndarray  # f32[Ng*8, 8] cols 0-2 bmin, 3-5 bmax
    prows: jnp.ndarray  # f32[Lb*8, NCOL] leaf prim rows
    # near-first child visit order per (group, ray-sign octant): 8 slot
    # ids packed 3 bits each, nearest at the LOW bits (ordered by slot
    # centroid . octant direction).  The kernel pushes far-to-near so the
    # nearest child pops first and tightens t_best early.
    axorder: jnp.ndarray  # i32[Ng*8] (group-major, octant minor)


# --------------------------------------------------------------------------
# host build
# --------------------------------------------------------------------------


def _leaf_rows(
    kind: int,
    params: np.ndarray,
    mat_id: np.ndarray,
    flip: np.ndarray,
    pids: np.ndarray,
    prim_rows: np.ndarray,
):
    """Pack leaf rows -> f32[Lb*LEAF, NCOL].

    ``params`` is the global (NPARAM, P) table, ``pids`` the global prim ids
    of the tree's prims (tree-local index -> global id), ``prim_rows`` the
    (Lb, LEAF) tree-local prim index blocks (-1 padded).  Cols 0-15 carry
    the primitive's full global param row verbatim (the winner-row output
    hands them straight to hit_details, incl. triangle uvs); padded slots
    get per-kind guaranteed-miss values on the columns the leaf test reads.
    """
    lb = prim_rows.shape[0]
    rows = np.zeros((lb * LEAF, NCOL), np.float32)
    flat = prim_rows.reshape(-1)
    valid = flat >= 0
    safe = np.where(valid, flat, 0)
    gids = pids[safe]  # global prim ids per slot
    p = params[:, gids].T  # (rows, NPARAM)
    rows[:, : p.shape[1]] = p

    if kind in (SPHERE, MSPHERE):
        rows[~valid, 0:3] = FAR  # padded slots never hit
        rows[~valid, 3] = 0.0
    elif kind == RECT:
        rows[~valid, 0] = FAR  # a0 > a1: bounds test always fails
        rows[~valid, 1] = -FAR
    elif kind == TRIANGLE:
        rows[~valid, 0:9] = 0.0  # degenerate: nlen == 0 rejects
    elif kind == RING:
        rows[~valid, 2] = FAR  # dmin2 > dmax2: band test always fails
        rows[~valid, 3] = -FAR
    else:
        raise ValueError(f"bvh8 cannot hold kind {kind}")
    # winner prim ids ride an f32 column through the kernel: exact only
    # below 2^24 (ADVICE r3) — far above any library scene, but guard it
    if valid.any() and int(gids[valid].max()) >= 1 << 24:
        raise ValueError("bvh8: prim ids >= 2^24 would lose precision in f32")
    rows[:, COL_PID] = np.where(valid, gids, 0)
    rows[:, COL_MAT] = np.where(valid, mat_id[gids], 0)
    rows[:, COL_FLIP] = np.where(valid, flip[gids].astype(np.float32), 0.0)
    rows[:, COL_KIND] = float(kind)
    return rows


def build_bvh8(
    kind: int,
    params: np.ndarray,  # (NPARAM, P) global param table (post-perm)
    mat_id: np.ndarray,  # (P,) global material ids (post-perm)
    flip: np.ndarray,  # (P,) global FlipFace bits (post-perm)
    pids: np.ndarray,  # global prim ids in this tree
    bmin: np.ndarray,  # (T, 3) per-prim bounds (tree-local order = pids order)
    bmax: np.ndarray,
) -> Bvh8Tree:
    """8-ary SAH build -> :class:`Bvh8Tree` device arrays.

    r5: the 8-ary topology comes from COLLAPSING the host binned-SAH binary
    tree (scene/bvh.py -> native/rt_native.cpp; NumPy largest-axis median
    when the native builder is absent) instead of the previous direct 8-way
    median split: each group's 8 slots are formed by repeatedly expanding
    the largest-surface-area internal slot, the standard binary->wide
    collapse.  SAH cuts visited leaves substantially on irregular meshes
    (wwscene's 13k-triangle shuttle: bench +7%); traversal semantics and
    the kernel are unchanged.
    """
    from ..scene.bvh import build_bvh

    n = len(pids)
    nodes, order = build_bvh(bmin, bmax, leaf_size=LEAF)
    nb_min = nodes["bmin"].T  # (Nn, 3)
    nb_max = nodes["bmax"].T
    lcount = nodes["leaf_count"]
    lstart = nodes["leaf_start"]
    skip = nodes["skip"]
    order = np.asarray(order, dtype=np.int64)

    def area(i: int) -> float:
        e = np.maximum(nb_max[i] - nb_min[i], 0.0)
        return float(e[0] * e[1] + e[1] * e[2] + e[2] * e[0])

    def collect8(i: int) -> list[int]:
        """Collapse: expand the largest-area internal slot until 8 slots."""
        slots = [i] if lcount[i] > 0 else [i + 1, int(skip[i + 1])]
        while len(slots) < FANOUT:
            cand = [s for s in slots if lcount[s] == 0]
            if not cand:
                break
            s = max(cand, key=area)
            slots[slots.index(s)] = s + 1  # preorder: left child
            slots.append(int(skip[s + 1]))  # right child
        return slots

    groups_box: list[np.ndarray] = []
    child_entry: list[np.ndarray] = []
    prim_rows: list[np.ndarray] = []
    ax_order: list[np.ndarray] = []
    max_depth = 0

    _octs = np.array(
        [[1 if o & (1 << a) else -1 for a in range(3)] for o in range(8)],
        np.float64,
    )  # octant o: sign of direction component a = bit a

    def rec(i: int, depth: int) -> int:
        nonlocal max_depth
        max_depth = max(max_depth, depth)
        g = len(groups_box)
        gb = np.zeros((FANOUT, 8), np.float32)
        gb[:, 0:3] = FAR
        gb[:, 3:6] = -FAR
        groups_box.append(gb)
        ce = np.full(FANOUT, SENT, np.int32)
        child_entry.append(ce)
        slots = collect8(i)
        # near-first visit order per ray-sign octant: slots sorted by
        # centroid projection along the octant direction.  Empty slots'
        # FAR centroids land at either end depending on the octant's
        # signs — irrelevant either way: their entries are SENT and the
        # push loop skips them
        cent = np.full((FANOUT, 3), FAR, np.float64)
        for j, s in enumerate(slots):
            cent[j] = (nb_min[s] + nb_max[s]) * 0.5
        ao = np.zeros(FANOUT, np.int32)
        for o in range(FANOUT):
            proj = cent @ _octs[o]
            proj[np.isnan(proj)] = FAR
            order8 = np.argsort(proj, kind="stable")
            packed = 0
            for ordinal, j in enumerate(order8):
                packed |= int(j) << (3 * ordinal)
            ao[o] = packed
        ax_order.append(ao)
        for j, s in enumerate(slots):
            gb[j, 0:3] = nb_min[s]
            gb[j, 3:6] = nb_max[s]
            if lcount[s] > 0:
                ce[j] = -(len(prim_rows) * LEAF) - 1
                w = order[lstart[s] : lstart[s] + lcount[s]]
                prim_rows.append(np.pad(w, (0, LEAF - len(w)), constant_values=-1))
        for j, s in enumerate(slots):
            if lcount[s] == 0:
                ce[j] = rec(s, depth + 1)
        return g

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        rec(0, 1)
    finally:
        sys.setrecursionlimit(old)

    # every pop pushes at most FANOUT-1 net entries per level
    need = (FANOUT - 1) * max_depth + 1
    assert need <= MAX_STACK, (
        f"bvh8 stack bound {need} exceeds MAX_STACK={MAX_STACK} "
        f"(tree depth {max_depth}; raise MAX_STACK or LEAF)"
    )

    rows = _leaf_rows(kind, params, mat_id, flip, pids, np.stack(prim_rows))
    return Bvh8Tree(
        entries=jnp.asarray(np.concatenate(child_entry).astype(np.int32)),
        boxes=jnp.asarray(np.concatenate(groups_box, axis=0)),
        prows=jnp.asarray(rows),
        axorder=jnp.asarray(np.concatenate(ax_order).astype(np.int32)),
    )


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _leaf_test(kind: int, pb, ovx, ovy, ovz, dxv, dyv, dzv, tmv, t_min, t_best):
    """(8, 128) candidate t for one leaf block; FAR on miss.

    Same formulas as ops/intersect.py's per-kind helpers (semantics of
    sphere.rs:39-66, aarect.rs:47-66, triangle.rs:33-63, ring.rs:36-52).
    """
    if kind in (SPHERE, MSPHERE):
        c0x, c0y, c0z, r = pb[:, 0:1], pb[:, 1:2], pb[:, 2:3], pb[:, 3:4]
        if kind == MSPHERE:
            t0, t1 = pb[:, 7:8], pb[:, 8:9]
            denom = t1 - t0
            frac = jnp.where(denom != 0.0, (tmv - t0) / jnp.where(denom != 0.0, denom, 1.0), 0.0)
            cx = c0x + (pb[:, 4:5] - c0x) * frac
            cy = c0y + (pb[:, 5:6] - c0y) * frac
            cz = c0z + (pb[:, 6:7] - c0z) * frac
        else:
            cx, cy, cz = c0x, c0y, c0z
        ocx = ovx - cx
        ocy = ovy - cy
        ocz = ovz - cz
        a = dxv * dxv + dyv * dyv + dzv * dzv
        hb = ocx * dxv + ocy * dyv + ocz * dzv
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = hb * hb - a * cc
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
        r1 = (-hb - sq) / a
        r2 = (-hb + sq) / a
        v1 = ok & (r1 >= t_min) & (r1 <= t_best)
        v2 = ok & (r2 >= t_min) & (r2 <= t_best)
        return jnp.where(v1, r1, jnp.where(v2, r2, FAR))

    if kind == RECT:
        a0, a1, b0, b1, kk = pb[:, 0:1], pb[:, 1:2], pb[:, 2:3], pb[:, 3:4], pb[:, 4:5]
        ax = pb[:, 5:6]
        ok_ = jnp.where(ax == 0.0, ovx, jnp.where(ax == 1.0, ovy, ovz))
        dk = jnp.where(ax == 0.0, dxv, jnp.where(ax == 1.0, dyv, dzv))
        t = (kk - ok_) / jnp.where(dk != 0.0, dk, 1.0)
        # in-plane axes (intersect._rect_axes): a = (ka==0 ? y : x), b = (ka==2 ? y : z)
        av = jnp.where(ax == 0.0, ovy + t * dyv, ovx + t * dxv)
        bv = jnp.where(ax == 2.0, ovy + t * dyv, ovz + t * dzv)
        valid = (
            (dk != 0.0)
            & (t >= t_min)
            & (t <= t_best)
            & (av >= a0)
            & (av <= a1)
            & (bv >= b0)
            & (bv <= b1)
        )
        return jnp.where(valid, t, FAR)

    if kind == TRIANGLE:
        ax_, ay, az = pb[:, 0:1], pb[:, 1:2], pb[:, 2:3]
        bx, by, bz = pb[:, 3:4], pb[:, 4:5], pb[:, 5:6]
        cx, cy, cz = pb[:, 6:7], pb[:, 7:8], pb[:, 8:9]
        abx, aby, abz = bx - ax_, by - ay, bz - az
        acx, acy, acz = cx - ax_, cy - ay, cz - az
        nx = aby * acz - abz * acy
        ny = abz * acx - abx * acz
        nz = abx * acy - aby * acx
        nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        inv = 1.0 / jnp.where(nlen == 0.0, 1.0, nlen)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        denom = dxv * nx + dyv * ny + dzv * nz
        t = ((ax_ - ovx) * nx + (ay - ovy) * ny + (az - ovz) * nz) / jnp.where(
            denom != 0.0, denom, 1.0
        )
        px = ovx + dxv * t
        py = ovy + dyv * t
        pz = ovz + dzv * t

        def crs(ux, uy, uz, vx, vy, vz):
            return uy * vz - uz * vy, uz * vx - ux * vz, ux * vy - uy * vx

        def dt3(ux, uy, uz, vx, vy, vz):
            return ux * vx + uy * vy + uz * vz

        # ac x (p - a) . ac x ab >= 0 etc (triangle.rs:51-63 via intersect._tri_t)
        e0 = crs(acx, acy, acz, px - ax_, py - ay, pz - az)
        r0 = crs(acx, acy, acz, abx, aby, abz)
        bax, bay, baz = ax_ - bx, ay - by, az - bz
        e1 = crs(bax, bay, baz, px - bx, py - by, pz - bz)
        r1 = crs(bax, bay, baz, cx - bx, cy - by, cz - bz)
        cbx, cby, cbz = bx - cx, by - cy, bz - cz
        e2 = crs(cbx, cby, cbz, px - cx, py - cy, pz - cz)
        r2 = crs(cbx, cby, cbz, ax_ - cx, ay - cy, az - cz)
        inside = (
            (dt3(*e0, *r0) >= 0.0) & (dt3(*e1, *r1) >= 0.0) & (dt3(*e2, *r2) >= 0.0)
        )
        valid = (denom != 0.0) & (nlen != 0.0) & (t >= t_min) & (t <= t_best) & inside
        return jnp.where(valid, t, FAR)

    if kind == RING:
        dmin2, dmax2 = pb[:, 2:3], pb[:, 3:4]
        t = -ovy / jnp.where(dyv != 0.0, dyv, 1.0)
        px = ovx + t * dxv
        pz = ovz + t * dzv
        dd = px * px + pz * pz
        valid = (
            (dyv != 0.0)
            & (t >= t_min)
            & (t <= t_best)
            & (dd >= dmin2)
            & (dd <= dmax2)
        )
        return jnp.where(valid, t, FAR)

    raise ValueError(f"bvh8 kernel: unsupported kind {kind}")


def _make_kernel(kind: int, t_min: float):
    from jax.experimental import pallas as pl

    def kernel(en_ref, ao_ref, gb_ref, pr_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
               ti_ref, t_ref, b_ref, r_ref, stack_ref, mb_ref):
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (FANOUT, 1), 0)

        def packet(j, _):
            ovx = ox_ref[pl.ds(j, 1), :]
            ovy = oy_ref[pl.ds(j, 1), :]
            ovz = oz_ref[pl.ds(j, 1), :]
            dxv = dx_ref[pl.ds(j, 1), :]
            dyv = dy_ref[pl.ds(j, 1), :]
            dzv = dz_ref[pl.ds(j, 1), :]
            tmv = tm_ref[pl.ds(j, 1), :]
            idx = 1.0 / dxv  # IEEE inf on 0 components, like aabb.rs:15-32
            idy = 1.0 / dyv
            idz = 1.0 / dzv
            t_ref[pl.ds(j, 1), :] = ti_ref[pl.ds(j, 1), :]
            b_ref[pl.ds(j, 1), :] = jnp.full((1, PACKET), -1, jnp.int32)
            r_ref[pl.ds(j, 1), :, :] = jnp.zeros((1, NCOL, PACKET), jnp.float32)
            stack_ref[0] = 0
            # the packet's dominant ray-sign octant selects the per-group
            # near-first child order (bit a = sign of mean d component a)
            oct_ = (
                (jnp.sum(dxv) > 0.0).astype(jnp.int32)
                + 2 * (jnp.sum(dyv) > 0.0).astype(jnp.int32)
                + 4 * (jnp.sum(dzv) > 0.0).astype(jnp.int32)
            )

            def cond(c):
                return c > 0

            def body(sp):
                e = stack_ref[sp - 1]
                sp = sp - 1

                # --- internal group: 8-wide slab test, push hit children
                @pl.when(e >= 0)
                def _():
                    gb = gb_ref[pl.ds(e * FANOUT, FANOUT), :]
                    t0x = (gb[:, 0:1] - ovx) * idx
                    t1x = (gb[:, 3:4] - ovx) * idx
                    t0y = (gb[:, 1:2] - ovy) * idy
                    t1y = (gb[:, 4:5] - ovy) * idy
                    t0z = (gb[:, 2:3] - ovz) * idz
                    t1z = (gb[:, 5:6] - ovz) * idz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), t_min),
                    )
                    t_best = t_ref[pl.ds(j, 1), :]
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), t_best),
                    )
                    bits_v = jnp.where(
                        jnp.any(tfar >= tnear, axis=1, keepdims=True), 1 << iota8, 0
                    )
                    # group-hit-bits mailbox lives in its own scratch slot so
                    # deep pushes can never clobber it (ADVICE r3)
                    mb_ref[0] = jnp.sum(bits_v)

                is_group = e >= 0
                bits = jnp.where(is_group, mb_ref[0], 0)
                eg = jnp.where(is_group, e, 0)
                perm = ao_ref[eg * FANOUT + oct_]
                spx = sp
                # push far-to-near (reverse of the packed near-first order)
                # so the nearest hit child pops first: t_best tightens
                # early and later groups prune harder
                for ordinal in reversed(range(FANOUT)):
                    jj = (perm >> (3 * ordinal)) & 7
                    ent = en_ref[eg * FANOUT + jj]
                    push = ((bits >> jj) & 1 == 1) & (ent != SENT)

                    @pl.when(push)
                    def _():
                        stack_ref[spx + 0] = ent

                    spx = spx + push.astype(jnp.int32)

                # --- leaf: 8-prim masked test, fold into (t, best)
                @pl.when(e < 0)
                def _():
                    ptr = -e - 1
                    pb = pr_ref[pl.ds(ptr, LEAF), :]
                    pid = pb[:, COL_PID : COL_PID + 1]
                    t_best = t_ref[pl.ds(j, 1), :]
                    tj = _leaf_test(
                        kind, pb, ovx, ovy, ovz, dxv, dyv, dzv, tmv, t_min, t_best
                    )
                    tm8 = jnp.min(tj, axis=0, keepdims=True)  # (1, 128)
                    # exact-t ties pick the SMALLEST prim id, matching the
                    # cluster/brute paths' argmin tie-break (ADVICE r3)
                    sel = jnp.min(
                        jnp.where(tj == tm8, pid, jnp.float32(1 << 24)),
                        axis=0,
                        keepdims=True,
                    )
                    # tm8 == FAR means every prim missed: never an update
                    # (t_best may exceed FAR when the caller passes +inf)
                    upd = (tm8 < t_best) & (tm8 < FAR)
                    t_ref[pl.ds(j, 1), :] = jnp.where(upd, tm8, t_best)
                    b_ref[pl.ds(j, 1), :] = jnp.where(
                        upd, sel, b_ref[pl.ds(j, 1), :].astype(jnp.float32)
                    ).astype(jnp.int32)
                    # winner-row extraction: per updated lane, copy the
                    # winning slot's full leaf row (exact f32 select — a
                    # bf16 MXU dot would round the geometry params)
                    winmask = (tj == tm8) & (pid == sel)  # (8, 128)
                    rows_new = jnp.sum(
                        jnp.where(winmask[:, None, :], pb[:, :, None], 0.0),
                        axis=0,
                    )  # (NCOL, 128)
                    r_ref[pl.ds(j, 1), :, :] = jnp.where(
                        upd[:, None, :], rows_new[None], r_ref[pl.ds(j, 1), :, :]
                    )

                return spx

            jax.lax.while_loop(cond, body, jnp.int32(1))
            return 0

        jax.lax.fori_loop(0, PACKETS_PER_PROGRAM, packet, 0, unroll=False)

    return kernel


def traverse_bvh8(
    tree: Bvh8Tree,
    kind: int,
    o: jnp.ndarray,  # (3, N)
    d: jnp.ndarray,
    tm: jnp.ndarray,  # (N,)
    t_min: float,
    t_init: Optional[jnp.ndarray] = None,  # (N,) running closest hit (prunes)
    interpret: bool = False,  # Pallas interpreter (CPU tests)
    return_rows: bool = False,  # also return winner leaf rows f32[NCOL, N]
):
    """Packet traversal -> (t f32[N], best i32[N][, rows f32[NCOL, N]]);
    best -1 where no hit beat ``t_init``.  ``t_min`` is static (the
    tracer's 0.001).  ``rows`` carries the winning primitive's full leaf
    row (params + pid/mat/flip/kind) so hit_details needs NO per-ray
    gather over the primitive table (zeros where best < 0)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.shape[1]
    per_prog = PACKET * PACKETS_PER_PROGRAM
    n_pad = (-n) % per_prog
    if n_pad:
        o = jnp.concatenate([o, jnp.full((3, n_pad), FAR)], axis=1)
        d = jnp.concatenate([d, jnp.ones((3, n_pad))], axis=1)
        tm = jnp.concatenate([tm, jnp.zeros(n_pad)])
    npk = (n + n_pad) // PACKET
    if t_init is None:
        ti = jnp.full((npk, PACKET), FAR)
    else:
        # clamp +inf (no-hit-yet lanes) to the kernel's FAR sentinel
        t_init = jnp.minimum(t_init, FAR)
        ti = jnp.concatenate([t_init, jnp.full((n_pad,), FAR)]).reshape(npk, PACKET)

    comp = [x.reshape(npk, PACKET) for x in (o[0], o[1], o[2], d[0], d[1], d[2], tm)]

    rspec = pl.BlockSpec(
        (PACKETS_PER_PROGRAM, PACKET), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rowspec = pl.BlockSpec(
        (PACKETS_PER_PROGRAM, NCOL, PACKET),
        lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid = (npk // PACKETS_PER_PROGRAM,)
    t, b, rows = pl.pallas_call(
        _make_kernel(kind, t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [rspec] * 8,
        out_specs=(rspec, rspec, rowspec),
        out_shape=(
            jax.ShapeDtypeStruct((npk, PACKET), jnp.float32),
            jax.ShapeDtypeStruct((npk, PACKET), jnp.int32),
            jax.ShapeDtypeStruct((npk, NCOL, PACKET), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(tree.entries, tree.axorder, tree.boxes, tree.prows, *comp, ti)
    t = t.reshape(-1)[:n]
    b = b.reshape(-1)[:n]
    if return_rows:
        return t, b, jnp.moveaxis(rows, 1, 0).reshape(NCOL, -1)[:, :n]
    return t, b
