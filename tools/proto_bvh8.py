"""Prototype: 8-ary BVH Pallas traversal kernel (spheres), correctness + perf.

Design under test:
  * 128-ray packets: rays live on lanes, child boxes / leaf prims on sublanes,
    so every slab/leaf op is a dense (8, 128) vreg op;
  * per-packet independent while loop driven by an SMEM stack of group ids;
  * t_best/best live in output refs (pl.when-updatable), loop carry is one
    scalar;
  * child meta (type/ptr) in SMEM, child boxes in VMEM rows.
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAF = 8  # prims per leaf row block
FANOUT = 8
MAX_STACK = 160
SENT = 0x7FFFFFFF  # empty-child sentinel in the tagged entry table


def build_bvh8(bmin: np.ndarray, bmax: np.ndarray):
    """Host 8-ary BVH: recursive largest-axis median split, 3 levels per group."""
    n = len(bmin)
    centroid = (bmin + bmax) * 0.5

    groups_box = []  # (Ng, 8, 6)
    child_type = []  # (Ng, 8) 0 empty / 1 internal / 2 leaf
    child_ptr = []  # (Ng, 8)
    prim_rows = []  # list of prim ids per leaf block (padded to LEAF with -1)

    def split8(ids):
        """Split ids into up to 8 chunks by recursive median split."""
        chunks = [ids]
        for _ in range(3):
            nxt = []
            for c in chunks:
                if len(c) <= LEAF:
                    nxt.append(c)
                    continue
                cc = centroid[c]
                ax = int(np.argmax(cc.max(axis=0) - cc.min(axis=0)))
                c = c[np.argsort(cc[:, ax], kind="stable")]
                m = len(c) // 2
                nxt.extend([c[:m], c[m:]])
            chunks = nxt
        return chunks

    def rec(ids) -> int:
        g = len(groups_box)
        groups_box.append(np.zeros((8, 6), np.float32))
        child_type.append(np.zeros(8, np.int32))
        child_ptr.append(np.zeros(8, np.int32))
        groups_box[g][:, 0:3] = 1e30
        groups_box[g][:, 3:6] = -1e30
        chunks = split8(ids)
        for j, c in enumerate(chunks):
            if len(c) == 0:
                continue
            groups_box[g][j, 0:3] = bmin[c].min(axis=0)
            groups_box[g][j, 3:6] = bmax[c].max(axis=0)
            if len(c) <= LEAF:
                child_type[g][j] = 2
                child_ptr[g][j] = len(prim_rows) * LEAF
                prim_rows.append(np.pad(c, (0, LEAF - len(c)), constant_values=-1))
            else:
                child_type[g][j] = 1
                # placeholder, fixed after recursion
        # recurse after reserving this group id
        for j, c in enumerate(chunks):
            if len(c) > LEAF:
                child_ptr[g][j] = rec(c)
        return g

    rec(np.arange(n))
    return (
        np.concatenate(groups_box, axis=0),  # (Ng*8, 6)
        np.concatenate(child_type),
        np.concatenate(child_ptr),
        np.stack(prim_rows),  # (Lb, LEAF) prim ids, -1 padded
    )


def make_scene(n=13079, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.2, 0.8, n).astype(np.float32)
    return centers, radii


def sphere_prim_rows(centers, radii, prim_rows):
    """(Lb*LEAF, 24) rows: cx cy cz r ... pid at col 16. Dummy rows never hit."""
    lb = prim_rows.shape[0]
    rows = np.zeros((lb * LEAF, 24), np.float32)
    flat = prim_rows.reshape(-1)
    valid = flat >= 0
    safe = np.where(valid, flat, 0)
    rows[:, 0:3] = np.where(valid[:, None], centers[safe], 1e30)
    rows[:, 3] = np.where(valid, radii[safe], 0.0)
    rows[:, 16] = np.where(valid, flat, 0)
    return rows


def traverse8(groups, ctype, cptr, prows, o, d, t_min=1e-3, rays_per_prog=8192):
    """o, d: (3, N). Returns (t_best (N,), best (N,), steps (N,))."""
    n = o.shape[1]
    npk = n // 128  # packets
    ppp = rays_per_prog // 128  # packets per program
    nprog = npk // ppp
    ngc = groups.shape[0]  # Ng*8

    ox, oy, oz = (o[i].reshape(npk, 128) for i in range(3))
    dx, dy, dz = (d[i].reshape(npk, 128) for i in range(3))

    entry_j = ctype  # pre-tagged entries passed in (see main)

    def kernel(en_ref, gb_ref, pr_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_ref, b_ref, s_ref, stack_ref):
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        def packet(j, _):
            ovx = ox_ref[pl.ds(j, 1), :]
            ovy = oy_ref[pl.ds(j, 1), :]
            ovz = oz_ref[pl.ds(j, 1), :]
            dxv = dx_ref[pl.ds(j, 1), :]
            dyv = dy_ref[pl.ds(j, 1), :]
            dzv = dz_ref[pl.ds(j, 1), :]
            idx = 1.0 / dxv
            idy = 1.0 / dyv
            idz = 1.0 / dzv
            t_ref[pl.ds(j, 1), :] = jnp.full((1, 128), 1e30, jnp.float32)
            b_ref[pl.ds(j, 1), :] = jnp.zeros((1, 128), jnp.int32)
            stack_ref[0] = 0

            def cond(c):
                return c[0] > 0

            def body(c):
                sp, steps = c
                e = stack_ref[sp - 1]
                sp = sp - 1

                @pl.when(e >= 0)
                def _():
                    gb = gb_ref[pl.ds(e * 8, 8), :]  # (8, 8) cols 0..5 used
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
                        jnp.any(tfar > tnear, axis=1, keepdims=True), 1 << iota8, 0
                    )
                    stack_ref[MAX_STACK - 1] = jnp.sum(bits_v)

                is_group = e >= 0
                bits = jnp.where(is_group, stack_ref[MAX_STACK - 1], 0)
                eg = jnp.where(is_group, e, 0)
                spx = sp
                for jj in range(FANOUT):
                    ent = en_ref[eg * 8 + jj]
                    push = ((bits >> jj) & 1 == 1) & (ent != SENT)

                    @pl.when(push)
                    def _():
                        stack_ref[spx + 0] = ent

                    spx = spx + push.astype(jnp.int32)
                sp = spx

                @pl.when(e < 0)
                def _():
                    ptr = -e - 1
                    pb = pr_ref[pl.ds(ptr, 8), :]  # (8, 24)
                    cx = pb[:, 0:1]
                    cy = pb[:, 1:2]
                    cz = pb[:, 2:3]
                    r = pb[:, 3:4]
                    pid = pb[:, 16:17]
                    ocx = ovx - cx
                    ocy = ovy - cy
                    ocz = ovz - cz
                    a = dxv * dxv + dyv * dyv + dzv * dzv
                    hb = ocx * dxv + ocy * dyv + ocz * dzv
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                    disc = hb * hb - a * cc
                    ok = disc >= 0.0
                    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
                    t_best = t_ref[pl.ds(j, 1), :]
                    r1 = (-hb - sq) / a
                    r2 = (-hb + sq) / a
                    v1 = ok & (r1 >= t_min) & (r1 <= t_best)
                    v2 = ok & (r2 >= t_min) & (r2 <= t_best)
                    tj = jnp.where(v1, r1, jnp.where(v2, r2, 1e30))
                    tm8 = jnp.min(tj, axis=0, keepdims=True)  # (1,128)
                    sel = jnp.max(
                        jnp.where(tj == tm8, pid, -1.0), axis=0, keepdims=True
                    )
                    upd = tm8 < t_best
                    t_ref[pl.ds(j, 1), :] = jnp.where(upd, tm8, t_best)
                    b_ref[pl.ds(j, 1), :] = jnp.where(
                        upd, sel, b_ref[pl.ds(j, 1), :].astype(jnp.float32)
                    ).astype(jnp.int32)

                return sp, steps + 1

            _, steps = jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))
            s_ref[pl.ds(j, 1), :] = jnp.full((1, 128), steps, jnp.int32)
            return 0

        jax.lax.fori_loop(0, 8, packet, 0, unroll=False)

    rspec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    grid = (npk // 8,)
    t, b, s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [rspec] * 6,
        out_specs=(rspec, rspec, rspec),
        out_shape=(
            jax.ShapeDtypeStruct((npk, 128), jnp.float32),
            jax.ShapeDtypeStruct((npk, 128), jnp.int32),
            jax.ShapeDtypeStruct((npk, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
    )(entry_j, groups, prows, ox, oy, oz, dx, dy, dz)
    return t.reshape(-1), b.reshape(-1), s.reshape(-1)


def main():
    centers, radii = make_scene()
    bmin = centers - radii[:, None]
    bmax = centers + radii[:, None]
    t0 = time.perf_counter()
    groups, ctype, cptr, prim_rows = build_bvh8(bmin, bmax)
    print(f"build: {time.perf_counter()-t0:.2f}s, groups={len(ctype)//8}, "
          f"leaf blocks={prim_rows.shape[0]}")
    prows = sphere_prim_rows(centers, radii, prim_rows)

    # pad group box rows to (.., 8) cols for clean tiling
    gb = np.zeros((groups.shape[0], 8), np.float32)
    gb[:, :6] = groups

    gj = jnp.asarray(gb)
    # pre-tagged child entries: internal -> group id, leaf -> -(ptr+1),
    # empty -> SENTINEL (never pushed)
    ctj = jnp.asarray(
        np.where(ctype == 1, cptr, np.where(ctype == 2, -cptr - 1, SENT)).astype(
            np.int32
        )
    )
    cpj = jnp.asarray(cptr)
    prj = jnp.asarray(prows)

    N = 1 << 17
    key = jax.random.PRNGKey(0)
    o_inc = jax.random.uniform(key, (3, N), minval=0.0, maxval=100.0)
    d_inc = jax.random.normal(jax.random.fold_in(key, 1), (3, N))
    # coherent: camera-ish from outside
    o_coh = jnp.tile(jnp.array([[50.0], [50.0], [-40.0]]), (1, N))
    tt = jnp.linspace(-0.4, 0.4, N)
    d_coh = jnp.stack([tt, 0.3 * jnp.sin(tt * 20), jnp.ones_like(tt)], axis=0)

    fn = jax.jit(lambda o, d: traverse8(gj, ctj, cpj, prj, o, d))

    # correctness vs brute force on a slice
    M = 4096
    tc0 = time.perf_counter()
    t_p, b_p, s_p = fn(o_inc[:, :N], d_inc[:, :N])
    jax.block_until_ready(t_p)
    print(f"compile+first run: {time.perf_counter()-tc0:.1f}s")
    oc = np.asarray(o_inc[:, :M]).T
    dc = np.asarray(d_inc[:, :M]).T
    ocx = oc[:, None, :] - centers[None, :, :]
    a = (dc * dc).sum(-1)[:, None]
    hb = (ocx * dc[:, None, :]).sum(-1)
    cc = (ocx * ocx).sum(-1) - radii[None, :] ** 2
    disc = hb * hb - a * cc
    ok = disc >= 0
    sq = np.sqrt(np.where(ok, disc, 0))
    r1 = (-hb - sq) / a
    r2 = (-hb + sq) / a
    v1 = ok & (r1 >= 1e-3)
    v2 = ok & (r2 >= 1e-3)
    tall = np.where(v1, r1, np.where(v2, r2, 1e30))
    t_ref = tall.min(axis=1)
    match = np.allclose(np.asarray(t_p[:M]), t_ref, rtol=1e-4, atol=1e-4)
    print(f"correctness vs brute force: {match}")
    if not match:
        bad = np.nonzero(~np.isclose(np.asarray(t_p[:M]), t_ref, rtol=1e-4, atol=1e-4))[0]
        print("mismatches:", bad[:10], np.asarray(t_p[bad[:5]]), t_ref[bad[:5]])

    for label, o, d in [("incoherent", o_inc, d_inc), ("coherent", o_coh, d_coh)]:
        t, b, s = fn(o, d)
        float(t.sum())
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            t, b, s = fn(o, d)
        float(t.sum())
        dt = (time.perf_counter() - t0) / reps
        steps = float(s.reshape(-1, 128)[:, 0].astype(jnp.float32).mean())
        print(f"{label}: {dt*1e3:.2f} ms for {N} rays "
              f"({N/dt/1e6:.1f} Mrays/s), avg group-steps/packet={steps:.0f}")


if __name__ == "__main__":
    main()
