"""Scratch microbenchmarks for choosing the round-2 traversal design.

Measures on the real chip:
  1. per-ray row gather from a node table (XLA per-ray traversal candidate)
  2. sort_key_val + ray reorder (coherence-recovery candidate)
  3. a minimal Pallas packet-traversal kernel (per-program while loop,
     scalar node fetches) on a synthetic BVH
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # axon fence
    float(jax.tree.leaves(out)[0].sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    N = 1 << 20
    NN = 4096
    key = jax.random.PRNGKey(0)

    # --- 1. gather rows ---
    table = jax.random.normal(key, (NN, 8))
    idx = jax.random.randint(key, (N,), 0, NN)

    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = bench(f, table, idx)
    print(f"gather (NN={NN},8) by {N} idx: {dt*1e3:.2f} ms -> {N*32/dt/1e9:.1f} GB/s")

    tableT = table.T  # (8, NN)
    f2 = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
    dt = bench(f2, tableT, idx)
    print(f"gather transposed (8,NN) by {N} idx: {dt*1e3:.2f} ms")

    # one-hot contraction for comparison at block level (nb=8192 blocks)
    nb = N // 128
    idxb = idx[:nb]
    f3 = jax.jit(
        lambda t, i: jax.lax.dot(
            t.T, (i[None, :] == jnp.arange(NN, dtype=jnp.int32)[:, None]).astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )
    )
    dt = bench(f3, table, idxb)
    print(f"one-hot fetch (8,{NN})x({NN},{nb}): {dt*1e3:.2f} ms")

    # --- 2. sort ---
    keys = jax.random.randint(key, (N,), 0, 1 << 24, dtype=jnp.int32)
    vals = jnp.arange(N, dtype=jnp.int32)
    f4 = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
    dt = bench(f4, keys, vals)
    print(f"sort_key_val {N}: {dt*1e3:.2f} ms")

    rays = jax.random.normal(key, (7, N))
    f5 = jax.jit(lambda r, i: jnp.take(r, i, axis=1))
    dt = bench(f5, rays, idx)
    print(f"ray reorder (7,{N}) take axis=1: {dt*1e3:.2f} ms")

    # --- 3. Pallas packet traversal prototype ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # synthetic preorder skip-link tree over NN nodes; random-ish boxes.
    # Half leaves. leaf ptr into prim table of NP prims.
    rng = np.random.default_rng(0)
    depth = int(np.log2(NN))
    # build a real balanced preorder tree over [0,1)^3 grid of leaves
    nodes = []

    def rec(lo, hi, d):
        i = len(nodes)
        nodes.append(None)
        if d == 0:
            nodes[i] = (lo, hi, len(nodes), 1.0)  # leaf
        else:
            mid = (lo + hi) / 2
            a = np.array(hi)
            a[d % 3] = mid[d % 3]
            b = np.array(lo)
            b[d % 3] = mid[d % 3]
            rec(lo, a, d - 1)
            rec(b, hi, d - 1)
            nodes[i] = (lo, hi, len(nodes), 0.0)

    rec(np.zeros(3), np.ones(3), 11)  # 2^11 leaves -> 4095 nodes
    Nn = len(nodes)
    node_arr = np.zeros((Nn, 8), np.float32)
    for i, (lo, hi, skip, leaf) in enumerate(nodes):
        node_arr[i, 0:3] = lo
        node_arr[i, 3:6] = hi
        node_arr[i, 6] = skip
        node_arr[i, 7] = leaf * (i + 1)  # dummy leaf ptr
    node_j = jnp.asarray(node_arr)

    RB = 8  # sublane rows per block -> 1024 rays
    NBR = N // (RB * 128)

    def kernel(nodes_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref, c_ref):
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        idx_ = 1.0 / dx_ref[...]
        idy_ = 1.0 / dy_ref[...]
        idz_ = 1.0 / dz_ref[...]

        def cond(s):
            return s[0] < Nn

        def body(s):
            node, t_best, cnt = s
            b0 = nodes_ref[node, 0]
            b1 = nodes_ref[node, 1]
            b2 = nodes_ref[node, 2]
            b3 = nodes_ref[node, 3]
            b4 = nodes_ref[node, 4]
            b5 = nodes_ref[node, 5]
            skip = nodes_ref[node, 6]
            leaf = nodes_ref[node, 7]
            t0x = (b0 - ox) * idx_
            t1x = (b3 - ox) * idx_
            t0y = (b1 - oy) * idy_
            t1y = (b4 - oy) * idy_
            t0z = (b2 - oz) * idz_
            t1z = (b5 - oz) * idz_
            nearx = jnp.minimum(t0x, t1x)
            farx = jnp.maximum(t0x, t1x)
            neary = jnp.minimum(t0y, t1y)
            fary = jnp.maximum(t0y, t1y)
            nearz = jnp.minimum(t0z, t1z)
            farz = jnp.maximum(t0z, t1z)
            tmin = jnp.maximum(jnp.maximum(nearx, neary), jnp.maximum(nearz, 1e-3))
            tmax = jnp.minimum(jnp.minimum(farx, fary), jnp.minimum(farz, t_best))
            hit = tmax > tmin
            anyhit = jnp.any(hit)
            # fake leaf work: tighten t_best a bit
            t_best = jnp.where((leaf > 0.0) & hit, jnp.minimum(t_best, tmin + 0.5), t_best)
            nxt = jnp.where(anyhit & (leaf == 0.0), node + 1, skip.astype(jnp.int32))
            return nxt, t_best, cnt + 1

        node0 = jnp.int32(0)
        t0 = jnp.full((RB, 128), 1e30, jnp.float32)
        _, t_best, cnt = jax.lax.while_loop(cond, body, (node0, t0, jnp.int32(0)))
        t_ref[...] = t_best
        c_ref[...] = jnp.full((RB, 128), cnt, jnp.int32)

    def run(o, d):
        grid = (NBR,)
        rspec = pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(node_j.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)]
            + [rspec] * 6,
            out_specs=(rspec, rspec),
            out_shape=(
                jax.ShapeDtypeStruct((NBR * RB, 128), jnp.float32),
                jax.ShapeDtypeStruct((NBR * RB, 128), jnp.int32),
            ),
        )(node_j, *o, *d)

    o = [v.reshape(NBR * RB, 128) for v in jax.random.uniform(key, (3, N))]
    # coherent-ish: all rays point roughly +x
    dcoh = jax.random.uniform(key, (3, N), minval=0.01, maxval=0.2)
    dcoh = dcoh.at[0].add(1.0)
    d = [v.reshape(NBR * RB, 128) for v in dcoh]
    f6 = jax.jit(run)
    t, c = f6(o, d)
    print("pallas coherent steps/block avg:", float(c[:, 0].reshape(NBR, RB)[:, 0].mean()))
    dt = bench(f6, o, d)
    steps = float(c[:, 0].reshape(NBR, RB)[:, 0].astype(jnp.float32).mean()) * NBR
    print(f"pallas packet traversal coherent: {dt*1e3:.2f} ms total, {steps:.0f} total steps, "
          f"{dt/steps*1e9:.0f} ns/step")

    dinc = jax.random.normal(jax.random.PRNGKey(1), (3, N))
    d2 = [v.reshape(NBR * RB, 128) for v in dinc]
    t, c = f6(o, d2)
    dt = bench(f6, o, d2)
    steps = float(c[:, 0].reshape(NBR, RB)[:, 0].astype(jnp.float32).mean()) * NBR
    print(f"pallas packet traversal incoherent: {dt*1e3:.2f} ms total, {steps:.0f} total steps, "
          f"{dt/steps*1e9:.0f} ns/step")


if __name__ == "__main__":
    main()
