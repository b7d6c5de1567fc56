"""Measure TPU gather layouts to pick the per-ray fetch strategy.

Hypothesis: round-1 used last-axis (column) gathers / one-hot matmuls because
column gathers are slow; ROW gathers (axis 0, contiguous minor dim) should be
near memory speed.  Also times argsort + take_along_axis for the per-bounce
ray sort, and the dense cluster slab test.
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N = 1 << 17
REPS = 20


def bench(fn, *args):
    out = jax.jit(fn)(*args)
    jax.device_get(jax.tree.map(lambda x: x.reshape(-1)[0], out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = jax.jit(fn)(*args)
    jax.device_get(jax.tree.map(lambda x: x.reshape(-1)[0], out))
    return (time.perf_counter() - t0) / REPS


def main():
    key = jax.random.PRNGKey(0)

    # --- row gathers: (P, R) table, take axis=0 at N indices
    for P in (256, 3456, 16384, 1 << 21):
        for R in (8, 48, 128):
            tbl = jax.random.normal(key, (P, R))
            idx = jax.random.randint(jax.random.fold_in(key, P + R), (N,), 0, P)

            def row_gather(tbl, idx):
                return jnp.take(tbl, idx, axis=0)

            dt = bench(row_gather, tbl, idx)
            print(f"row-gather (P={P:>8}, R={R:>3}) x {N}: {dt*1e3:7.2f} ms "
                  f"({N/dt/1e6:8.1f} Mrows/s)")

    # --- column gather (round-1 pattern) for contrast
    tbl = jax.random.normal(key, (48, 3456))
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, 3456)

    def col_gather(tbl, idx):
        return jnp.take(tbl, idx, axis=1)

    dt = bench(col_gather, tbl, idx)
    print(f"col-gather (48, 3456) x {N}: {dt*1e3:7.2f} ms")

    # --- 1-d table gather (perlin perm)
    tbl1 = jax.random.randint(key, (256,), 0, 256)
    idx = jax.random.randint(jax.random.fold_in(key, 2), (N,), 0, 256)

    def take1d(tbl, idx):
        return jnp.take(tbl, idx, axis=0)

    dt = bench(take1d, tbl1, idx)
    print(f"1d-gather (256,) x {N}: {dt*1e3:7.2f} ms")

    # --- one-hot matmul contrast, f32 HIGHEST vs bf16
    tblf = jax.random.normal(key, (48, 3456))
    idx = jax.random.randint(jax.random.fold_in(key, 3), (N,), 0, 3456)

    def onehot_hi(tbl, idx):
        oh = (idx[None, :] == jnp.arange(3456, dtype=idx.dtype)[:, None]).astype(jnp.float32)
        return jax.lax.dot(tbl, oh, precision=jax.lax.Precision.HIGHEST)

    def onehot_bf16(tbl, idx):
        oh = (idx[None, :] == jnp.arange(3456, dtype=idx.dtype)[:, None]).astype(jnp.bfloat16)
        return jax.lax.dot(tbl.astype(jnp.bfloat16), oh,
                           preferred_element_type=jnp.float32)

    print(f"onehot f32 HIGHEST (48,3456): {bench(onehot_hi, tblf, idx)*1e3:7.2f} ms")
    print(f"onehot bf16        (48,3456): {bench(onehot_bf16, tblf, idx)*1e3:7.2f} ms")

    # --- sort machinery at N
    keys32 = jax.random.randint(key, (N,), 0, 1 << 15, dtype=jnp.int32)

    def argsort(k):
        return jnp.argsort(k)

    print(f"argsort i32 x {N}: {bench(argsort, keys32)*1e3:7.2f} ms")

    fields = jax.random.normal(key, (8, N))
    perm = jnp.argsort(keys32)

    def gather_fields(f, p):
        return jnp.take(f, p, axis=1)

    print(f"permute 8 field rows: {bench(gather_fields, fields, perm)*1e3:7.2f} ms")

    def gather_fields_rows(f, p):
        return jnp.take(f.T, p, axis=0)  # row layout variant

    print(f"permute 8 fields (row layout): {bench(gather_fields_rows, fields, perm)*1e3:7.2f} ms")

    # --- cluster slab test: (C, N) entry t + per-block reduce
    C, BLOCK = 256, 256
    bmin = jax.random.uniform(key, (3, C), maxval=50.0)
    bmax = bmin + 5.0
    o = jax.random.uniform(jax.random.fold_in(key, 4), (3, N), maxval=55.0)
    d = jax.random.normal(jax.random.fold_in(key, 5), (3, N))

    def slab(o, d):
        inv = 1.0 / d
        t0 = (bmin[:, :, None] - o[:, None, :]) * inv[:, None, :]
        t1 = (bmax[:, :, None] - o[:, None, :]) * inv[:, None, :]
        near = jnp.maximum(jnp.maximum(jnp.minimum(t0[0], t1[0]),
                                       jnp.minimum(t0[1], t1[1])),
                           jnp.minimum(t0[2], t1[2]))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t0[0], t1[0]),
                                      jnp.maximum(t0[1], t1[1])),
                          jnp.maximum(t0[2], t1[2]))
        entry = jnp.where(far >= jnp.maximum(near, 0.0), near, jnp.inf)  # (C, N)
        eb = entry.reshape(C, N // BLOCK, BLOCK).min(axis=2)  # (C, nb)
        return eb

    print(f"cluster slab (C={C}) + block-min: {bench(slab, o, d)*1e3:7.2f} ms")

    # --- per-block cluster argsort: (nb, C)
    eb = jax.jit(slab)(o, d)

    def block_sort(eb):
        return jnp.argsort(eb.T, axis=1)

    print(f"per-block argsort (nb={N//BLOCK}, C={C}): {bench(block_sort, eb)*1e3:7.2f} ms")

    # --- atlas texel row gather: (T, 8) f32
    T = 2 << 20
    atlas = jax.random.normal(key, (T, 8))
    tidx = jax.random.randint(jax.random.fold_in(key, 6), (N,), 0, T)

    def texel(a, i):
        return jnp.take(a, i, axis=0)

    print(f"atlas row-gather (T={T}, 8) x {N}: {bench(texel, atlas, tidx)*1e3:7.2f} ms")

    np.random.seed(0)


if __name__ == "__main__":
    main()
