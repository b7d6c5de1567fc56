"""Round-trip-amortized microbenchmarks (loop inside jit)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

REPS = 20


def bench(fn, *args, label=""):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label}: {dt*1e3:.3f} ms/op")
    return dt


def main():
    N = 1 << 20
    NN = 4096
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (NN, 8))
    idx = jax.random.randint(key, (N,), 0, NN)

    @jax.jit
    def g1(t, i):
        def body(k, acc):
            r = jnp.take(t, (i + k) % NN, axis=0)
            return acc + r[:, 0]

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros(N))

    bench(g1, table, idx, label=f"gather ({NN},8) by {N}")

    @jax.jit
    def g2(k0):
        def body(k, acc):
            keys = jax.random.randint(jax.random.fold_in(k0, k), (N,), 0, 1 << 24)
            sk, sv = jax.lax.sort_key_val(keys, jnp.arange(N, dtype=jnp.int32))
            return acc + sv[0]

        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    bench(g2, key, label=f"sort_key_val {N} (incl keygen)")

    rays = jax.random.normal(key, (7, N))

    @jax.jit
    def g3(r, i):
        def body(k, acc):
            t = jnp.take(r, (i + k) % N, axis=1)
            return acc + t[:, 0]

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros(7))

    bench(g3, rays, idx, label=f"ray reorder (7,{N})")

    # empty roundtrip
    @jax.jit
    def g0(x):
        return x + 1.0

    x = jnp.zeros(8)
    float(g0(x).sum())
    t0 = time.perf_counter()
    for _ in range(10):
        float(g0(x).sum())
    print(f"roundtrip floor: {(time.perf_counter()-t0)/10*1e3:.2f} ms")


if __name__ == "__main__":
    main()
