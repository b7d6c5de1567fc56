"""Round-2 design microbenchmarks on the real chip.

Measures the primitives the traversal redesign is built from:
  1. per-bounce ray sort cost: key + argsort + gather 12 fields + inverse
  2. dense (P, N) intersection rates per kind (to pick bvh_threshold)
  3. current traverse_bvh on sorted vs unsorted incoherent rays
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


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.device_get(jax.tree.map(lambda x: x.reshape(-1)[0], out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.map(lambda x: x.reshape(-1)[0], out))
    return (time.perf_counter() - t0) / reps


def morton_key(o, d, lo, hi):
    """10-bit-ish sort key: 3-bit direction octant + 12-bit origin morton."""
    oct_ = (
        (d[0] >= 0).astype(jnp.uint32) * 4
        + (d[1] >= 0).astype(jnp.uint32) * 2
        + (d[2] >= 0).astype(jnp.uint32)
    )
    q = jnp.clip((o - lo[:, None]) / (hi - lo)[:, None], 0.0, 1.0)
    cell = (q * 15.999).astype(jnp.uint32)  # 4 bits per axis
    # interleave 4 bits x 3 axes = 12-bit morton
    m = jnp.zeros_like(oct_)
    for b in range(4):
        m = m | (((cell[0] >> b) & 1) << (3 * b + 2))
        m = m | (((cell[1] >> b) & 1) << (3 * b + 1))
        m = m | (((cell[2] >> b) & 1) << (3 * b))
    return (oct_ << 12) | m


def main():
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (3, N), minval=0.0, maxval=100.0)
    d = jax.random.normal(jax.random.fold_in(key, 1), (3, N))
    tm = jnp.zeros((N,))
    lo = jnp.zeros(3)
    hi = jnp.full(3, 100.0)

    # --- 1. sort + gather + inverse-permutation scatter
    @jax.jit
    def sort_roundtrip(o, d, tm):
        k = morton_key(o, d, lo, hi)
        perm = jnp.argsort(k)
        fields = jnp.concatenate([o, d, tm[None], o, d, tm[None]], axis=0)  # 14 rows
        g = jnp.take(fields, perm, axis=1)
        inv = jnp.zeros((N,), jnp.int32).at[perm].set(jnp.arange(N, dtype=jnp.int32))
        back = jnp.take(g[:4], inv, axis=1)
        return back

    dt = bench(sort_roundtrip, o, d, tm)
    print(f"sort+gather14+scatter4 @ N={N}: {dt*1e3:.2f} ms")

    @jax.jit
    def sort_only(o, d):
        k = morton_key(o, d, lo, hi)
        return jnp.argsort(k)

    dt = bench(sort_only, o, d)
    print(f"key+argsort only: {dt*1e3:.2f} ms")

    @jax.jit
    def gather_only(o, d, perm):
        fields = jnp.concatenate([o, d, o, d, o[:2]], axis=0)  # 14 rows
        return jnp.take(fields, perm, axis=1)

    perm = jnp.argsort(jax.random.uniform(key, (N,)))
    dt = bench(gather_only, o, d, perm)
    print(f"gather 14 rows by perm: {dt*1e3:.2f} ms")

    # --- 2. dense sphere eval rate
    for P in (512, 2048, 8192):
        c = jax.random.uniform(jax.random.fold_in(key, 2), (3, P), maxval=100.0)
        r = jnp.full((P,), 0.5)

        @jax.jit
        def dense_sphere(o, d, c=c, r=r):
            ocx = o[0][None] - c[0][:, None]
            ocy = o[1][None] - c[1][:, None]
            ocz = o[2][None] - c[2][:, None]
            a = (d * d).sum(0)[None]
            hb = ocx * d[0][None] + ocy * d[1][None] + ocz * d[2][None]
            cc = ocx * ocx + ocy * ocy + ocz * ocz - (r * r)[:, None]
            disc = hb * hb - a * cc
            ok = disc >= 0
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            r1 = (-hb - sq) / a
            r2 = (-hb + sq) / a
            t = jnp.where(ok & (r1 > 1e-3), r1, jnp.where(ok & (r2 > 1e-3), r2, jnp.inf))
            return jnp.min(t, axis=0), jnp.argmin(t, axis=0)

        dt = bench(dense_sphere, o, d)
        rate = P * N / dt
        print(f"dense sphere P={P}: {dt*1e3:.2f} ms -> {rate/1e9:.1f} Gpairs/s "
              f"({N/dt/1e6:.0f} Mrays/s)")

    # --- 3. MXU-assisted dense sphere (c.d and c.o via matmul)
    for P in (2048, 8192):
        c = jax.random.uniform(jax.random.fold_in(key, 2), (3, P), maxval=100.0)
        r = jnp.full((P,), 0.5)

        @jax.jit
        def dense_sphere_mxu(o, d, c=c, r=r):
            cd = jax.lax.dot(c.T, d, preferred_element_type=jnp.float32)  # (P,N)
            co = jax.lax.dot(c.T, o, preferred_element_type=jnp.float32)
            od = (o * d).sum(0)[None]
            oo = (o * o).sum(0)[None]
            a = (d * d).sum(0)[None]
            hb = od - cd
            cc = oo - 2 * co + ((c * c).sum(0) - r * r)[:, None]
            disc = hb * hb - a * cc
            ok = disc >= 0
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            r1 = (-hb - sq) / a
            r2 = (-hb + sq) / a
            t = jnp.where(ok & (r1 > 1e-3), r1, jnp.where(ok & (r2 > 1e-3), r2, jnp.inf))
            return jnp.min(t, axis=0), jnp.argmin(t, axis=0)

        dt = bench(dense_sphere_mxu, o, d)
        print(f"dense sphere MXU P={P}: {dt*1e3:.2f} ms ({N/dt/1e6:.0f} Mrays/s)")

    # --- 4. dense triangle rate
    for P in (2048, 13312):
        v0 = jax.random.uniform(jax.random.fold_in(key, 3), (3, P), maxval=100.0)
        v1 = v0 + jax.random.normal(jax.random.fold_in(key, 4), (3, P))
        v2 = v0 + jax.random.normal(jax.random.fold_in(key, 5), (3, P))

        @jax.jit
        def dense_tri(o, d, v0=v0, v1=v1, v2=v2):
            # Moller-Trumbore, component form
            e1 = v1 - v0
            e2 = v2 - v0
            px = d[1][None] * e2[2][:, None] - d[2][None] * e2[1][:, None]
            py = d[2][None] * e2[0][:, None] - d[0][None] * e2[2][:, None]
            pz = d[0][None] * e2[1][:, None] - d[1][None] * e2[0][:, None]
            det = e1[0][:, None] * px + e1[1][:, None] * py + e1[2][:, None] * pz
            inv = 1.0 / jnp.where(det == 0, 1.0, det)
            tx = o[0][None] - v0[0][:, None]
            ty = o[1][None] - v0[1][:, None]
            tz = o[2][None] - v0[2][:, None]
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1[2][:, None] - tz * e1[1][:, None]
            qy = tz * e1[0][:, None] - tx * e1[2][:, None]
            qz = tx * e1[1][:, None] - ty * e1[0][:, None]
            v = (d[0][None] * qx + d[1][None] * qy + d[2][None] * qz) * inv
            t = (e2[0][:, None] * qx + e2[1][:, None] * qy + e2[2][:, None] * qz) * inv
            ok = (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-3)
            t = jnp.where(ok, t, jnp.inf)
            return jnp.min(t, axis=0), jnp.argmin(t, axis=0)

        dt = bench(dense_tri, o, d)
        print(f"dense tri P={P}: {dt*1e3:.2f} ms -> {P*N/dt/1e9:.1f} Gpairs/s "
              f"({N/dt/1e6:.0f} Mrays/s)")


if __name__ == "__main__":
    main()
