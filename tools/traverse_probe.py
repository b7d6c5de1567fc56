"""Traversal diagnosis: where does closest-hit time go on a heavy scene?

Times, per tree and for the dense tail, under three ray populations
(coherent camera rays / the same rays coherence-sorted after one diffuse
bounce / fully shuffled), the cluster while-loop step count and wall time.
One JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def bench(fn, *args, reps=5):
    jax.device_get(jax.tree.map(lambda x: x.sum() if hasattr(x, "sum") else x, fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.map(lambda x: x.sum() if hasattr(x, "sum") else x, fn(*args)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main(argv=None) -> int:
    scene_name = argv[0] if argv else "wwscene"
    n = int(argv[1]) if len(argv) > 1 else 1 << 17

    from raytracer2022_tpu import make_camera
    from raytracer2022_tpu.ops.intersect import closest_hit, traverse_clusters
    from raytracer2022_tpu.ops.sort import ray_sort_key, sort_by_key
    from raytracer2022_tpu.render.camera import get_rays
    from raytracer2022_tpu.scene.library import SCENES

    bundle = SCENES[scene_name]()
    s = bundle.scene
    cam = make_camera(**bundle.camera_kwargs)
    key = jax.random.PRNGKey(0)
    print(json.dumps({"scene": scene_name, "trees": s.stats.trees,
                      "n_in_bvh": s.stats.n_in_bvh, "n_prims": s.n_prims,
                      "kind_ranges": s.stats.kind_ranges}), flush=True)

    # coherent camera rays
    u = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    v = jax.random.uniform(jax.random.fold_in(key, 2), (n,))
    o, d, tm = jax.jit(lambda u, v, k: get_rays(cam, u, v, k))(u, v, key)

    # one diffuse bounce: new origins at hit points, cosine dirs about normal
    from raytracer2022_tpu.ops.sampling import cosine_about_normal

    def one_bounce(o, d, tm, k):
        hit, _ = closest_hit(s, o, d, tm, 1e-3, jnp.inf, k)
        d2 = cosine_about_normal(jax.random.fold_in(k, 3), hit.normal)
        return hit.p, d2

    o2, d2 = jax.jit(one_bounce)(o, d, tm, key)

    # sorted variant of the bounced rays
    def sort_rays(o, d):
        wb = s.stats.world_bounds
        sk = ray_sort_key(o, d, wb[0], wb[1])
        rows = sort_by_key(sk, (o[0], o[1], o[2], d[0], d[1], d[2]))
        return jnp.stack(rows[0:3]), jnp.stack(rows[3:6])

    o2s, d2s = jax.jit(sort_rays)(o2, d2)
    t_sort = bench(jax.jit(sort_rays), o2, d2)
    print(json.dumps({"sort_6rows_ms": round(t_sort * 1e3, 2)}), flush=True)

    pops = {"camera": (o, d), "bounce1": (o2, d2), "bounce1_sorted": (o2s, d2s)}

    for i in range(len(s.clusters)):
        f = jax.jit(
            lambda o, d, tm, i=i: traverse_clusters(
                s, i, o, d, tm, 1e-3, jnp.inf, return_steps=True
            )
        )
        for pname, (oo, dd) in pops.items():
            tb, bb, steps = f(oo, dd, tm)
            t = bench(f, oo, dd, tm)
            print(
                json.dumps(
                    {
                        "tree": i,
                        "kind": s.stats.trees[i][0],
                        "clusters": s.stats.trees[i][1],
                        "pop": pname,
                        "ms": round(t * 1e3, 2),
                        "loop_steps": int(steps),
                        "hit_frac": round(float(jnp.isfinite(tb).mean()), 3),
                    }
                ),
                flush=True,
            )

    # full closest_hit (trees + dense tail + mediums + hit_details)
    f = jax.jit(lambda o, d, tm: closest_hit(s, o, d, tm, 1e-3, jnp.inf, key))
    for pname, (oo, dd) in pops.items():
        t = bench(f, oo, dd, tm)
        print(json.dumps({"closest_hit": pname, "ms": round(t * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
