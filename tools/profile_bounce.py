"""Per-stage bounce cost breakdown for a scene (amortized over in-jit loops).

Usage: python -m tools.profile_bounce [scene] [--n 131072] [--reps 10]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def bench(fn, *args, reps, label):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s}: {dt*1e3:8.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="random_scene")
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from raytracer2022_tpu.ops.intersect import closest_hit, hit_details
    from raytracer2022_tpu.ops.lights import lights_pdf, sample_lights
    from raytracer2022_tpu.ops.materials import emitted, scatter, texture_value
    from raytracer2022_tpu.render.integrator import TraceConfig, _eval_vertex
    from raytracer2022_tpu.scene.library import SCENES

    bundle = SCENES[args.scene]()
    scene = bundle.scene
    print(f"scene={args.scene} prims={scene.n_prims} lights={scene.n_lights} "
          f"trees={scene.stats.trees} any_xform={scene.any_xform}")

    n = args.n
    reps = args.reps
    key = jax.random.PRNGKey(0)
    # incoherent rays inside the scene bbox-ish region
    o = jax.random.uniform(key, (3, n), minval=-100.0, maxval=100.0)
    d = jax.random.normal(jax.random.fold_in(key, 1), (3, n))
    tm = jax.random.uniform(jax.random.fold_in(key, 2), (n,))

    cfg = TraceConfig(background=bundle.background)

    def loop(body):
        def f(o, d, tm, key):
            def step(i, acc):
                r = body(o, d, tm, jax.random.fold_in(key, i))
                return acc + jax.tree.leaves(r)[0].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, reps, step, jnp.float32(0.0))

        return jax.jit(f)

    bench(
        loop(lambda o, d, tm, k: closest_hit(scene, o, d, tm, 1e-3, jnp.inf, k)[0].t),
        o, d, tm, key, reps=reps, label="closest_hit",
    )
    hit, _shade = jax.jit(lambda o, d, tm, k: closest_hit(scene, o, d, tm, 1e-3, jnp.inf, k))(
        o, d, tm, key
    )
    bench(
        loop(lambda o, d, tm, k: scatter(_shade, hit, texture_value(scene.textures, _shade, hit, scene.stats.features), d, tm, k).attenuation),
        o, d, tm, key, reps=reps, label="scatter(+textures)",
    )
    bench(
        loop(lambda o, d, tm, k: emitted(_shade, hit, texture_value(scene.textures, _shade, hit, scene.stats.features))),
        o, d, tm, key, reps=reps, label="emitted",
    )
    if scene.n_lights:
        bench(
            loop(lambda o, d, tm, k: sample_lights(scene, hit.p, k)),
            o, d, tm, key, reps=reps, label="sample_lights",
        )
        bench(
            loop(lambda o, d, tm, k: lights_pdf(scene, hit.p, d, tm)),
            o, d, tm, key, reps=reps, label="lights_pdf",
        )

    alive = jnp.ones((n,), dtype=bool)
    thr = jnp.ones((3, n))
    bench(
        loop(lambda o, d, tm, k: _eval_vertex(scene, cfg, o, d, tm, thr, alive, k).radiance_add),
        o, d, tm, key, reps=reps, label="full _eval_vertex",
    )


if __name__ == "__main__":
    main()
