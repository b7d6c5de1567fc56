"""Per-stage cost breakdown of one bounce (_eval_vertex) on a scene.

The axon tunnel backend has ~30-45 ms fixed dispatch latency per jitted
call, so each stage is looped K times inside ONE jit (a lax.scan whose
carry feeds the next iteration) and the per-iteration cost is
(t_loop - t_overhead) / K with t_overhead measured on an empty scan.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

K = 16


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.device_get(jax.tree.map(lambda x: x.sum(), out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.map(lambda x: x.sum(), fn(*args)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def scan_loop(stage):
    """Run ``stage(o, d, key) -> (3, N)`` K times, feeding output to input."""

    def fn(o, d):
        def body(carry, i):
            o, d = carry
            out = stage(o, d, jax.random.fold_in(jax.random.PRNGKey(0), i))
            # perturb so no iteration is hoistable / DCE-able
            o = o + 1e-7 * out
            return (o, d), ()

        (o, _), _ = jax.lax.scan(body, (o, d), jnp.arange(K))
        return o

    return jax.jit(fn)


def main(argv=None) -> int:
    scene_name = argv[0] if argv else "wwscene"
    n = int(argv[1]) if len(argv) > 1 else 1 << 17

    from raytracer2022_tpu import make_camera
    from raytracer2022_tpu.ops.intersect import closest_hit, hit_details, traverse_clusters
    from raytracer2022_tpu.ops.lights import lights_pdf, sample_lights
    from raytracer2022_tpu.ops.materials import emitted, scatter, texture_value
    from raytracer2022_tpu.ops.sampling import cosine_about_normal
    from raytracer2022_tpu.render.camera import get_rays
    from raytracer2022_tpu.render.integrator import TraceConfig, _eval_vertex
    from raytracer2022_tpu.scene.library import SCENES

    bundle = SCENES[scene_name]()
    s = bundle.scene
    cam = make_camera(**bundle.camera_kwargs)
    key = jax.random.PRNGKey(0)
    tm = jnp.zeros((n,))

    u = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    v = jax.random.uniform(jax.random.fold_in(key, 2), (n,))
    o0, d0, _ = jax.jit(lambda u, v, k: get_rays(cam, u, v, k))(u, v, key)

    def one_bounce(o, d, k):
        hit, _ = closest_hit(s, o, d, tm, 1e-3, jnp.inf, k)
        d2 = cosine_about_normal(jax.random.fold_in(k, 3), hit.normal)
        return hit.p, d2

    o, d = jax.jit(one_bounce)(o0, d0, key)

    results = {"scene": scene_name, "n": n, "K": K}

    def run(name, stage):
        f = scan_loop(stage)
        t = bench(f, o, d)
        results[name + "_ms"] = round(t / K * 1e3, 2)

    run("noop", lambda o, d, k: d)
    # full closest_hit
    run("closest_hit", lambda o, d, k: closest_hit(s, o, d, tm, 1e-3, jnp.inf, k)[0].p)
    if s.clusters:
        run(
            "closest_hit_pallas",
            lambda o, d, k: closest_hit(
                s, o, d, tm, 1e-3, jnp.inf, k, use_pallas=True
            )[0].p,
        )
        from raytracer2022_tpu.ops.bvh8 import traverse_bvh8

        for i in range(len(s.clusters)):
            if s.bvh8[i] is None:
                continue
            run(
                f"bvh8_tree{i}_k{s.stats.trees[i][0]}",
                lambda o, d, k, i=i: jnp.broadcast_to(
                    traverse_bvh8(
                        s.bvh8[i], s.stats.trees[i][0], o, d, tm, 1e-3
                    )[0],
                    (3, n),
                ),
            )
    # traversal only (per tree)
    for i in range(len(s.clusters)):
        run(
            f"tree{i}_k{s.stats.trees[i][0]}",
            lambda o, d, k, i=i: jnp.broadcast_to(
                traverse_clusters(s, i, o, d, tm, 1e-3, jnp.inf)[0], (3, n)
            ),
        )

    # hit_details & shading stages: ROLL the winner arrays by a key-derived
    # shift each iteration so the fetches cannot be hoisted out of the scan
    # as loop-invariant (they were in the round-3 probe, reporting ~0 ms)
    hit, shade = jax.jit(lambda o, d: closest_hit(s, o, d, tm, 1e-3, jnp.inf, key))(o, d)

    def rolled(k):
        import jax as _jax

        shift = jax.random.randint(k, (), 0, n)
        h = _jax.tree.map(lambda a: jnp.roll(a, shift, axis=-1), hit)
        sh = _jax.tree.map(lambda a: jnp.roll(a, shift, axis=-1), shade)
        return h, sh

    def run_rolled(name, stage):
        run(name, lambda o, d, k: stage(o, d, k, *rolled(k)))

    run("roll_overhead", lambda o, d, k: rolled(k)[0].p)
    run_rolled(
        "hit_details",
        lambda o, d, k, h, sh: hit_details(s, o, d, tm, h.t, h.prim, h.hit)[0].p,
    )
    run_rolled(
        "texture",
        lambda o, d, k, h, sh: texture_value(s.textures, sh, h, s.stats.features),
    )
    run_rolled(
        "scatter_emit",
        lambda o, d, k, h, sh: scatter(sh, h, jnp.ones((3, n)), d, tm, k).spec_dir
        + emitted(sh, h, jnp.ones((3, n))),
    )
    if len(s.stats.light_ids):
        run_rolled(
            "lights",
            lambda o, d, k, h, sh: sample_lights(s, h.p, k)
            + lights_pdf(s, h.p, d, tm)[None],
        )
    cfg = TraceConfig(background=bundle.background)
    alive = jnp.ones((n,), dtype=bool)
    thr = jnp.ones((3, n))
    run("whole_vertex", lambda o, d, k: _eval_vertex(s, cfg, o, d, tm, thr, alive, k).o)
    run(
        "whole_vertex_pallas",
        lambda o, d, k: _eval_vertex(
            s, cfg, o, d, tm, thr, alive, k, use_pallas=True
        ).o,
    )

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
