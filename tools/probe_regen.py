"""Probe the regen integrator's schedule: iterations, alive occupancy, tail.

Replicates trace_regen's loop with counters to show where iterations go:
useful (many lanes working) vs tail (a few slow lanes blocking the quota).

Usage: python -m tools.probe_regen [scene ...] [--spp 64] [--size 128x128]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=None)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--size", default="128x128")
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.camera import get_rays  # noqa: F401  (import check)

    h, w = (int(x) for x in args.size.split("x"))
    scenes = args.scenes or ["cornell_box", "final_scene"]

    from raytracer2022_tpu.render.camera import get_rays
    from raytracer2022_tpu.render.integrator import _eval_vertex
    from raytracer2022_tpu.scene.library import SCENES

    for name in scenes:
        bundle = SCENES[name]()
        cam = make_camera(**bundle.camera_kwargs)
        cfg = RenderConfig(width=w, height=h, spp=args.spp, max_depth=args.depth,
                           background=bundle.background)
        tcfg = cfg.trace_cfg()
        scene = bundle.scene
        spp_par = max(1, min(args.spp // 8, (1 << 19) // (w * h)))
        spp_seq = -(-args.spp // spp_par)
        n = w * h * spp_par

        ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w * spp_par)
        xs = jnp.tile(jnp.repeat(jnp.arange(w, dtype=jnp.float32), spp_par), h)
        key = jax.random.PRNGKey(0)

        def gen_rays(sample_key):
            k_u, k_v, k_cam = jax.random.split(sample_key, 3)
            u = (xs + jax.random.uniform(k_u, (n,))) / (w - 1)
            v = (ys + jax.random.uniform(k_v, (n,))) / (h - 1)
            return get_rays(cam, u, v, k_cam)

        o0, d0, tm0 = gen_rays(jax.random.fold_in(key, 0))
        max_iter = spp_seq * tcfg.max_depth + 1

        def cond(state):
            it, _, _, _, _, done, _, _ = state
            return (it < max_iter) & jnp.any(done < spp_seq)

        def body(state):
            it, o, d, tm, thr, done, depth, work_sum = state
            working = done < spp_seq
            step_key = jax.random.fold_in(key, it + 1)
            k_vertex, k_regen = jax.random.split(step_key)
            vx = _eval_vertex(scene, tcfg, o, d, tm, thr, working, k_vertex)
            depth = depth + 1
            cont = vx.cont & (depth < tcfg.max_depth)
            finished = working & ~cont
            done = done + finished.astype(done.dtype)
            o_new, d_new, tm_new = gen_rays(k_regen)
            regen = finished[None]
            o = jnp.where(regen, o_new, jnp.where(cont[None], vx.o, o))
            d = jnp.where(regen, d_new, jnp.where(cont[None], vx.d, d))
            tm = jnp.where(finished, tm_new, jnp.where(cont, vx.tm, tm))
            thr = jnp.where(regen, 1.0, jnp.where(cont[None], vx.throughput, thr))
            depth = jnp.where(finished, 0, depth)
            work_sum = work_sum + jnp.sum(working.astype(jnp.float32))
            return it + 1, o, d, tm, thr, done, depth, work_sum

        state = (jnp.int32(0), o0, d0, tm0, jnp.ones((3, n)),
                 jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
                 jnp.float32(0.0))
        st = jax.jit(lambda s: jax.lax.while_loop(cond, body, s))(state)
        it = int(st[0])
        work = float(st[7])
        total_bounces_needed = work  # lanes actually working, summed
        occupancy = work / (it * n)
        # useful lower bound: every lane must complete spp_seq samples
        print(
            f"{name}: lanes={n} spp_par={spp_par} spp_seq={spp_seq} "
            f"iterations={it} occupancy={occupancy:.3f} "
            f"avg_path_len={work / (n * spp_seq):.2f} "
            f"ideal_iters={work / n:.1f}"
        )


if __name__ == "__main__":
    main()
