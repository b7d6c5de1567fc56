"""Per-scene throughput probe: compile time + steady-state Mpaths/s.

Usage: python -m tools.perf [scene ...] [--spp N] [--size HxW] [--depth N]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=None)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--size", default="128x128")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan", action="store_true", help="use the scan integrator")
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.render.renderer import render_batch, render_batch_regen
    from raytracer2022_tpu.scene.library import SCENES

    h, w = (int(x) for x in args.size.split("x"))
    scenes = args.scenes or ["cornell_box", "random_scene", "final_scene", "wwscene"]

    for name in scenes:
        t_build0 = time.perf_counter()
        bundle = SCENES[name]()
        t_build = time.perf_counter() - t_build0
        cam = make_camera(**bundle.camera_kwargs)
        cfg = RenderConfig(
            width=w, height=h, spp=args.spp, max_depth=args.depth,
            background=bundle.background,
        )
        tcfg = cfg.trace_cfg()
        if args.scan:
            fn = jax.jit(lambda s, c, k: render_batch(s, c, k, w, h, args.spp, tcfg))
        else:
            spp_par = max(1, min(args.spp // 8, (1 << 19) // (w * h)))
            spp_seq = -(-args.spp // spp_par)
            fn = jax.jit(
                lambda s, c, k: render_batch_regen(s, c, k, w, h, spp_par, spp_seq, tcfg)
            )
        key = jax.random.PRNGKey(0)

        def sync(r):
            # axon's block_until_ready can return early; device_get is the fence
            return float(r.sum())

        t0 = time.perf_counter()
        sync(fn(bundle.scene, cam, key))
        t_first = time.perf_counter() - t0
        times = []
        for i in range(max(args.reps, 3)):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            sync(fn(bundle.scene, cam, k))
            times.append(time.perf_counter() - t0)
        times.sort()
        t_run = times[len(times) // 2]  # median: first reps can be anomalous
        paths = w * h * args.spp
        print(
            json.dumps(
                {
                    "scene": name,
                    "prims": int(bundle.scene.n_prims),
                    "scene_build_s": round(t_build, 2),
                    "first_call_s": round(t_first, 2),
                    "steady_s": round(t_run, 4),
                    "Mpaths_per_s": round(paths / t_run / 1e6, 2),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
