"""Where does compile time go?  Times lower vs backend-compile for the
renderer at varying depth/shape, printing one JSON line per config."""

from __future__ import annotations

import json
import sys
import time


def main(argv=None) -> int:
    import jax

    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.render.renderer import render_batch, render_batch_regen
    from raytracer2022_tpu.scene.library import SCENES

    scene_name = argv[0] if argv else "cornell_box"
    depths = [int(x) for x in (argv[1].split(",") if len(argv) > 1 else [4, 16, 50])]
    mode = argv[2] if len(argv) > 2 else "regen"

    # the axon backend's FIRST compile pays ~150s of tunnel/backend init;
    # warm it so the numbers below measure OUR program
    import jax.numpy as jnp

    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda a: a * 2)(jnp.ones((8, 128))))
    print(json.dumps({"backend_warmup_s": round(time.perf_counter() - t0, 1)}), flush=True)

    bundle = SCENES[scene_name]()
    cam = make_camera(**bundle.camera_kwargs)
    W = H = 64
    for depth in depths:
        cfg = RenderConfig(width=W, height=H, spp=8, max_depth=depth, background=bundle.background)
        tcfg = cfg.trace_cfg()
        if mode == "regen":
            fn = jax.jit(lambda k: render_batch_regen(bundle.scene, cam, k, W, H, 1, 8, tcfg))
        else:
            fn = jax.jit(lambda k: render_batch(bundle.scene, cam, k, W, H, 8, tcfg))
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        lowered = fn.lower(key)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(compiled(key))
        t_run = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "scene": scene_name,
                    "mode": mode,
                    "depth": depth,
                    "lower_s": round(t_lower, 2),
                    "compile_s": round(t_compile, 2),
                    "first_run_s": round(t_run, 3),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
