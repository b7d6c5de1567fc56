"""Command-line renderer.

Supersedes the reference's hard-coded driver (raytracer/src/main.rs:28-231):
scene, resolution, spp, depth and output path are flags instead of
compile-time constants; the 5-stage styled logging is kept.

Example::

    python -m raytracer2022_tpu.cli --scene cornell_box --width 600 \
        --height 600 --spp 1000 --out output/cornell.png
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native path tracer")
    parser.add_argument("--scene", default="wwscene", help="scene name (see scene.library.SCENES)")
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=360)
    parser.add_argument("--spp", type=int, default=100)
    parser.add_argument("--max-depth", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--spp-per-batch", type=int, default=0)
    parser.add_argument("--out", default="output/output.jpg")
    parser.add_argument("--sharded", action="store_true", help="shard spp over all devices")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--trace-dir", default=None, help="write a jax.profiler trace here")
    parser.add_argument(
        "--checkpoint", default=None,
        help="npz path: save the running radiance sum after every launch "
        "and resume an interrupted render with the same configuration "
        "(the reference render is all-or-nothing)",
    )
    # multi-host (pod-slice) execution: one process per host
    parser.add_argument("--coordinator", default=None, help="host:port of process 0 (multi-host)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)

    from raytracer2022_tpu import RenderConfig, make_camera, save_image, tonemap_u8
    from raytracer2022_tpu.render.renderer import render_sum
    from raytracer2022_tpu.scene.library import SCENES
    from raytracer2022_tpu.utils.logging import StageLogger
    from raytracer2022_tpu.utils.profiling import xla_trace

    log = StageLogger(quiet=args.quiet)
    log.stage(1)
    log.config_echo(
        image_size=f"{args.width}x{args.height}",
        sample_per_pixel=args.spp,
        max_depth=args.max_depth,
        scene=args.scene,
    )

    if args.scene not in SCENES:
        parser.error(f"unknown scene {args.scene!r}; choose from {sorted(SCENES)}")
    bundle = SCENES[args.scene](seed=args.seed)
    cam_kwargs = dict(bundle.camera_kwargs)
    cam_kwargs["aspect_ratio"] = args.width / args.height
    camera = make_camera(**cam_kwargs)
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        spp=args.spp,
        max_depth=args.max_depth,
        background=bundle.background,
        seed=args.seed,
        spp_per_batch=args.spp_per_batch,
    )

    import jax

    if args.coordinator:
        from raytracer2022_tpu.parallel.distributed import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)

    try:  # persistent compile cache: repeated CLI renders skip XLA compiles
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    try:  # hardware PRNG: ~10% faster MC sampling than threefry on TPU
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
    n_dev = len(jax.devices())
    log.stage(2, f"{n_dev} device(s)")
    t0 = time.perf_counter()
    with xla_trace(args.trace_dir):
        n_samples = cfg.spp
        if args.sharded and n_dev > 1:
            from raytracer2022_tpu.parallel.mesh import (
                make_device_mesh,
                render_sharded_regen_sum,
            )

            mesh = make_device_mesh()
            # production multi-chip path: pooled-regen integrator per chip
            total, n_samples = render_sharded_regen_sum(
                bundle.scene, camera, cfg, mesh
            )
        else:
            total = render_sum(
                bundle.scene, camera, cfg, progress=log.progress,
                checkpoint=args.checkpoint,
            )
        total.block_until_ready()
    dt = time.perf_counter() - t0

    log.stage(3, f"{args.width * args.height * n_samples / dt / 1e6:.2f} Mpaths/s")
    log.stage(4)
    img = tonemap_u8(total, n_samples)

    log.stage(5)
    if jax.process_index() == 0:  # one writer under multi-host
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        save_image(args.out, img)
        if not args.quiet:
            print(f'Output image as "{args.out}"')
    log.done()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
