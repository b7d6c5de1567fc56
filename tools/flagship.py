"""Measure the reference's FULL flagship workload end-to-end.

The reference renders wwscene at 2560x1440 x 2000 spp x depth 50 to
output/output.jpg (reference: raytracer/src/main.rs:33-41, 89).  This tool
runs that exact workload on one TPU chip, RESTART-SAFE: samples accumulate
in outer chunks whose running radiance sum is checkpointed to disk after
every chunk, so a tunnel drop loses at most one chunk (the axon tunnel
kills device executions >60 s and occasionally drops whole sessions).

Prints one JSON line: wall time, Mpaths/s, and MAE vs the reference's own
committed render (the frozen-code golden) on the standard 64-px grid.

    python -m tools.flagship [--spp 2000] [--chunk 128] [--state /tmp/f.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=2000)
    ap.add_argument("--chunk", type=int, default=125)
    ap.add_argument("--width", type=int, default=2560)
    ap.add_argument("--height", type=int, default=1440)
    ap.add_argument("--state", default="/tmp/flagship_state.npz")
    ap.add_argument("--out", default="/tmp/flagship.png")
    ap.add_argument(
        "--golden", default="/root/reference/output/output.jpg",
        help="reference render to compare against ('' to skip)",
    )
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass

    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.render.renderer import render_sum_n
    from raytracer2022_tpu.scene.library import SCENES

    bundle = SCENES["wwscene"]()
    cam = make_camera(**bundle.camera_kwargs)

    total = np.zeros((3, args.height, args.width), np.float64)
    done_spp = 0
    elapsed = 0.0
    if os.path.exists(args.state):
        st = np.load(args.state)
        total = st["total"]
        done_spp = int(st["done_spp"])
        elapsed = float(st["elapsed"])
        print(f"# resuming: {done_spp}/{args.spp} spp, {elapsed:.0f}s so far")

    n_chunks = -(-args.spp // args.chunk)
    for ci in range(n_chunks):
        lo = ci * args.chunk
        if lo + args.chunk <= done_spp:
            continue
        spp_c = min(args.chunk, args.spp - lo)
        cfg = RenderConfig(
            width=args.width, height=args.height, spp=spp_c, max_depth=50,
            background=bundle.background, seed=1000 + ci,
        )
        t0 = time.perf_counter()
        part, n = render_sum_n(bundle.scene, cam, cfg)
        part = np.asarray(part, np.float64) * (spp_c / n)
        dt = time.perf_counter() - t0
        elapsed += dt
        total = total + part
        done_spp = lo + spp_c
        tmp = args.state + ".tmp.npz"  # savez keeps names ending in .npz
        np.savez(tmp, total=total, done_spp=done_spp, elapsed=elapsed)
        os.replace(tmp, args.state)
        rate = args.width * args.height * spp_c / dt / 1e6
        print(
            f"# chunk {ci + 1}/{n_chunks}: {spp_c} spp in {dt:.1f}s "
            f"({rate:.2f} Mpaths/s), total {done_spp}/{args.spp}",
            flush=True,
        )

    from raytracer2022_tpu.render.film import tonemap_u8

    img = np.asarray(tonemap_u8(np.asarray(total, np.float32), done_spp))
    try:
        from PIL import Image

        Image.fromarray(img).save(args.out)
    except Exception as e:  # pragma: no cover
        print(f"# image save failed: {e}")

    out = {
        "workload": f"wwscene {args.width}x{args.height} x {done_spp} spp x depth 50",
        "wall_s": round(elapsed, 1),
        "paths": args.width * args.height * done_spp,
        "Mpaths_per_s": round(args.width * args.height * done_spp / elapsed / 1e6, 2),
    }
    if args.golden and os.path.exists(args.golden):
        from PIL import Image

        from tools.golden import compare

        golden = np.asarray(Image.open(args.golden), np.float32) / 255.0
        ours = img.astype(np.float32) / 255.0
        if golden.shape != ours.shape:
            out["note"] = f"golden shape {golden.shape} != ours {ours.shape}"
        out.update(compare(ours, golden))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
