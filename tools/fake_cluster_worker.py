"""Fake-cluster worker: one process of an N-process CPU 'pod'.

Launched by tests/test_distributed.py (and usable by hand) to validate the
multi-host path without TPUs: each process contributes
``--devices-per-proc`` virtual CPU devices, joins via jax.distributed, and
renders a sharded Cornell box over the GLOBAL mesh.  Process 0 writes the
radiance sum to ``--out`` (.npy) for comparison against a single-process
render of the identical global mesh size.

Usage:
  python -m tools.fake_cluster_worker --coordinator localhost:PORT \
      --num-processes 2 --process-id K --devices-per-proc 2 --out /tmp/x.npy
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--out", default="")
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--height", type=int, default=16)
    ap.add_argument("--spp-per-device", type=int, default=2)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={args.devices_per_proc}"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from raytracer2022_tpu.parallel.distributed import init_distributed, is_primary

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.devices_per_proc, (
        n_global,
        args.num_processes,
        args.devices_per_proc,
    )

    import numpy as np

    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.parallel.mesh import make_device_mesh, render_sharded_sum
    from raytracer2022_tpu.scene.library import cornell_box

    bundle = cornell_box()
    cam = make_camera(**bundle.camera_kwargs)
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        spp=args.spp_per_device * n_global,
        max_depth=args.depth,
        background=bundle.background,
    )
    mesh = make_device_mesh()
    img = render_sharded_sum(bundle.scene, cam, cfg, mesh)
    img = np.asarray(jax.device_get(img))
    if is_primary() and args.out:
        np.save(args.out, img)
    print(f"proc {args.process_id}: ok, {n_global} global devices", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
