"""One long-lived TPU session running every pending measurement in order.

The axon tunnel charges a multi-minute device (re)acquisition per PROCESS,
so batching all device work into one process is the only way to get
wall-clock throughput.  Steps (each prints JSON lines as it completes):

  1. stage probe for final_scene (pallas on/off per tree)
  2. golden matrix over tools.golden.GOLDEN_MAP
  3. differentiable fit demo (tools.fit)
  4. verify render: cornell_box 100x100x32 -> /tmp/verify_cornell.png
  5. bench.py main() (warms the persistent cache for the driver)

Any step crashing is reported and the session continues.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def step(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            print(json.dumps({"step": name, "status": "start"}), flush=True)
            try:
                fn()
                status = "ok"
            except Exception:
                traceback.print_exc()
                status = "fail"
            print(
                json.dumps(
                    {"step": name, "status": status, "s": round(time.perf_counter() - t0, 1)}
                ),
                flush=True,
            )

        return run

    return deco


@step("stage_probe_final_scene")
def s1():
    from tools.vertex_probe import main as vp

    vp(["final_scene"])


@step("golden_matrix")
def s2():
    from tools.golden import main as gm

    gm(["--all", "--spp", "400", "--size", "220", "--save-dir", "/tmp/golden_r3"])


@step("fit_demo")
def s3():
    from tools.fit import main as fit

    fit(["--steps", "40", "--spp", "48", "--size", "48", "--out", "/tmp/fit_r3.json"])


@step("verify_render")
def s4():
    from raytracer2022_tpu.cli import main as cli

    cli(
        [
            "--scene",
            "cornell_box",
            "--width",
            "100",
            "--height",
            "100",
            "--spp",
            "64",
            "--out",
            "/tmp/verify_cornell.png",
        ]
    )


@step("bench")
def s5():
    import bench

    bench.main()


def main(argv=None) -> int:
    which = set(argv) if argv else None
    for name, fn in [
        ("stage_probe_final_scene", s1),
        ("golden_matrix", s2),
        ("fit_demo", s3),
        ("verify_render", s4),
        ("bench", s5),
    ]:
        if which is None or name in which:
            fn()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
