"""Multi-host (fake-cluster) validation, SURVEY.md §4: N CPU processes on
localhost joined by jax.distributed must produce EXACTLY the radiance of a
single process with the same global device count (per-device RNG folds by
global axis index, so the estimator is device-layout invariant)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_fake_cluster(tmp_path):
    port = _free_port()
    out = tmp_path / "img.npy"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "tools.fake_cluster_worker",
                    "--coordinator",
                    f"localhost:{port}",
                    "--num-processes",
                    "2",
                    "--process-id",
                    str(pid),
                    "--devices-per-proc",
                    "2",
                    "--out",
                    str(out),
                ],
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    img2 = np.load(out)

    # single-process reference on an identical 4-device virtual mesh
    ref_out = tmp_path / "ref.npy"
    log = subprocess.run(
        [
            sys.executable,
            "-c",
            f"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from raytracer2022_tpu import RenderConfig, make_camera
from raytracer2022_tpu.parallel.mesh import make_device_mesh, render_sharded_sum
from raytracer2022_tpu.scene.library import cornell_box
bundle = cornell_box()
cam = make_camera(**bundle.camera_kwargs)
cfg = RenderConfig(width=16, height=16, spp=8, max_depth=4, background=bundle.background)
img = render_sharded_sum(bundle.scene, cam, cfg, make_device_mesh())
np.save(r"{ref_out}", np.asarray(jax.device_get(img)))
""",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert log.returncode == 0, log.stdout[-2000:] + log.stderr[-2000:]
    ref = np.load(ref_out)
    np.testing.assert_allclose(img2, ref, rtol=1e-5, atol=1e-5)
