"""Benchmark: forward+backward rays/s/chip on the Cornell box (BASELINE.md).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no numbers (BASELINE.md): vs_baseline is computed
against the reference workload definition — its final render is 2560x1440 x
2000 spp x depth<=50 on 8 CPU threads (main.rs:33-41).  We report absolute
forward+backward rays/s on one chip; vs_baseline is the ratio against a
conservative estimate of the reference's CPU throughput (5 Mrays/s on 8
threads — typical for this kind of unoptimized Rust RTiOW tracer).
"""

from __future__ import annotations

import json
import time

import os

import jax
import jax.numpy as jnp

try:  # persistent compile cache across bench runs
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from raytracer2022_tpu import RenderConfig, make_camera
from raytracer2022_tpu.render.renderer import render_batch
from raytracer2022_tpu.scene.library import cornell_box

REF_CPU_RAYS_PER_S = 5e6  # estimated reference throughput (no published numbers)


def main():
    bundle = cornell_box()
    cam = make_camera(**bundle.camera_kwargs)
    # bench shape: 256x256 pixels, spp batch sized to fill the chip
    W = H = 256
    SPP = 64
    DEPTH = 50
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH, background=bundle.background)
    tcfg = cfg.trace_cfg()

    @jax.jit
    def fwd(scene, camera, key):
        return render_batch(scene, camera, key, W, H, SPP, tcfg)

    @jax.jit
    def fwd_bwd(scene, camera, key):
        def loss(mat_param, tex_color):
            s = scene.replace(
                materials=scene.materials.replace(param=mat_param),
                textures=scene.textures.replace(color=tex_color),
            )
            img = render_batch(s, camera, key, W, H, SPP, tcfg)
            return jnp.mean(img)

        return jax.value_and_grad(loss, argnums=(0, 1))(
            scene.materials.param, scene.textures.color
        )

    key = jax.random.PRNGKey(0)

    # warmup / compile
    fwd_bwd(bundle.scene, cam, key)[0].block_until_ready()

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fwd_bwd(bundle.scene, cam, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    primary_rays = W * H * SPP
    rays_per_s = primary_rays / dt  # primary paths (fwd+bwd) per second

    print(
        json.dumps(
            {
                "metric": "fwd+bwd primary paths/s/chip, Cornell box depth-50",
                "value": round(rays_per_s, 1),
                "unit": "paths/s",
                "vs_baseline": round(rays_per_s / REF_CPU_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
