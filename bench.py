"""Benchmark: Cornell-box path-tracing throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"fwd_bwd_paths_per_s": N}.

Headline = FORWARD primary paths/s with the production (path-regeneration)
renderer — the reference's own benchmark is a forward render (its final
workload: 2560x1440 x 2000 spp x depth<=50 on 8 CPU threads, main.rs:33-41;
no numbers published, BASELINE.md).  vs_baseline divides by a generous
estimate of the reference's CPU throughput: 1 Mpaths/s on 8 threads (an
unoptimized RTiOW-style Rust tracer measures 50-200 kpaths/s/core on this
kind of scene).  The secondary field reports forward+backward paths/s
through the differentiable (scan) integrator — the capability the reference
does not have at all.

Timing note: the axon tunnel backend's block_until_ready can return before
execution finishes; a device_get is the only reliable fence.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

try:  # persistent compile cache across bench runs
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
try:  # hardware PRNG: ~10% faster MC sampling than threefry on TPU
    jax.config.update("jax_default_prng_impl", "rbg")
except Exception:
    pass

from raytracer2022_tpu import RenderConfig, make_camera
from raytracer2022_tpu.render.renderer import render_batch, render_batch_regen
from raytracer2022_tpu.scene.library import cornell_box

REF_CPU_PATHS_PER_S = 1e6  # generous estimate (no published numbers)


def _sync(out):
    return jax.device_get(jax.tree.map(jnp.sum, out))


def _median_time(fn, key, reps=5):
    _sync(fn(key))  # compile + warm
    times = []
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        _sync(fn(k))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    bundle = cornell_box()
    cam = make_camera(**bundle.camera_kwargs)
    W = H = 256
    DEPTH = 50
    cfg = RenderConfig(width=W, height=H, spp=64, max_depth=DEPTH, background=bundle.background)
    tcfg = cfg.trace_cfg()
    key = jax.random.PRNGKey(0)
    scene = bundle.scene

    # --- forward: production path-regeneration renderer, 128 spp
    SPP_PAR, SPP_SEQ = 2, 64
    fwd = jax.jit(
        lambda k: render_batch_regen(scene, cam, k, W, H, SPP_PAR, SPP_SEQ, tcfg)
    )
    t_fwd = _median_time(fwd, key)
    fwd_paths = W * H * SPP_PAR * SPP_SEQ / t_fwd

    # --- forward+backward: differentiable scan integrator, 64 spp
    SPP = 64

    def loss_fn(mat_param, tex_color, k):
        s = scene.replace(
            materials=scene.materials.replace(param=mat_param),
            textures=scene.textures.replace(color=tex_color),
        )
        return jnp.mean(render_batch(s, cam, k, W, H, SPP, tcfg))

    fwd_bwd = jax.jit(
        lambda k: jax.value_and_grad(loss_fn, argnums=(0, 1))(
            scene.materials.param, scene.textures.color, k
        )
    )
    t_fb = _median_time(fwd_bwd, key, reps=3)
    fb_paths = W * H * SPP / t_fb

    print(
        json.dumps(
            {
                "metric": "forward primary paths/s/chip, Cornell box depth-50",
                "value": round(fwd_paths, 1),
                "unit": "paths/s",
                "vs_baseline": round(fwd_paths / REF_CPU_PATHS_PER_S, 3),
                "fwd_bwd_paths_per_s": round(fb_paths, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
