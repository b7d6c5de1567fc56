"""Measure forward regen throughput per scene x BVH8-kind policy on TPU.

Decides which primitive kinds get Pallas packet trees (vs the XLA cluster
walk) from measurement, not guesswork: run each bench config with the
candidate ``bvh8_kinds`` policies and report Mpaths/s.  Round-3 measured
rect trees LOSING 4x pre-winner-rows; round 4 re-measures with the
winner-row fetch path (ops/bvh8.py) and pooled scheduling in place.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/rt2022_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

from raytracer2022_tpu import RenderConfig, make_camera  # noqa: E402
from raytracer2022_tpu.render.renderer import _regen_gen_rays  # noqa: E402
from raytracer2022_tpu.render.integrator import trace_regen  # noqa: E402
from raytracer2022_tpu.scene.types import (  # noqa: E402
    MSPHERE,
    RECT,
    RING,
    SPHERE,
    TRIANGLE,
)

ALL_KINDS = (SPHERE, MSPHERE, RECT, TRIANGLE, RING)


def sync(x):
    return jax.device_get(jax.tree.map(jnp.sum, x))


def measure(bundle, w, h, sp, sq, reps=3):
    cam = make_camera(**bundle.camera_kwargs)
    cfg = RenderConfig(width=w, height=h, max_depth=50, background=bundle.background).trace_cfg()
    n = w * h * sp
    pix0 = jnp.arange(n, dtype=jnp.int32) % (w * h)
    gen = _regen_gen_rays(cam, w, h, n)
    f = jax.jit(
        lambda k: trace_regen(
            bundle.scene, gen, pix0, sq, k, cfg, return_iters=True, spp_par=sp
        )
    )
    r, it = f(jax.random.PRNGKey(0))
    sync(r)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        sync(f(jax.random.fold_in(jax.random.PRNGKey(0), i))[0])
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2]
    return w * h * sp * sq / t / 1e6, int(it), t


def main(argv):
    from raytracer2022_tpu.scene import library

    configs = {
        "cornell_box": (256, 256, 2, 64),
        "random_scene": (128, 128, 8, 8),
        "final_scene": (128, 128, 8, 8),
        "wwscene": (128, 128, 8, 8),
    }
    names = argv or list(configs)
    out = {}
    for name in names:
        w, h, sp, sq = configs[name]
        for label, kinds in [("tri", None), ("all", ALL_KINDS)]:
            builder_fn = getattr(library, name)
            # rebuild the scene with the candidate policy
            import unittest.mock as mock

            orig = library.SceneBuilder.finalize

            def patched(self, *a, **kw):
                if kinds is not None:
                    kw["bvh8_kinds"] = kinds
                # random_scene keeps everything dense via a high threshold;
                # drop it so trees actually get built under "all"
                if kinds is not None and name == "random_scene":
                    kw["bvh_threshold"] = 256
                return orig(self, *a, **kw)

            with mock.patch.object(library.SceneBuilder, "finalize", patched):
                bundle = builder_fn()
            mp, it, t = measure(bundle, w, h, sp, sq)
            out[f"{name}:{label}"] = {
                "Mpaths_s": round(mp, 2),
                "iters": it,
                "t": round(t, 3),
                "trees": [
                    (k, c, "bvh8" if bundle.scene.bvh8[i] is not None else "cluster")
                    for i, (k, c, *_rest) in enumerate(bundle.scene.stats.trees)
                ],
            }
            print(json.dumps({f"{name}:{label}": out[f"{name}:{label}"]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
