"""Regen-scheduler occupancy probe: iterations, mean occupancy, E[path len].

The regeneration schedulers' wall clock is
``iterations x per-iteration cost``; this probe separates the two by
replaying the PER-PIXEL-pooled schedule (what ``trace_regen_diff`` runs —
useful for planning its static trip counts) with occupancy counters.  Its
ad-hoc ancestor exposed the round-4 finding that pixel-bound scheduling
ran at 12% occupancy on wwscene/final_scene (one hard pixel's 50-bounce
chains queued on its own lanes) — the measurement behind the production
GLOBAL sample pool.

Usage: python -m tools.sched_probe [scene ...] [--spp-par N] [--spp-seq N]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=None)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp-par", type=int, default=8)
    ap.add_argument("--spp-seq", type=int, default=8)
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.render.integrator import _eval_vertex, _pool_reserve
    from raytracer2022_tpu.render.renderer import _regen_gen_rays
    from raytracer2022_tpu.scene.library import SCENES

    for name in args.scenes or ["cornell_box", "wwscene"]:
        bundle = SCENES[name]()
        scene = bundle.scene
        cam = make_camera(**bundle.camera_kwargs)
        w = h = args.size
        sp, sq = args.spp_par, args.spp_seq
        cfg = RenderConfig(
            width=w, height=h, max_depth=args.depth, background=bundle.background
        ).trace_cfg()
        n = w * h * sp
        pix0 = jnp.arange(n, dtype=jnp.int32) % (w * h)
        gen = _regen_gen_rays(cam, w, h, n)
        key = jax.random.fold_in(jax.random.PRNGKey(0), 0x5EED)

        def run(key=key, scene=scene, cfg=cfg, gen=gen, pix0=pix0, n=n, sp=sp, sq=sq):
            o, d, tm = gen(jax.random.fold_in(key, 0), pix0)

            def cond(s):
                it, *_, alive, remaining, _, _, _ = s
                return (it < sq * cfg.max_depth + 1) & (
                    jnp.any(alive) | jnp.any(remaining > 0)
                )

            def body(s):
                it, o, d, tm, thr, alive, remaining, depth, occ, verts = s
                k_v, k_r = jax.random.split(jax.random.fold_in(key, it + 1))
                vx = _eval_vertex(
                    scene, cfg, o, d, tm, thr, alive, k_v,
                    use_pallas=True, recompute_t=False,
                )
                depth = depth + 1
                cont = vx.cont & (depth < cfg.max_depth)
                finished = alive & ~cont
                start, remaining = _pool_reserve(finished | ~alive, remaining, sp)
                o2, d2, tm2 = gen(k_r, pix0)
                regen = start[None]
                o = jnp.where(regen, o2, jnp.where(cont[None], vx.o, o))
                d = jnp.where(regen, d2, jnp.where(cont[None], vx.d, d))
                tm = jnp.where(start, tm2, jnp.where(cont, vx.tm, tm))
                thr = jnp.where(regen, 1.0, jnp.where(cont[None], vx.throughput, thr))
                depth = jnp.where(start, 0, depth)
                occ = occ + jnp.sum(alive)
                verts = verts + jnp.sum(finished)
                return (it + 1, o, d, tm, thr, cont | start, remaining, depth, occ, verts)

            s0 = (
                jnp.int32(0), o, d, tm, jnp.ones((3, n)),
                jnp.ones((n,), bool),
                jnp.full((n // sp,), sp * (sq - 1), jnp.int32),
                jnp.zeros((n,), jnp.int32), jnp.int32(0), jnp.int32(0),
            )
            out = jax.lax.while_loop(cond, body, s0)
            return out[0], out[8], out[9]

        it, occ, nsamp = map(int, jax.jit(run)())
        print(
            json.dumps(
                {
                    "scene": name,
                    "lanes": n,
                    "iters": it,
                    "mean_occupancy": round(occ / (it * n), 3),
                    "E_path_len": round(occ / max(nsamp, 1), 2),
                    "samples_done": nsamp,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
