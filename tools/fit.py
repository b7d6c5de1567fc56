"""Differentiable-fit demo (BASELINE.json config 5): recover perturbed
material albedos and light emission on the Cornell box from a rendered
target image by gradient descent through the full path tracer.

Usage: python -m tools.fit [--steps 60] [--spp 64] [--size 64] [--out fit.json]

Prints one JSON line: initial/final loss, per-parameter recovery error
before/after, and the loss trajectory.  Exit code 0 iff the fit recovered
the perturbed parameters (relative error < 20%).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.06)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--regen",
        action="store_true",
        help="fit through the differentiable REGENERATION integrator "
        "(production fwd+bwd path, ~20x the full-width scan)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/rt2022_xla")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.scene.library import cornell_box

    bundle = cornell_box()
    scene = bundle.scene
    cam = make_camera(**bundle.camera_kwargs)
    cfg = RenderConfig(
        width=args.size,
        height=args.size,
        spp=args.spp,
        max_depth=args.depth,
        background=bundle.background,
    )

    # target = render of the TRUE scene
    from raytracer2022_tpu.render.renderer import render_batch

    key = jax.random.PRNGKey(7)
    target = (
        render_batch(scene, cam, key, args.size, args.size, args.spp, cfg.trace_cfg())
        / args.spp
    )
    jax.block_until_ready(target)

    # perturb: dim the red wall, brighten the green wall, dim the light
    # (texture table order = creation order: 0 light emission tex, then
    # red/white/green solids)
    c0 = np.asarray(scene.textures.color).copy()
    true_c = c0.copy()
    kinds = np.asarray(scene.materials.kind)
    mats_tex = np.asarray(scene.materials.tex)
    light_tex = int(mats_tex[np.argmax(kinds == 3)])
    lamb_texs = [int(t) for t, k in zip(mats_tex, kinds) if k == 0]
    c0[:, light_tex] *= 0.5
    for t in lamb_texs:
        c0[:, t] = np.clip(c0[:, t] * 1.6 + 0.08, 0.02, 0.95)

    # Adam on the texture color table: emission (O(60)) and albedos (O(0.7))
    # differ by two orders of magnitude, which plain SGD cannot step jointly
    import optax

    from raytracer2022_tpu.render.renderer import render_batch as _rb

    tcfg = cfg.trace_cfg()

    if args.regen:
        from raytracer2022_tpu.render.renderer import (
            regen_iters_estimate,
            render_batch_regen_diff,
        )

        spp_par = max(1, args.spp // 8)
        spp_seq = -(-args.spp // spp_par)
        n_iters, n_drain = regen_iters_estimate(
            scene, cam, args.size, args.size, spp_par, spp_seq, tcfg,
            split_drain=True,
        )

        def loss_fn(color, k):
            s = scene.replace(textures=scene.textures.replace(color=color))
            img, cnt = render_batch_regen_diff(
                s, cam, k, args.size, args.size, spp_par, spp_seq, n_iters,
                tcfg, n_drain=n_drain,
            )
            return jnp.mean((img / jnp.maximum(cnt, 1)[None] - target) ** 2)

    else:

        def loss_fn(color, k):
            s = scene.replace(textures=scene.textures.replace(color=color))
            img = _rb(s, cam, k, args.size, args.size, args.spp, tcfg) / args.spp
            return jnp.mean((img - target) ** 2)

    # log-space parameterization: a x2 emission error and a x1.6 albedo
    # error become comparable ~0.5-0.7 steps, so one Adam lr fits both
    opt = optax.adam(args.lr)
    params = jnp.log(jnp.asarray(c0) + 1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        loss, g = jax.value_and_grad(lambda p, k: loss_fn(jnp.exp(p), k))(params, k)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
        losses.append(float(loss))

    cf = np.asarray(jnp.exp(params))
    track = [light_tex] + lamb_texs

    def err(c):
        return float(
            np.mean(
                np.abs(c[:, track] - true_c[:, track])
                / np.maximum(np.abs(true_c[:, track]), 1e-3)
            )
        )

    report = {
        "loss_initial": losses[0],
        "loss_final": losses[-1],
        "param_relerr_initial": err(c0),
        "param_relerr_final": err(cf),
        "recovered": err(cf) < 0.2,
        "losses": [round(x, 6) for x in losses],
    }
    print(json.dumps(report), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f)
    return 0 if report["recovered"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
