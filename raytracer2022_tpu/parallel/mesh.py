"""Multi-chip rendering over a ``jax.sharding.Mesh``.

The reference's parallelism is 8 OS threads over shuffled image rows with a
one-shot mpsc gather (reference: raytracer/src/main.rs:93-183).  The
TPU-native equivalent (SURVEY.md §2 row 34): shard the *samples-per-pixel*
axis across chips with ``shard_map`` — every chip traces an identical-shape
(pixels x spp/n) wavefront (perfectly load-balanced by construction, no row
shuffling needed) — and ``psum`` the radiance sums over ICI.  Scene and
camera are replicated; the only collective is the final image reduction
(and gradient all-reduce in the fit step).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.camera import Camera
from ..render.integrator import TraceConfig
from ..render.renderer import (
    RenderConfig,
    render_batch,
    render_batch_regen,
    render_batch_regen_diff,
)
from ..scene.types import SceneData


def make_device_mesh(devices=None, axis_name: str = "chips") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)


@functools.lru_cache(maxsize=64)
def _sharded_render_fn(mesh: Mesh, axis_name: str, width, height, spp_local, tcfg):
    """Build-and-cache the jitted sharded render (keyed on mesh + shape) so
    repeated renders reuse one compilation."""

    def shard_fn(scene, camera, key):
        idx = jax.lax.axis_index(axis_name)
        local_key = jax.random.fold_in(key, idx)
        part = render_batch(scene, camera, local_key, width, height, spp_local, tcfg)
        return jax.lax.psum(part, axis_name)

    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def _sharded_regen_fn(
    mesh: Mesh, axis_name: str, width, height, spp_par, spp_seq, tcfg, rows=None
):
    """Build-and-cache the jitted sharded PRODUCTION render (regen
    integrator + Pallas fast path) keyed on mesh + shape.  ``rows`` tiles
    a row strip (row0 rides as a dynamic scalar, renderer tiling)."""

    def shard_fn(scene, camera, key, row0):
        idx = jax.lax.axis_index(axis_name)
        local_key = jax.random.fold_in(key, idx)
        part = render_batch_regen(
            scene, camera, local_key, width, height, spp_par, spp_seq, tcfg,
            row0=row0, rows=rows,
        )
        return jax.lax.psum(part, axis_name)

    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )


def render_sharded_regen_sum(
    scene: SceneData,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    axis_name: str = "chips",
):
    """PRODUCTION multi-chip render: the path-regeneration integrator (with
    the Pallas packet traversal) sharded over spp -> ``((3, H, W) radiance
    sum, n_samples)``.

    Every chip traces an identical-shape (pixels x spp/n) pooled-regen
    wavefront with a distinct fold of the seed; the partial sums ride ONE
    ``psum`` over ICI (the mpsc gather of main.rs:171-183).  ``cfg.spp``
    need not divide the chip count — it is rounded UP to ``n_chips *
    spp_par * spp_seq`` and the actual sample count returned for
    normalization (the reference's row-shuffle load balancing,
    main.rs:93-99, is unnecessary: every chip gets identical work by
    construction).
    """
    n_chips = mesh.devices.size
    spp_chip = -(-cfg.spp // n_chips)  # ceil: no divisibility requirement
    # mirror render_sum_n's regen split: parallel lanes x sequential samples
    if cfg.spp_per_batch > 0:
        spp_par = min(cfg.spp_per_batch, spp_chip)
    else:
        spp_par = max(
            1,
            min(
                cfg.max_rays_per_batch // (cfg.width * cfg.height),
                spp_chip // 8 or 1,
            ),
        )
    spp_seq = -(-spp_chip // spp_par)
    key = jax.random.PRNGKey(cfg.seed)
    rep = NamedSharding(mesh, P())
    scene, camera, key = jax.device_put((scene, camera, key), rep)
    # row-strip tiling (mirrors renderer.render_sum_n): large frames would
    # otherwise launch W*H*spp_par lanes PER CHIP in one shot
    rows_per = max(
        1, min(cfg.height, cfg.max_rays_per_batch // max(1, cfg.width * spp_par))
    )
    if rows_per >= cfg.height:
        fn = _sharded_regen_fn(
            mesh, axis_name, cfg.width, cfg.height, spp_par, spp_seq,
            cfg.trace_cfg(), rows=None,
        )
        return fn(scene, camera, key, jnp.int32(0)), n_chips * spp_par * spp_seq
    total = jnp.zeros((3, cfg.height, cfg.width))
    for s in range(-(-cfg.height // rows_per)):
        r0 = s * rows_per
        rs = min(rows_per, cfg.height - r0)
        fn = _sharded_regen_fn(
            mesh, axis_name, cfg.width, cfg.height, spp_par, spp_seq,
            cfg.trace_cfg(), rows=rs,
        )
        part = fn(scene, camera, jax.random.fold_in(key, s), jnp.int32(r0))
        total = total.at[:, r0 : r0 + rs, :].add(part)
    return total, n_chips * spp_par * spp_seq


def render_sharded_sum(
    scene: SceneData,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    axis_name: str = "chips",
) -> jnp.ndarray:
    """Full render with spp sharded over the mesh -> (3, H, W) radiance sum.

    Each chip renders spp/n samples with a distinct fold of the seed, then
    the partial sums are ``psum``-reduced (the mpsc gather of main.rs:171-183,
    as one ICI collective).
    """
    n_chips = mesh.devices.size
    assert cfg.spp % n_chips == 0, "spp must divide evenly over chips"
    spp_local = cfg.spp // n_chips
    fn = _sharded_render_fn(
        mesh, axis_name, cfg.width, cfg.height, spp_local, cfg.trace_cfg()
    )
    key = jax.random.PRNGKey(cfg.seed)
    # explicit replicated placement: required under multi-process
    # (jax.distributed) where the mesh spans non-addressable devices; every
    # process holds identical host values, which fully-replicated
    # device_put accepts
    rep = NamedSharding(mesh, P())
    scene, camera, key = jax.device_put((scene, camera, key), rep)
    return fn(scene, camera, key)


def fit_step_fn(
    cfg: RenderConfig,
    mesh: Optional[Mesh] = None,
    axis_name: str = "chips",
    lr: float = 0.05,
    regen_iters: Optional[int] = None,
):
    """Differentiable-fit train step factory (BASELINE north star config 5).

    Returns ``step(scene, camera, target, key) -> (scene', camera', loss)``:
    renders, takes MSE against a target image, backprops through the whole
    bounce loop to the material/texture tables and camera, all-reduces the
    gradients over the mesh (overlapped with backward by XLA), and applies
    SGD.  With ``mesh=None`` runs single-chip.

    ``regen_iters``: when given, the render inside the loss runs the
    differentiable REGENERATION integrator with this static trip count
    (see renderer.regen_iters_estimate) instead of the full-width scan —
    the production fwd+bwd path, typically ~10x faster at equal sample
    count.
    """
    tcfg = cfg.trace_cfg()

    def loss_fn(scene, camera, target, key, spp):
        if regen_iters is not None:
            spp_par = max(1, spp // 8)
            spp_seq = -(-spp // spp_par)
            img, cnt = render_batch_regen_diff(
                scene, camera, key, cfg.width, cfg.height,
                spp_par, spp_seq, regen_iters, tcfg,
            )
            img = img / jnp.maximum(cnt, 1)[None]
        else:
            img = render_batch(scene, camera, key, cfg.width, cfg.height, spp, tcfg)
            img = img / float(spp)
        return jnp.mean((img - target) ** 2)

    grad_leaves = ("materials", "textures_color")

    def split_params(scene: SceneData):
        params = {
            "mat_param": scene.materials.param,
            "tex_color": scene.textures.color,
        }
        return params

    def merge_params(scene: SceneData, params):
        return scene.replace(
            materials=scene.materials.replace(param=params["mat_param"]),
            textures=scene.textures.replace(color=params["tex_color"]),
        )

    if mesh is None:

        @jax.jit
        def step(scene, camera, target, key):
            def f(params, camera):
                return loss_fn(merge_params(scene, params), camera, target, key, cfg.spp)

            params = split_params(scene)
            loss, grads = jax.value_and_grad(f, argnums=(0, 1))(params, camera)
            gp, gc = grads
            params = jax.tree.map(lambda p, g: p - lr * g, params, gp)
            camera = jax.tree.map(lambda p, g: p - lr * g, camera, gc)
            return merge_params(scene, params), camera, loss

        return step

    n_chips = mesh.devices.size
    assert cfg.spp % n_chips == 0
    spp_local = cfg.spp // n_chips

    def shard_step(scene, camera, target, key):
        idx = jax.lax.axis_index(axis_name)
        local_key = jax.random.fold_in(key, idx)

        def f(params, camera):
            return loss_fn(
                merge_params(scene, params), camera, target, local_key, spp_local
            )

        params = split_params(scene)
        loss, grads = jax.value_and_grad(f, argnums=(0, 1))(params, camera)
        # data-parallel gradient all-reduce over ICI (mean over chips)
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.lax.pmean(grads, axis_name)
        gp, gc = grads
        params = jax.tree.map(lambda p, g: p - lr * g, params, gp)
        camera = jax.tree.map(lambda p, g: p - lr * g, camera, gc)
        return merge_params(scene, params), camera, loss

    return jax.jit(
        jax.shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
