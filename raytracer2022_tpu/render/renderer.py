"""High-level renderer: config, sample batching, jit cache.

Replaces the reference driver (raytracer/src/main.rs:28-231).  The
reference's parallelism — 8 OS threads over shuffled image rows — becomes a
single jitted wavefront over (pixels x samples), optionally batched over
samples on the host to bound device memory, and sharded across chips by
:mod:`raytracer2022_tpu.parallel` (no shuffling needed: every chip gets an
identical-size (tile, spp) slab, which self-balances).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..scene.types import SceneData
from .camera import Camera, get_rays
from .film import tonemap_u8
from .integrator import TraceConfig, trace, trace_regen, trace_regen_diff


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Render settings (the reference hard-codes these, main.rs:33-51)."""

    width: int = 400
    height: int = 225
    spp: int = 100
    max_depth: int = 50
    background: Optional[tuple] = (0.0, 0.0, 0.0)  # None => sky gradient
    seed: int = 0
    t_min: float = 1e-3
    spawn_eps: float = 1e-4
    spp_per_batch: int = 0  # 0 = auto (bound rays/launch); -1 = single launch
    # auto-batching target (lanes per launch): 256k lanes keeps every
    # library scene's launch inside the axon tunnel's execution limits
    # (perlin-textured scenes crashed the worker at 512k-lane launches)
    max_rays_per_batch: int = 1 << 18
    regen: bool = True  # path-regeneration integrator for forward renders

    def trace_cfg(self) -> TraceConfig:
        return TraceConfig(
            max_depth=self.max_depth,
            background=self.background,
            t_min=self.t_min,
            spawn_eps=self.spawn_eps,
        )


def render_batch(
    scene: SceneData,
    camera: Camera,
    key,
    width: int,
    height: int,
    spp: int,
    cfg: TraceConfig,
) -> jnp.ndarray:
    """One device launch: (3, H, W) radiance SUM over ``spp`` samples.

    Pixel (x, y) uses u = (x + U)/(W-1), v = (y + U)/(H-1) exactly like the
    render loop (main.rs:144-148).
    """
    n = height * width * spp
    ys = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width * spp)
    xs = jnp.tile(jnp.repeat(jnp.arange(width, dtype=jnp.float32), spp), height)

    k_u, k_v, k_cam, k_trace = jax.random.split(key, 4)
    u = (xs + jax.random.uniform(k_u, (n,))) / (width - 1)
    v = (ys + jax.random.uniform(k_v, (n,))) / (height - 1)

    o, d, tm = get_rays(camera, u, v, k_cam)
    radiance = trace(scene, o, d, tm, k_trace, cfg)  # (3, N)
    return jnp.sum(radiance.reshape(3, height, width, spp), axis=3)


def render_batch_regen(
    scene: SceneData,
    camera: Camera,
    key,
    width: int,
    height: int,
    spp_par: int,  # lanes per pixel
    spp_seq: int,  # samples each lane completes sequentially
    cfg: TraceConfig,
    pool=None,  # force the global sample pool on/off (None: heuristic)
    row0=0,  # first image row of this launch's tile (dynamic scalar)
    rows: Optional[int] = None,  # tile height (static; None = full frame)
) -> jnp.ndarray:
    """One device launch via path regeneration -> (3, rows, W) radiance SUM
    over ``spp_par * spp_seq`` samples.  See integrator.trace_regen.

    ``row0``/``rows`` select a horizontal image STRIP: large frames tile
    into strips so each launch stays under the lane budget instead of
    tracing millions of 1-lane-per-pixel rays at once — the strip's lanes
    then afford DEEP sequential sampling, which amortizes the regen
    scheduler's fixed tail (full-res wwscene measured 3.1 -> ~5 Mpaths/s).
    """
    rows = height if rows is None else rows
    n = rows * width * spp_par
    # lane l starts on strip pixel l % n_pix (pixel-STRIDED, see
    # _pool_reserve's layout note); the scheduler works in STRIP-LOCAL
    # pixel ids (its pool/segment bookkeeping needs 0..n_pix), and the ray
    # generator adds the strip's global row offset
    pix0 = jnp.arange(n, dtype=jnp.int32) % (rows * width)
    k_trace = jax.random.fold_in(key, 0x5EED)
    gen_rays = _regen_gen_rays(camera, width, height, n, pix_offset=row0 * width)
    radiance = trace_regen(
        scene, gen_rays, pix0, spp_seq, k_trace, cfg, spp_par=spp_par, pool=pool
    )  # (3, N)
    return jnp.sum(radiance.reshape(3, spp_par, rows, width), axis=1)


def _regen_gen_rays(camera: Camera, width: int, height: int, n: int, pix_offset: int = 0):
    """Lane-current-pixel ray generator shared by the regen integrators.

    Shape-polymorphic in ``pix`` (the narrow drain phases regenerate
    compacted N/4 wavefronts); ``n`` is kept for API compatibility.
    ``pix_offset`` maps a tile's strip-local pixel ids to global image
    pixels (the schedulers' pool/segment bookkeeping is strip-local)."""
    del n

    def gen_rays(sample_key, pix):
        k_u, k_v, k_cam = jax.random.split(sample_key, 3)
        gpix = pix + pix_offset
        xs = (gpix % width).astype(jnp.float32)
        ys = (gpix // width).astype(jnp.float32)
        u = (xs + jax.random.uniform(k_u, pix.shape)) / (width - 1)
        v = (ys + jax.random.uniform(k_v, pix.shape)) / (height - 1)
        return get_rays(camera, u, v, k_cam)

    return gen_rays


def render_batch_regen_diff(
    scene: SceneData,
    camera: Camera,
    key,
    width: int,
    height: int,
    spp_par: int,  # lanes per pixel
    spp_seq: int,  # samples each lane completes sequentially
    n_iters: int,  # static regen-scan trip count (see trace_regen_diff)
    cfg: TraceConfig,
    n_drain: int = 0,  # narrow-drain trip count (see trace_regen_diff)
):
    """Differentiable regen render -> ``((3, H, W) radiance sum over
    COMPLETED samples, (H, W) i32 completed-sample counts)``.

    The per-pixel mean image is ``sum / counts`` (counts ==
    ``spp_par * spp_seq`` everywhere when ``n_iters >= spp_seq * max_depth``
    or when the truncation tail is negligible).  Fully reverse-
    differentiable w.r.t. scene tables and camera; counts are integer
    (no tangent) so normalization needs no stop_gradient.
    """
    n = height * width * spp_par
    pix0 = jnp.arange(n, dtype=jnp.int32) % (height * width)
    k_trace = jax.random.fold_in(key, 0x5EED)
    gen_rays = _regen_gen_rays(camera, width, height, n)
    radiance, done = trace_regen_diff(
        scene, gen_rays, pix0, spp_seq, n_iters, k_trace, cfg, spp_par=spp_par,
        drain_iters=n_drain,
    )
    img = jnp.sum(radiance.reshape(3, spp_par, height, width), axis=1)
    counts = jnp.sum(done.reshape(spp_par, height, width), axis=0)
    return img, counts


def regen_iters_estimate(
    scene: SceneData,
    camera: Camera,
    width: int,
    height: int,
    spp_par: int,
    spp_seq: int,
    cfg: TraceConfig,
    key=None,
    margin: float = 1.3,
    slack: int = 8,
    split_drain: bool = False,
):
    """Measure the regen iteration count one forward run actually needed and
    return ``ceil(measured * margin) + slack`` (clamped to the exact bound
    ``spp_seq * max_depth + 1``).  One cheap forward launch; use the result
    as the static ``n_iters`` of :func:`render_batch_regen_diff` so the
    differentiable scan pays only the iterations the workload needs.

    ``split_drain=True`` returns ``(n_iters, n_drain)`` for the two-phase
    differentiable integrator: the pooled phase budgets the measured
    HANDOFF point of the pixel-pooled schedule itself (pool empty and
    survivors <= N/4, via :func:`integrator.measure_regen_handoff` — the
    global-pool measurement below drains faster and would overshoot), and
    the stragglers finish in the narrow drain cascade of up to
    ``max_depth`` steps — the full-width equivalents drop by ~0.75 *
    max_depth per launch (cornell (2,32): 162 -> ~105)."""
    from .integrator import measure_regen_handoff

    key = jax.random.PRNGKey(0) if key is None else key
    n = height * width * spp_par
    pix0 = jnp.arange(n, dtype=jnp.int32) % (height * width)
    gen_rays = _regen_gen_rays(camera, width, height, n)
    bound = spp_seq * cfg.max_depth + 1
    if split_drain:
        iters = measure_regen_handoff(
            scene,
            gen_rays,
            pix0,
            spp_seq,
            jax.random.fold_in(key, 0x5EED),
            cfg,
            spp_par=spp_par,
        )
        # tighter margin than the single-phase form: the drain cascade is
        # the safety net for schedule variance across keys, and per-chip
        # trip counts concentrate tightly at production lane counts
        # (tools/scaling.py: identical trips across seed folds), so the
        # pooled phase only needs a small jitter allowance
        main = min(int(int(iters) * 1.03) + 3, bound)
        return main, cfg.max_depth
    _, iters = trace_regen(
        scene,
        gen_rays,
        pix0,
        spp_seq,
        jax.random.fold_in(key, 0x5EED),
        cfg,
        return_iters=True,
        spp_par=spp_par,
    )
    # single-phase form: trace_regen's iteration count excludes its narrow
    # drain phase; the one-scan differentiable integrator runs that drain
    # at full width, so budget a full max_depth for the longest survivors
    return min(int(int(iters) * margin) + slack + cfg.max_depth, bound)


_render_batch_jit = jax.jit(
    render_batch, static_argnames=("width", "height", "spp", "cfg")
)

_render_batch_regen_jit = jax.jit(
    render_batch_regen,
    # row0 is a DYNAMIC scalar (it only offsets pixel ids) — making it
    # static would recompile per strip: 15 strips x ~60 s wwscene compiles
    static_argnames=(
        "width", "height", "spp_par", "spp_seq", "cfg", "pool", "rows",
    ),
)


def render_sum_n(
    scene: SceneData,
    camera: Camera,
    cfg: RenderConfig,
    progress=None,
    checkpoint: Optional[str] = None,
):
    """Full render -> ((3, H, W) radiance sum, n_samples).

    Samples are taken in UNIFORM batches (one compile for all launches);
    cfg.spp is rounded UP to a batch multiple, and the actual sample count
    is returned for normalization.

    ``progress``: optional callback ``(done_spp, total_spp)`` invoked after
    each completed device launch — the reference's per-thread ``indicatif``
    bars (main.rs:122-127, 135, 155) become per-launch render progress.
    When set, long renders are split into several launches so the callback
    fires at a useful cadence (all launches share one compilation).

    ``checkpoint``: optional .npz path making the render RESTART-SAFE (the
    reference's render is all-or-nothing, SURVEY.md §5): the running
    radiance sum is saved after every device launch and a rerun with the
    same configuration resumes from the last completed launch (launches
    are deterministic in their index, so the resumed image is identical).
    A mismatched configuration in an existing file restarts from scratch.
    Regen path only.
    """
    key = jax.random.PRNGKey(cfg.seed)
    tcfg = cfg.trace_cfg()
    if cfg.spp_per_batch > 0:
        batch = min(cfg.spp_per_batch, cfg.spp)
    elif cfg.spp_per_batch < 0:
        batch = cfg.spp
    else:
        # auto: keep each device launch under max_rays_per_batch rays so
        # launches stay short and transient memory bounded
        batch = min(cfg.spp, max(1, cfg.max_rays_per_batch // (cfg.width * cfg.height)))

    if cfg.regen:
        # `batch` parallel lanes per pixel, each tracing spp_seq samples
        # sequentially with regeneration.  Regeneration only pays when each
        # lane runs several samples, so cap the parallel split to keep
        # spp_seq >= 8 (when spp allows).
        if cfg.spp_per_batch == 0:
            batch = max(1, min(batch, cfg.spp // 8))
        spp_seq = -(-cfg.spp // batch)
        # Bound the work of ONE device launch: the axon tunnel kills
        # executions running longer than ~60 s ("TPU worker crashed"), and
        # sub-launches cost only ~40 ms dispatch each.  Every launch pays
        # the regen scheduler's ~max_depth low-occupancy tail once, so
        # bigger sequential chunks amortize it — 32 keeps every library
        # scene several-fold under the watchdog at the default lane cap.
        # RT2022_MAX_SPP_SEQ tunes it: lower for very slow scene/size
        # combinations, higher on real TPU deployments with no watchdog.
        import os as _os

        chunk = min(spp_seq, int(_os.environ.get("RT2022_MAX_SPP_SEQ", "32")))
        if progress is not None:
            chunk = max(1, min(chunk, spp_seq // 8 or 1))
        n_launches = -(-spp_seq // chunk)
        # Image TILING (r5): large frames split into row strips so every
        # launch stays under max_rays_per_batch lanes — a 2560x1440 frame
        # previously launched one 3.7M-lane wavefront (14x the budget) and
        # was forced into shallow sequential chunks by the watchdog; strip
        # launches are small enough to run the full chunk depth, which
        # amortizes the per-launch regen tail.
        rows_per = max(
            1, min(cfg.height, cfg.max_rays_per_batch // max(1, cfg.width * batch))
        )
        n_strips = -(-cfg.height // rows_per)
        total = jnp.zeros((3, cfg.height, cfg.width))
        launch = 0
        resume_from = 0
        meta = None
        if checkpoint is not None:
            import numpy as _np
            import os as _os2

            # scene/camera fingerprint: resuming against a different scene
            # with the same dimensions must restart, not blend images
            fp = float(jnp.sum(scene.params)) + 1e-3 * scene.n_prims
            fp += float(jnp.sum(jnp.asarray(camera.origin)))
            meta = _np.array(
                [cfg.width, cfg.height, cfg.spp, batch, chunk, rows_per, cfg.seed, fp]
            )
            if _os2.path.exists(checkpoint):
                st = _np.load(checkpoint)
                if "meta" in st and _np.array_equal(st["meta"], meta):
                    total = jnp.asarray(st["total"])
                    resume_from = int(st["launch"])
        for s in range(n_strips):
            r0 = s * rows_per
            rs = min(rows_per, cfg.height - r0)
            for i in range(n_launches):
                if launch < resume_from:
                    launch += 1
                    continue
                part = _render_batch_regen_jit(
                    scene,
                    camera,
                    jax.random.fold_in(key, launch),
                    width=cfg.width,
                    height=cfg.height,
                    spp_par=batch,
                    spp_seq=chunk,
                    cfg=tcfg,
                    row0=r0,
                    rows=rs,
                )
                total = total.at[:, r0 : r0 + rs, :].add(part)
                launch += 1
                if checkpoint is not None:
                    import os as _os3

                    import numpy as _np

                    # atomic write: a crash mid-save must not corrupt the
                    # resume state (np.load of a torn file raises); savez
                    # keeps names that already end in .npz
                    tmp = checkpoint + ".tmp.npz"
                    _np.savez(tmp, total=_np.asarray(total), launch=launch, meta=meta)
                    _os3.replace(tmp, checkpoint)
                if progress is not None:
                    total.block_until_ready()
                    # spp-equivalent progress (launches complete strips)
                    total_spp = n_launches * chunk * batch
                    progress(
                        launch * total_spp // (n_strips * n_launches), total_spp
                    )
        return total, n_launches * chunk * batch

    n_batches = -(-cfg.spp // batch)
    total = jnp.zeros((3, cfg.height, cfg.width))
    for i in range(n_batches):
        total = total + _render_batch_jit(
            scene,
            camera,
            jax.random.fold_in(key, i),
            width=cfg.width,
            height=cfg.height,
            spp=batch,
            cfg=tcfg,
        )
        if progress is not None:
            total.block_until_ready()
            progress((i + 1) * batch, n_batches * batch)
    return total, n_batches * batch


def render_sum(
    scene: SceneData, camera: Camera, cfg: RenderConfig, progress=None, checkpoint=None
) -> jnp.ndarray:
    """Full render -> (3, H, W) radiance MEAN-scaled sum over cfg.spp.

    Kept for API compatibility: the returned array divided by cfg.spp is the
    image mean (internally the sampler may take a few extra samples to keep
    batches uniform; the sum is rescaled accordingly).
    """
    total, n = render_sum_n(scene, camera, cfg, progress=progress, checkpoint=checkpoint)
    if n != cfg.spp:
        total = total * (cfg.spp / n)
    return total


def render(
    scene: SceneData, camera: Camera, cfg: RenderConfig, progress=None, checkpoint=None
):
    """Full render -> u8[H, W, 3] tone-mapped image."""
    total, n = render_sum_n(scene, camera, cfg, progress=progress, checkpoint=checkpoint)
    return tonemap_u8(total, n)
