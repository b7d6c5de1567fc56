"""Integrator semantics: energy conservation, emission, MIS consistency."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raytracer2022_tpu import RenderConfig, TraceConfig, make_camera, trace
from raytracer2022_tpu.render.renderer import render_batch, render_sum
from raytracer2022_tpu.scene.builder import SceneBuilder

KEY = jax.random.PRNGKey(11)


def _fire(scene, cfg, n=2048, origin=(0, 2, -6), target=(0, 0, 0), key=KEY):
    o = np.tile(np.asarray(origin, dtype=np.float32)[:, None], (1, n))
    t = np.asarray(target, dtype=np.float32)[:, None]
    d = (t - o).astype(np.float32)
    tm = np.zeros(n, dtype=np.float32)
    return trace(scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), key, cfg)


def test_miss_returns_background():
    b = SceneBuilder()
    b.sphere((100, 0, 0), 1, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.finalize()
    cfg = TraceConfig(max_depth=4, background=(0.25, 0.5, 0.75))
    rad = np.asarray(_fire(scene, cfg, n=8, target=(0, 100, 0)))
    np.testing.assert_allclose(rad, np.array([[0.25], [0.5], [0.75]]) * np.ones((3, 8)), rtol=1e-5)


def test_sky_gradient_background():
    b = SceneBuilder()
    b.sphere((1000, 0, 0), 1, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.finalize()
    cfg = TraceConfig(max_depth=2, background=None)
    # straight up: t=1 -> (0.5, 0.7, 1.0)
    rad = np.asarray(_fire(scene, cfg, n=4, origin=(0, 0, 0), target=(0, 10, 0)))
    np.testing.assert_allclose(rad[:, 0], [0.5, 0.7, 1.0], rtol=1e-4)


def test_light_emission_direct():
    b = SceneBuilder()
    light = b.rect_xz(-1, 1, -1, 1, 2.0, b.diffuse_light((5.0, 5.0, 5.0)))
    b.add_light(light)
    scene = b.finalize()
    cfg = TraceConfig(max_depth=4, background=(0.0, 0.0, 0.0))
    # looking DOWN at the light (its +y normal faces us: front) -> (5,5,5)
    rad = np.asarray(_fire(scene, cfg, n=8, origin=(0, 4, 0), target=(0, 0, 0)))
    np.testing.assert_allclose(rad, 5.0, rtol=1e-5)
    # from below it is a back face: black (the reason Cornell's light is
    # FlipFace-wrapped, scene.rs:171-173)
    rad = np.asarray(_fire(scene, cfg, n=8, origin=(0, 0, 0), target=(0, 4, 0)))
    np.testing.assert_allclose(rad, 0.0, atol=1e-7)


def test_furnace_closed_box_converges_to_emission():
    """A lambertian plate under a large emitter: radiance = E * albedo *
    (fraction of hemisphere covered).  With an enclosing emissive sphere the
    furnace result is exactly E * albedo."""
    b = SceneBuilder()
    # big emissive sphere; seen from inside it is a back face, so FlipFace
    # makes it emit inward (the reference's one-sided-light mechanism)
    dome = b.sphere((0, 0, 0), 100, b.diffuse_light((2.0, 2.0, 2.0)))
    b.flip_face(dome)
    b.sphere((0, -1005, 0), 1000, b.lambertian((0.5, 0.5, 0.5)))  # floor plate below
    scene = b.finalize()
    cfg = TraceConfig(max_depth=16, background=(0.0, 0.0, 0.0))
    # hit the plate, bounce once, everything escapes to the emitter:
    # L = 2.0 * 0.5 = 1.0 (one diffuse bounce), cosine sampling makes the
    # estimator exact per-sample only in expectation
    rad = np.asarray(_fire(scene, cfg, n=8192, origin=(0, 0, 0), target=(0, -5, 0), key=KEY))
    mean = rad.mean(axis=1)
    np.testing.assert_allclose(mean, 1.0, rtol=0.05)


def test_mis_and_cosine_only_agree_on_unshadowed_plate():
    """MIS (with lights list) and cosine-only must estimate the same
    integral: direct lighting of a plate by a rect light."""
    b1 = SceneBuilder()
    light = b1.rect_xz(-2, 2, -2, 2, 8.0, b1.diffuse_light((10.0, 10.0, 10.0)))
    b1.flip_face(light)
    b1.add_light(light)
    b1.rect_xz(-50, 50, -50, 50, 0.0, b1.lambertian((0.7, 0.7, 0.7)))
    s_mis = b1.finalize()

    b2 = SceneBuilder()
    light2 = b2.rect_xz(-2, 2, -2, 2, 8.0, b2.diffuse_light((10.0, 10.0, 10.0)))
    b2.flip_face(light2)
    b2.rect_xz(-50, 50, -50, 50, 0.0, b2.lambertian((0.7, 0.7, 0.7)))
    s_cos = b2.finalize()
    assert len(s_mis.stats.light_ids) == 1 and len(s_cos.stats.light_ids) == 0

    cfg = TraceConfig(max_depth=8, background=(0.0, 0.0, 0.0))
    n = 8192
    r_mis = np.asarray(_fire(s_mis, cfg, n=n, origin=(0, 3, -6), target=(0, 0, 0), key=jax.random.PRNGKey(1)))
    r_cos = np.asarray(_fire(s_cos, cfg, n=n, origin=(0, 3, -6), target=(0, 0, 0), key=jax.random.PRNGKey(2)))
    m_mis = r_mis.mean(axis=1)
    m_cos = r_cos.mean(axis=1)
    # same expectation within MC error; MIS should also have lower variance
    np.testing.assert_allclose(m_mis, m_cos, rtol=0.1)
    assert r_mis.var() < r_cos.var()


def test_render_batch_shapes_and_determinism():
    b = SceneBuilder()
    b.sphere((0, 0, -3), 1, b.lambertian((0.5, 0.2, 0.2)))
    scene = b.finalize()
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60, 1.0)
    cfg = TraceConfig(max_depth=4, background=None)
    img1 = render_batch(scene, cam, KEY, 16, 16, 4, cfg)
    img2 = render_batch(scene, cam, KEY, 16, 16, 4, cfg)
    assert img1.shape == (3, 16, 16)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_render_sum_batching_invariance():
    """Sample batching must not change the result beyond key folding."""
    b = SceneBuilder()
    b.sphere((0, 0, -3), 1, b.lambertian((0.5, 0.2, 0.2)))
    scene = b.finalize()
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60, 1.0)
    cfg_a = RenderConfig(width=12, height=12, spp=8, max_depth=4, background=None)
    cfg_b = RenderConfig(width=12, height=12, spp=8, max_depth=4, background=None, spp_per_batch=4)
    a = np.asarray(render_sum(scene, cam, cfg_a)) / 8
    bsum = np.asarray(render_sum(scene, cam, cfg_b)) / 8
    # different RNG partitioning -> only statistically equal
    assert np.abs(a - bsum).mean() < 0.15


def test_regen_diff_matches_scan_statistically():
    """trace_regen_diff (fixed-trip differentiable regeneration) computes
    the same estimator as trace: with n_iters at the exact bound every
    sample completes and the image means agree within MC error."""
    from raytracer2022_tpu.render.renderer import render_batch_regen_diff

    b = SceneBuilder()
    light = b.rect_xz(-1, 1, -1, 1, 3, b.diffuse_light((8.0, 8.0, 8.0)))
    b.flip_face(light)
    b.add_light(light)
    b.rect_xz(-4, 4, -4, 4, 0, b.lambertian((0.6, 0.5, 0.4)))
    b.sphere((0, 1, 0), 0.7, b.metal((0.8, 0.8, 0.8), 0.1))
    scene = b.finalize()
    cam = make_camera((0, 2, -6), (0, 1, 0), (0, 1, 0), 45, 1.0)
    cfg = TraceConfig(max_depth=16, background=(0.0, 0.0, 0.0))

    spp = 64
    a = np.asarray(render_batch(scene, cam, KEY, 24, 24, spp, cfg)) / spp
    img, cnt = render_batch_regen_diff(
        scene, cam, KEY, 24, 24, 8, spp // 8, 8 * 16 + 1, cfg
    )
    cnt = np.asarray(cnt)
    # exact trip bound: the whole pixel pool provably completes
    np.testing.assert_array_equal(cnt, spp)
    r = np.asarray(img) / spp
    np.testing.assert_allclose(a.mean(), r.mean(), rtol=0.05)
    np.testing.assert_allclose(a.mean(axis=(1, 2)), r.mean(axis=(1, 2)), rtol=0.08)


@pytest.mark.slow
def test_regen_diff_truncated_iters_normalizes():
    """With n_iters below the bound, unfinished samples are discarded and
    ``done`` counts completed ones; sum/count stays a consistent
    estimator."""
    from raytracer2022_tpu.render.renderer import (
        regen_iters_estimate,
        render_batch_regen_diff,
    )

    b = SceneBuilder()
    light = b.rect_xz(-1, 1, -1, 1, 3, b.diffuse_light((8.0, 8.0, 8.0)))
    b.flip_face(light)
    b.add_light(light)
    b.rect_xz(-4, 4, -4, 4, 0, b.lambertian((0.6, 0.5, 0.4)))
    scene = b.finalize()
    cam = make_camera((0, 2, -6), (0, 1, 0), (0, 1, 0), 45, 1.0)
    cfg = TraceConfig(max_depth=16, background=(0.0, 0.0, 0.0))

    n_iters = regen_iters_estimate(scene, cam, 16, 16, 4, 8, cfg)
    assert n_iters < 8 * 16 + 1  # the estimate actually saves iterations
    img, cnt = render_batch_regen_diff(scene, cam, KEY, 16, 16, 4, 8, n_iters, cfg)
    cnt = np.asarray(cnt)
    assert cnt.min() > 0
    # margin+slack should complete (nearly) everything on this short-path scene
    assert cnt.sum() >= 0.99 * 16 * 16 * 32
    spp = 64
    a = np.asarray(render_batch(scene, cam, KEY, 16, 16, spp, cfg)) / spp
    r = np.asarray(img) / np.maximum(cnt, 1)[None]
    np.testing.assert_allclose(a.mean(), r.mean(), rtol=0.07)


@pytest.mark.slow
def test_regen_pool_counts_exact():
    """Global-pool scheduling bookkeeping: inside an emissive dome every
    sample contributes EXACTLY the emission, so the per-pixel mean equals
    it bit-for-bit iff no sample is dropped, duplicated, or misrouted by
    the pool reservation / slot deposit / segment regroup."""
    from raytracer2022_tpu.render.renderer import render_batch_regen

    b = SceneBuilder()
    dome = b.sphere((0, 0, 0), 50, b.diffuse_light((1.5, 2.0, 2.5)))
    b.flip_face(dome)
    scene = b.finalize()
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60, 1.0)
    cfg = TraceConfig(max_depth=4, background=(0.0, 0.0, 0.0))
    # small config (narrow drain phase off) and 8192-lane config (on)
    for w, h, spp_par, spp_seq in [(16, 16, 4, 8), (32, 32, 8, 4)]:
        img = np.asarray(
            render_batch_regen(scene, cam, KEY, w, h, spp_par, spp_seq, cfg)
        ) / (spp_par * spp_seq)
        np.testing.assert_allclose(img[0], 1.5, rtol=1e-6)
        np.testing.assert_allclose(img[1], 2.0, rtol=1e-6)
        np.testing.assert_allclose(img[2], 2.5, rtol=1e-6)


def test_regen_matches_scan_statistically():
    """trace_regen computes the same estimator as trace: on a scene where
    every path terminates within the depth cap, the image means must agree
    within Monte-Carlo error (the schedules differ, so not bitwise)."""
    from raytracer2022_tpu.render.renderer import render_batch_regen

    b = SceneBuilder()
    light = b.rect_xz(-1, 1, -1, 1, 3, b.diffuse_light((8.0, 8.0, 8.0)))
    b.flip_face(light)
    b.add_light(light)
    b.rect_xz(-4, 4, -4, 4, 0, b.lambertian((0.6, 0.5, 0.4)))
    b.sphere((0, 1, 0), 0.7, b.metal((0.8, 0.8, 0.8), 0.1))
    scene = b.finalize()
    cam = make_camera((0, 2, -6), (0, 1, 0), (0, 1, 0), 45, 1.0)
    cfg = TraceConfig(max_depth=16, background=(0.0, 0.0, 0.0))

    spp = 64
    a = np.asarray(render_batch(scene, cam, KEY, 24, 24, spp, cfg)) / spp
    r = np.asarray(
        render_batch_regen(scene, cam, KEY, 24, 24, 8, spp // 8, cfg)
    ) / spp
    # same estimator, independent streams: means agree within MC noise
    np.testing.assert_allclose(a.mean(), r.mean(), rtol=0.05)
    np.testing.assert_allclose(
        a.mean(axis=(1, 2)), r.mean(axis=(1, 2)), rtol=0.08
    )


@pytest.mark.parametrize("pool", [False, "pixel"])
def test_regen_quota_narrow_drain_statistical(pool):
    """r5: the QUOTA and PIXEL-POOL schedules' narrow drains (stragglers
    compacted to N/4 and finished there — quota lanes keep regenerating;
    pixel-pool lanes carry their pixel's leftover pool as per-lane quotas)
    must keep the estimator: 64x64 x spp_par 2 = 8192 lanes engages the
    drain even on the CPU mesh.  Wins: random_scene 5.2 -> 12.3, cornell
    headline 100 -> 166 Mpaths/s (one 2048-spp launch)."""
    from raytracer2022_tpu.render.renderer import render_batch, render_batch_regen

    b = SceneBuilder()
    light = b.rect_xz(-1, 1, -1, 1, 3.9, b.diffuse_light((8.0, 8.0, 8.0)))
    b.flip_face(light)
    b.add_light(light)
    b.rect_xz(-4, 4, -4, 4, 0.0, b.lambertian((0.6, 0.4, 0.3)))
    b.sphere((0, 1, 0), 1, b.lambertian((0.3, 0.5, 0.7)))
    scene = b.finalize()
    cam = make_camera((0, 2, -8), (0, 1, 0), (0, 1, 0), 40, 1.0)
    cfg = TraceConfig(max_depth=4, background=(0.0, 0.0, 0.0))
    key = jax.random.PRNGKey(3)
    img_q = np.asarray(render_batch_regen(scene, cam, key, 64, 64, 2, 8, cfg, pool=pool)) / 16
    img_s = np.asarray(render_batch(scene, cam, jax.random.fold_in(key, 1), 64, 64, 16, cfg)) / 16
    assert abs(img_q.mean() - img_s.mean()) / max(img_s.mean(), 1e-6) < 0.05


def test_render_checkpoint_resume(tmp_path):
    """r5 checkpoint/resume (the reference render is all-or-nothing,
    SURVEY.md §5): interrupting after k launches and rerunning with the
    same configuration must produce the IDENTICAL image (launches are
    deterministic in their index)."""
    from raytracer2022_tpu.render import renderer as R

    b = SceneBuilder()
    light = b.rect_xz(-1, 1, -1, 1, 3.9, b.diffuse_light((8.0, 8.0, 8.0)))
    b.flip_face(light)
    b.add_light(light)
    b.rect_xz(-4, 4, -4, 4, 0.0, b.lambertian((0.6, 0.4, 0.3)))
    scene = b.finalize()
    cam = make_camera((0, 2, -8), (0, 1, 0), (0, 1, 0), 40, 1.0)
    cfg = RenderConfig(
        width=16, height=12, spp=8, max_depth=3, background=(0.0, 0.0, 0.0),
        spp_per_batch=2, max_rays_per_batch=16 * 4 * 2,  # 3 row strips
    )
    os.environ["RT2022_MAX_SPP_SEQ"] = "1"  # 4 launches/strip -> 12 total
    ref, n_ref = R.render_sum_n(scene, cam, cfg)
    ref = np.asarray(ref)

    ckpt = str(tmp_path / "render.npz")
    orig = R._render_batch_regen_jit
    calls = {"n": 0}

    def crashing(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 5:
            raise RuntimeError("simulated interruption")
        return orig(*a, **kw)

    R._render_batch_regen_jit = crashing
    try:
        with pytest.raises(RuntimeError):
            R.render_sum_n(scene, cam, cfg, checkpoint=ckpt)
    finally:
        R._render_batch_regen_jit = orig
    # resume: completes the remaining launches and matches exactly
    try:
        out, n = R.render_sum_n(scene, cam, cfg, checkpoint=ckpt)
    finally:
        del os.environ["RT2022_MAX_SPP_SEQ"]
    assert n == n_ref
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)
