"""BOX primitive: the fused slab test vs the reference's 6-rect lowering.

The reference builds a box as a HittableList of 6 axis rects
(boxes.rs:23-66); their closest hit IS the box slab test, so the compiler
emits ONE BOX row (ops/intersect._box_t).  These tests pin the equivalence:
identical winning t / normal / front / uv, through transforms, and as a
ConstantMedium boundary.
"""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer2022_tpu.ops.intersect import closest_hit
from raytracer2022_tpu.scene.builder import SceneBuilder
from raytracer2022_tpu.scene.types import BOX

KEY = jax.random.PRNGKey(7)


def _scenes(rotate=False):
    mats = lambda b: b.lambertian((0.6, 0.5, 0.4))  # noqa: E731
    out = []
    for as_rects in (False, True):
        b = SceneBuilder()
        ids = b.box((-1.0, -0.5, 2.0), (1.5, 2.0, 4.0), mats(b), as_rects=as_rects)
        if rotate:
            b.rotate_y(ids, 31.0)
            b.translate(ids, (0.3, 0.1, -0.2))
        out.append(b.finalize())
    return out


def _rays(rng, n=4096):
    # mix of outside->in, inside->out, and grazing rays
    o = jnp.asarray(rng.uniform(-3, 3, (3, n)) * np.array([[1.0], [1.0], [0.5]]))
    o = o + jnp.asarray([[0.0], [0.0], [1.0]])
    d = jnp.asarray(rng.normal(size=(3, n)))
    tm = jnp.zeros(n)
    return o, d, tm


def _hits(scene, o, d, tm):
    hit, _ = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, KEY)
    return hit


def test_box_equals_six_rects(rng):
    sb, sr = _scenes()
    assert int(np.asarray(sb.kind)[0]) == BOX and sb.n_prims == 1
    assert sr.n_prims == 6
    o, d, tm = _rays(rng)
    hb = _hits(sb, o, d, tm)
    hr = _hits(sr, o, d, tm)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hr.hit))
    m = np.asarray(hb.hit)
    # winning-face t is the same (k - o_a)/d_a expression in both paths
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hr.t)[m], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hb.normal)[:, m], np.asarray(hr.normal)[:, m], atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(hb.front)[m], np.asarray(hr.front)[m])
    np.testing.assert_allclose(np.asarray(hb.u)[m], np.asarray(hr.u)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hb.v)[m], np.asarray(hr.v)[m], atol=1e-5)


def test_box_equals_six_rects_transformed(rng):
    """RotateY + Translate carried as the world->object similarity."""
    sb, sr = _scenes(rotate=True)
    o, d, tm = _rays(rng)
    hb = _hits(sb, o, d, tm)
    hr = _hits(sr, o, d, tm)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hr.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hr.t)[m], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hb.normal)[:, m], np.asarray(hr.normal)[:, m], atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(hb.front)[m], np.asarray(hr.front)[m])


def test_box_medium_boundary_spans(rng):
    """The medium's deterministic part — entry/exit boundary spans — must be
    identical between a BOX boundary and the 6-rect lowering (the
    stochastic free-flight then samples the same distribution; the raw
    streams differ because _medium_t folds the medium's prim id into its
    key, so images are only statistically comparable — see below)."""
    from raytracer2022_tpu.ops.intersect import candidate_t

    scenes = []
    for as_rects in (False, True):
        b = SceneBuilder()
        ids = b.box((-1.0, 0.0, -1.0), (1.0, 2.0, 1.0), b.lambertian((0.7, 0.7, 0.7)),
                    as_rects=as_rects)
        b.rotate_y(ids, 15.0)
        b.constant_medium(ids, 0.8, (0.9, 0.9, 0.9))
        scenes.append(b.finalize())
    o, d, tm = _rays(rng, n=2048)
    spans = []
    for s in scenes:
        pid, b0, cnt = s.stats.mediums[0]
        entry = jnp.min(candidate_t(s, o, d, tm, -jnp.inf, jnp.inf,
                                    prim_slice=slice(b0, b0 + cnt),
                                    include_inactive=True), axis=0)
        exit_ = jnp.min(candidate_t(s, o, d, tm, entry + 1e-4, jnp.inf,
                                    prim_slice=slice(b0, b0 + cnt),
                                    include_inactive=True), axis=0)
        spans.append((np.asarray(entry), np.asarray(exit_)))
    (e0, x0), (e1, x1) = spans
    both = np.isfinite(e0) & np.isfinite(e1)
    np.testing.assert_array_equal(np.isfinite(e0), np.isfinite(e1))
    np.testing.assert_allclose(e0[both], e1[both], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(x0[both], x1[both], rtol=1e-5, atol=1e-5)


def test_box_medium_boundary_statistical(rng):
    """Image-level sanity for the smoke-in-a-box scene: statistically equal
    (the per-medium RNG stream differs with the boundary's prim id, so
    this is MC-noise-limited, not bit-exact)."""
    imgs = []
    for as_rects in (False, True):
        b = SceneBuilder()
        light = b.rect_xz(-2, 2, -2, 2, 6.0, b.diffuse_light((6.0, 6.0, 6.0)))
        b.flip_face(light)
        b.add_light(light)
        ids = b.box((-1.0, 0.0, -1.0), (1.0, 2.0, 1.0), b.lambertian((0.7, 0.7, 0.7)),
                    as_rects=as_rects)
        b.rotate_y(ids, 15.0)
        b.constant_medium(ids, 0.8, (0.9, 0.9, 0.9))
        scene = b.finalize()

        from raytracer2022_tpu import TraceConfig, make_camera
        from raytracer2022_tpu.render.renderer import render_batch

        cam = make_camera((0, 3, -6), (0, 1, 0), (0, 1, 0), 40, 1.0)
        cfg = TraceConfig(max_depth=8, background=(0.0, 0.0, 0.0))
        img = render_batch(scene, cam, KEY, 24, 24, 64, cfg) / 64
        imgs.append(np.asarray(img))
    mae = np.abs(imgs[0] - imgs[1]).mean()
    assert mae < 0.035, mae  # MC noise at 64 spp measured ~0.022
    np.testing.assert_allclose(imgs[0].mean(), imgs[1].mean(), rtol=0.05)
