"""Primitive intersection kernels vs the NumPy oracle (SURVEY.md §7 step 3)."""

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from raytracer2022_tpu.ops.intersect import candidate_t, closest_hit
from raytracer2022_tpu.scene.builder import SceneBuilder

KEY = jax.random.PRNGKey(0)


def _rays(rng, n=128, lo=-3, hi=3):
    o = rng.uniform(lo, hi, size=(3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    tm = rng.uniform(0, 1, size=n).astype(np.float32)
    return o, d, tm


def _compare_prim(scene, oracle_fn, o, d, tm, t_min=1e-3, t_max=1e9, rtol=2e-4):
    t = np.asarray(candidate_t(scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), t_min, t_max))
    n = o.shape[1]
    for i in range(n):
        expect = oracle_fn(o[:, i].astype(np.float64), d[:, i].astype(np.float64), i)
        got = t[0, i]  # candidate_t layout: (prim, ray)
        if expect is None:
            assert not np.isfinite(got), f"ray {i}: oracle miss but got t={got}"
        else:
            assert np.isfinite(got), f"ray {i}: oracle t={expect} but got miss"
            np.testing.assert_allclose(got, expect, rtol=rtol, atol=1e-4)


def test_sphere_vs_oracle(rng):
    b = SceneBuilder()
    center, radius = np.array([0.5, -0.25, 1.0]), 1.3
    b.sphere(center, radius, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.finalize()
    o, d, tm = _rays(rng)
    _compare_prim(
        scene,
        lambda oo, dd, i: oracle.sphere_hit(center, radius, oo, dd, 1e-3, 1e9),
        o,
        d,
        tm,
    )


def test_moving_sphere_vs_oracle(rng):
    b = SceneBuilder()
    c0, c1, r = np.array([0.0, 0.0, 0.0]), np.array([1.0, 0.5, 0.0]), 0.8
    b.moving_sphere(c0, c1, 0.0, 1.0, r, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.finalize()
    o, d, tm = _rays(rng)

    def orc(oo, dd, i):
        c = c0 + (c1 - c0) * ((tm[i] - 0.0) / (1.0 - 0.0))
        return oracle.sphere_hit(c, r, oo, dd, 1e-3, 1e9)

    _compare_prim(scene, orc, o, d, tm)


def test_rects_vs_oracle(rng):
    cases = [
        ("rect_xy", (0, 1), 2, lambda b, m: b.rect_xy(-1, 1, -0.5, 1.5, 0.7, m)),
        ("rect_xz", (0, 2), 1, lambda b, m: b.rect_xz(-1, 1, -0.5, 1.5, 0.7, m)),
        ("rect_yz", (1, 2), 0, lambda b, m: b.rect_yz(-1, 1, -0.5, 1.5, 0.7, m)),
    ]
    for name, (aa, bb), ka, make in cases:
        b = SceneBuilder()
        make(b, b.lambertian((0.5, 0.5, 0.5)))
        scene = b.finalize()
        o, d, tm = _rays(rng)
        _compare_prim(
            scene,
            lambda oo, dd, i: oracle.rect_hit((aa, bb, ka), -1, 1, -0.5, 1.5, 0.7, oo, dd, 1e-3, 1e9),
            o,
            d,
            tm,
        )


def test_triangle_vs_oracle(rng):
    b = SceneBuilder()
    va = np.array([0.0, 0.0, 0.0])
    vb = np.array([2.0, 0.2, 0.1])
    vc = np.array([0.3, 1.8, -0.2])
    b.triangle(va, vb, vc, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.finalize()
    o, d, tm = _rays(rng)
    _compare_prim(
        scene,
        lambda oo, dd, i: oracle.triangle_hit(va, vb, vc, oo, dd, 1e-3, 1e9),
        o,
        d,
        tm,
        rtol=1e-3,
    )


def test_triangle_barycentric_uv(rng):
    b = SceneBuilder()
    va = np.array([0.0, 0.0, 0.0])
    vb = np.array([2.0, 0.2, 0.1])
    vc = np.array([0.3, 1.8, -0.2])
    b.triangle(va, vb, vc, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.finalize()
    o, d, tm = _rays(rng, n=256)
    # aim rays at random points near the triangle so most hit
    targets = rng.uniform(0, 1, size=(256, 2))
    targets = targets / np.maximum(1.0, targets.sum(axis=1, keepdims=True))
    pts = (va[None] + targets[:, :1] * (vb - va)[None] + targets[:, 1:] * (vc - va)[None]).T
    d = (pts - o).astype(np.float32)
    hit, _ = closest_hit(scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), 1e-3, jnp.inf, KEY)
    hits = np.asarray(hit.hit)
    assert hits.sum() > 100  # nearly all aimed rays hit
    for i in np.nonzero(hits)[0][:20]:
        p = np.asarray(hit.p)[:, i].astype(np.float64)
        beta, gama = oracle.triangle_bary(va, vb, vc, p)
        np.testing.assert_allclose(np.asarray(hit.u)[i], beta, rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(np.asarray(hit.v)[i], gama, rtol=1e-2, atol=1e-3)


def test_ring_vs_oracle(rng):
    b = SceneBuilder()
    b.ring(1.5, 0.3, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.finalize()
    o, d, tm = _rays(rng)
    _compare_prim(
        scene,
        lambda oo, dd, i: oracle.ring_hit(1.5, 0.3, oo, dd, 1e-3, 1e9),
        o,
        d,
        tm,
    )


def test_closest_hit_picks_nearest(rng):
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    b.sphere((0, 0, 5), 1, m)
    b.sphere((0, 0, 10), 1, m)
    scene = b.finalize()
    o = jnp.zeros((3, 4))
    d = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [1.0]]), (3, 4))
    tm = jnp.zeros(4)
    hit, _ = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, KEY)
    np.testing.assert_allclose(np.asarray(hit.t), 4.0, rtol=1e-5)
    assert (np.asarray(hit.prim) == 0).all()
    # normal opposes the ray; front face
    np.testing.assert_allclose(np.asarray(hit.normal)[2], -1.0, rtol=1e-5)
    assert np.asarray(hit.front).all()


def test_sphere_uv_poles(rng):
    b = SceneBuilder()
    b.sphere((0, 0, 0), 1, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.finalize()
    # ray hitting +x: outward normal (1,0,0) -> u=0.5, v=0.5
    o = jnp.asarray([[3.0], [0.0], [0.0]])
    d = jnp.asarray([[-1.0], [0.0], [0.0]])
    tm = jnp.zeros(1)
    hit, _ = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, KEY)
    u, v = oracle.sphere_uv(np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(hit.u)[0], u, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.v)[0], v, atol=1e-5)


def test_transformed_rect_matches_manual_oracle(rng):
    """RotateY+Translate on a rect (the Cornell-smoke box transform)."""
    b = SceneBuilder()
    ids = [b.rect_xz(-1, 1, -1, 1, 0.0, b.lambertian((0.5, 0.5, 0.5)))]
    b.rotate_y(ids, 30.0)
    b.translate(ids, (2.0, 0.5, -1.0))
    scene = b.finalize()
    assert scene.any_xform

    import math

    th = math.radians(30.0)
    c, s = math.cos(th), math.sin(th)

    o, d, tm = _rays(rng, n=64)

    def orc(oo, dd, i):
        # world->object: translate back then rotate by -30 (reference
        # RotateY::hit, hittable/mod.rs:233-246)
        ot = oo - np.array([2.0, 0.5, -1.0])
        oo2 = np.array([c * ot[0] - s * ot[2], ot[1], s * ot[0] + c * ot[2]])
        dd2 = np.array([c * dd[0] - s * dd[2], dd[1], s * dd[0] + c * dd[2]])
        return oracle.rect_hit((0, 2, 1), -1, 1, -1, 1, 0.0, oo2, dd2, 1e-3, 1e9)

    _compare_prim(scene, orc, o, d, tm, rtol=1e-3)


def test_flip_face_toggles_front(rng):
    b = SceneBuilder()
    pid = b.rect_xz(-1, 1, -1, 1, 0.0, b.lambertian((0.5, 0.5, 0.5)))
    b.flip_face(pid)
    scene = b.finalize()
    o = jnp.asarray([[0.0], [2.0], [0.0]])
    d = jnp.asarray([[0.0], [-1.0], [0.0]])
    tm = jnp.zeros(1)
    hit, _ = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, KEY)
    assert np.asarray(hit.hit)[0]
    # without flip this would be a front hit; FlipFace toggles it
    assert not np.asarray(hit.front)[0]
    # normal still opposes the ray regardless of flip (mod.rs:279-284)
    np.testing.assert_allclose(np.asarray(hit.normal)[1], 1.0, rtol=1e-5)
