"""Unit tests for ops.vecmath against NumPy oracles (component-leading)."""

import numpy as np
import jax.numpy as jnp

import oracle
from raytracer2022_tpu.ops import vecmath as vm


def _batch(rng, n=64):
    return rng.normal(size=(3, n)).astype(np.float32)


def test_dot_cross_length(rng):
    a = _batch(rng)
    b = _batch(rng)
    np.testing.assert_allclose(
        np.asarray(vm.dot(jnp.asarray(a), jnp.asarray(b))),
        np.sum(a * b, axis=0),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(vm.cross(jnp.asarray(a), jnp.asarray(b))),
        np.cross(a.T, b.T).T,
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(vm.length(jnp.asarray(a))),
        np.linalg.norm(a, axis=0),
        rtol=1e-5,
    )


def test_to_unit_and_near_zero(rng):
    a = _batch(rng)
    u = np.asarray(vm.to_unit(jnp.asarray(a)))
    np.testing.assert_allclose(np.linalg.norm(u, axis=0), 1.0, rtol=1e-5)
    tiny = np.full((3, 4), 1e-9, dtype=np.float32)
    assert np.asarray(vm.near_zero(jnp.asarray(tiny))).all()
    assert not np.asarray(vm.near_zero(jnp.asarray(a))).any()


def test_reflect_refract_oracle(rng):
    for _ in range(20):
        v = rng.normal(size=3)
        n = oracle.unit(rng.normal(size=3))
        got = np.asarray(
            vm.reflect(jnp.asarray(v[:, None]), jnp.asarray(n[:, None]))
        )[:, 0]
        np.testing.assert_allclose(got, oracle.reflect(v, n), rtol=1e-5, atol=1e-6)

        uv = oracle.unit(rng.normal(size=3))
        eta = rng.uniform(0.4, 2.0)
        got = np.asarray(
            vm.refract(
                jnp.asarray(uv[:, None]),
                jnp.asarray(n[:, None]),
                jnp.asarray([eta], dtype=jnp.float32),
            )
        )[:, 0]
        np.testing.assert_allclose(
            got, oracle.refract(uv, n, eta), rtol=1e-4, atol=1e-5
        )


def test_onb_matches_reference_construction(rng):
    for _ in range(20):
        n = rng.normal(size=3)
        u, v, w = oracle.onb_from_w(n)
        gu, gv, gw = vm.onb_from_w(jnp.asarray(n[:, None], dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(gu)[:, 0], u, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gv)[:, 0], v, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw)[:, 0], w, rtol=1e-4, atol=1e-5)


def test_onb_is_orthonormal(rng):
    n = _batch(rng)
    u, v, w = vm.onb_from_w(jnp.asarray(n))
    for a in (u, v, w):
        np.testing.assert_allclose(np.asarray(vm.length(a)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(u, v)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(v, w)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(u, w)), 0.0, atol=1e-5)
