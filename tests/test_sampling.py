"""Statistical tests for the closed-form samplers (distribution parity with
the reference's rejection loops, vec.rs:69-117, pdf.rs:12-21)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from raytracer2022_tpu.ops import sampling as sp
from raytracer2022_tpu.ops import vecmath as vm

N = 50_000


def test_uniform_in_unit_sphere_moments():
    v = np.asarray(sp.uniform_in_unit_sphere(jax.random.PRNGKey(0), (N,)))
    r = np.linalg.norm(v, axis=0)
    assert r.max() <= 1.0
    # E[r] for uniform ball = 3/4; E[x]=E[y]=E[z]=0
    assert abs(r.mean() - 0.75) < 5e-3
    assert np.abs(v.mean(axis=1)).max() < 5e-3
    # radius^3 should be uniform
    u = r**3
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(np.var(u) - 1 / 12) < 5e-3


def test_uniform_in_unit_disk():
    v = np.asarray(sp.uniform_in_unit_disk(jax.random.PRNGKey(1), (N,)))
    assert np.all(v[2] == 0)
    r2 = v[0] ** 2 + v[1] ** 2
    assert r2.max() <= 1.0
    # r^2 uniform in [0,1]
    assert abs(r2.mean() - 0.5) < 5e-3


def test_cosine_direction_distribution():
    v = np.asarray(sp.cosine_direction(jax.random.PRNGKey(2), (N,)))
    z = v[2]
    assert z.min() >= 0.0
    # pdf ~ cos(theta)/pi => E[cos theta] = 2/3
    assert abs(z.mean() - 2 / 3) < 5e-3
    np.testing.assert_allclose(np.linalg.norm(v, axis=0), 1.0, rtol=1e-4)


def test_cosine_about_normal_respects_axis():
    normal = jnp.broadcast_to(
        jnp.asarray([[0.0], [1.0], [0.0]], dtype=jnp.float32), (3, N)
    )
    v = np.asarray(sp.cosine_about_normal(jax.random.PRNGKey(3), normal))
    assert v[1].min() >= -1e-6
    assert abs(v[1].mean() - 2 / 3) < 5e-3


def test_to_sphere_cone():
    radius = jnp.full((N,), 0.5)
    dist_sqr = jnp.full((N,), 4.0)
    v = np.asarray(sp.to_sphere(jax.random.PRNGKey(4), radius, dist_sqr))
    cos_max = math.sqrt(1 - 0.25 / 4.0)
    assert v[2].min() >= cos_max - 1e-5
    # z uniform in [cos_max, 1]
    assert abs(v[2].mean() - (1 + cos_max) / 2) < 5e-3
    np.testing.assert_allclose(np.linalg.norm(v, axis=0), 1.0, rtol=1e-4)


def test_cos_pdf_value_matches_reference_formula():
    key = jax.random.PRNGKey(5)
    d = sp.uniform_on_unit_sphere(key, (1000,))
    w = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [1.0]], dtype=jnp.float32), (3, 1000))
    pdf = np.asarray(sp.cos_pdf_value(d, w))
    cos = np.asarray(d)[2]
    expect = np.where(cos <= 0, 0.0, cos / math.pi)
    np.testing.assert_allclose(pdf, expect, rtol=1e-4, atol=1e-6)


def test_sphere_surface_sampler_is_uniform():
    v = np.asarray(sp.uniform_on_unit_sphere(jax.random.PRNGKey(6), (N,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=0), 1.0, rtol=1e-4)
    # each component mean 0, var 1/3
    assert np.abs(v.mean(axis=1)).max() < 5e-3
    assert np.abs(v.var(axis=1) - 1 / 3).max() < 5e-3
