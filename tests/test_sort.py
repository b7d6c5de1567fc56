"""Wavefront coherence sort (ops/sort.py): key structure + estimator
invariance of the sorted regen integrator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer2022_tpu import RenderConfig, make_camera
from raytracer2022_tpu.ops.sort import MORTON_BITS, ray_sort_key, sort_by_key
from raytracer2022_tpu.render.renderer import render_batch_regen
from raytracer2022_tpu.scene.library import random_scene


def test_key_orders_octant_then_position():
    o = jnp.asarray(
        [[0.0, 0.0, 9.9, 0.1], [0.0, 0.0, 9.9, 0.1], [0.0, 0.0, 9.9, 0.1]]
    )
    d = jnp.asarray(
        [[1.0, -1.0, 1.0, 1.0], [1.0, 1.0, 1.0, 1.0], [1.0, 1.0, 1.0, 1.0]]
    )
    k = np.asarray(ray_sort_key(o, d, (0.0, 0.0, 0.0), (10.0, 10.0, 10.0)))
    # octant dominates: ray 1 (negative dx) differs in the top bits
    assert (k[1] >> (3 * MORTON_BITS)) != (k[0] >> (3 * MORTON_BITS))
    # same octant: near-origin (3) sorts before far corner (2)
    assert k[3] < k[2]


def test_sort_by_key_applies_same_permutation_to_all_payloads():
    key = jax.random.PRNGKey(0)
    k = jax.random.randint(key, (257,), 0, 1000)
    a = jnp.arange(257.0)
    b = 2.0 * jnp.arange(257.0)
    a2, b2 = sort_by_key(k, (a, b))
    np.testing.assert_allclose(np.asarray(b2), 2.0 * np.asarray(a2))
    assert set(np.asarray(a2).tolist()) == set(range(257))


@pytest.mark.slow
def test_sorted_regen_is_statistically_equivalent():
    """Sorting permutes lane<->RNG assignment, so images agree to MC noise:
    the sorted-vs-unsorted gap must match the same-config different-seed
    gap (regression guard for the pixel-regrouping path)."""
    bundle = random_scene(bvh_threshold=64)
    cam = make_camera(**bundle.camera_kwargs)
    cfg = RenderConfig(width=32, height=32, spp=16, max_depth=5, background=bundle.background)
    t = cfg.trace_cfg()
    assert bundle.scene.use_bvh
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(9)
    args = (bundle.scene, cam)
    # n = 32*32*2 = 2048 lanes: exactly the sort gate
    A = np.asarray(render_batch_regen(*args, k0, 32, 32, 2, 8, t._replace(sort_rays=True))) / 16
    B = np.asarray(render_batch_regen(*args, k0, 32, 32, 2, 8, t._replace(sort_rays=False))) / 16
    C = np.asarray(render_batch_regen(*args, k1, 32, 32, 2, 8, t._replace(sort_rays=False))) / 16
    noise = np.abs(B - C).mean()
    gap = np.abs(A - B).mean()
    assert gap < 3.0 * noise + 1e-3, (gap, noise)
    assert abs(A.mean() - B.mean()) < 0.05
