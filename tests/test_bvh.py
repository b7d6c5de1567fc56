"""BVH build + traversal must agree exactly with brute force."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer2022_tpu.ops.intersect import closest_hit
from raytracer2022_tpu.scene.builder import SceneBuilder
from raytracer2022_tpu.scene.bvh import build_bvh

KEY = jax.random.PRNGKey(5)


def _random_sphere_scene(rng, n_spheres, bvh):
    b = SceneBuilder(seed=7)
    m = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(n_spheres):
        c = rng.uniform(-10, 10, 3)
        b.sphere(c, rng.uniform(0.2, 0.8), m)
    return b.finalize(bvh_threshold=64 if bvh else 10**9)


def test_bvh_arrays_wellformed(rng):
    bmin = rng.uniform(-10, 10, size=(100, 3))
    bmax = bmin + rng.uniform(0.1, 2.0, size=(100, 3))
    nodes, order = build_bvh(bmin, bmax, leaf_size=4)
    n_nodes = len(nodes["skip"])
    assert sorted(order.tolist()) == list(range(100))
    # skip links point forward and never beyond the end
    assert (nodes["skip"] > np.arange(n_nodes)).all()
    assert (nodes["skip"] <= n_nodes).all()
    # leaf windows cover the whole order exactly once
    leaves = [(s, c) for s, c in zip(nodes["leaf_start"], nodes["leaf_count"]) if c > 0]
    covered = sorted(i for s, c in leaves for i in range(s, s + c))
    assert covered == list(range(100))
    # root bbox contains everything
    assert (nodes["bmin"][:, 0] <= bmin.min(axis=0) + 1e-6).all()
    assert (nodes["bmax"][:, 0] >= bmax.max(axis=0) - 1e-6).all()


def test_bvh_traversal_matches_brute_force(rng):
    sb = _random_sphere_scene(rng, 200, bvh=True)
    sn = _random_sphere_scene(np.random.default_rng(1234), 200, bvh=False)
    assert sb.use_bvh and not sn.use_bvh

    n = 512
    o = rng.uniform(-15, 15, size=(3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    tm = np.zeros(n, dtype=np.float32)

    hb, _ = closest_hit(sb, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), 1e-3, jnp.inf, KEY)
    hn, _ = closest_hit(sn, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), 1e-3, jnp.inf, KEY)

    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hn.hit))
    np.testing.assert_allclose(
        np.asarray(hb.t)[np.asarray(hb.hit)],
        np.asarray(hn.t)[np.asarray(hn.hit)],
        rtol=1e-5,
    )
    # same geometry -> same hit points/normals (prim ids are permuted)
    np.testing.assert_allclose(
        np.asarray(hb.p)[:, np.asarray(hb.hit)],
        np.asarray(hn.p)[:, np.asarray(hn.hit)],
        rtol=1e-4,
        atol=1e-4,
    )


def test_bvh_scene_with_lights_and_medium(rng):
    """BVH path with loose prims (medium + boundary) and remapped lights."""

    def build(bvh):
        b = SceneBuilder(seed=3)
        m = b.lambertian((0.6, 0.6, 0.6))
        for _ in range(100):
            b.sphere(rng.uniform(-10, 10, 3) + np.array([0, 0, 30]), 0.5, m)
        light = b.rect_xz(-2, 2, -2, 2, 12.0, b.diffuse_light((5.0, 5.0, 5.0)))
        b.flip_face(light)
        b.add_light(light)
        sph = b.sphere((0, 0, 0), 3, b.dielectric(1.5))
        b.constant_medium([sph], 0.5, (0.4, 0.4, 0.4))
        return b.finalize(bvh_threshold=32 if bvh else 10**9)

    rng2 = np.random.default_rng(99)
    sb = build(True)
    assert sb.use_bvh
    assert sb.any_medium
    # light id must be remapped to the permuted arrays and still be a rect
    lid = sb.stats.light_ids[0]
    assert int(sb.kind[lid]) == 2  # RECT
    assert sb.stats.light_kinds[0] == 2

    n = 256
    o = rng2.uniform(-12, 12, size=(3, n)).astype(np.float32)
    d = rng2.normal(size=(3, n)).astype(np.float32)
    tm = np.zeros(n, dtype=np.float32)
    hit, _ = closest_hit(sb, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), 1e-3, jnp.inf, KEY)
    assert np.asarray(hit.hit).any()
    assert np.isfinite(np.asarray(hit.t)[np.asarray(hit.hit)]).all()
