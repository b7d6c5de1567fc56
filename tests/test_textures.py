"""Texture evaluation vs oracles (Perlin double-Hermite quirk included)."""

import numpy as np
import jax.numpy as jnp

import oracle
from raytracer2022_tpu.ops.shade import shade_from_rows, shade_table
from raytracer2022_tpu.ops.textures import eval_texture_shade, perlin_noise, perlin_turb
from raytracer2022_tpu.scene.builder import SceneBuilder


def _scene_with(builder_fn):
    b = SceneBuilder()
    tid = builder_fn(b)
    b.sphere((0, 0, 0), 1, b.lambertian(tid))
    return b.finalize(), tid


def _eval(scene, tid, p, u=None, v=None):
    """Evaluate through the PRODUCTION texture path: per-prim shading rows
    (ops/shade.py) fetched for the single test prim, then
    eval_texture_shade — the same dispatch the integrator runs."""
    n = p.shape[1]
    u = jnp.zeros(n) if u is None else jnp.asarray(u)
    v = jnp.zeros(n) if v is None else jnp.asarray(v)
    srows = shade_table(scene)  # (S, P); test prim is id 0
    shade = shade_from_rows(
        jnp.broadcast_to(srows[:, 0:1], (srows.shape[0], n)), scene.stats.features
    )
    return np.asarray(
        eval_texture_shade(
            scene.textures,
            shade,
            u,
            v,
            jnp.asarray(p, dtype=jnp.float32),
            jnp.zeros((2, n)),
            scene.stats.features,
        )
    )


def test_solid_color(rng):
    scene, tid = _scene_with(lambda b: b.solid((0.1, 0.5, 0.9)))
    p = rng.normal(size=(3, 8)).astype(np.float32)
    val = _eval(scene, tid, p)
    np.testing.assert_allclose(val, np.array([[0.1], [0.5], [0.9]]) * np.ones((3, 8)), rtol=1e-6)


def test_checker_sign_select(rng):
    scene, tid = _scene_with(lambda b: b.checker((0.2, 0.3, 0.1), (0.9, 0.9, 0.9)))
    p = rng.uniform(-2, 2, size=(3, 64)).astype(np.float32)
    val = _eval(scene, tid, p)
    sines = np.sin(10 * p[0]) * np.sin(10 * p[1]) * np.sin(10 * p[2])
    expect = np.where(sines < 0, np.array([[0.2], [0.3], [0.1]]), np.array([[0.9], [0.9], [0.9]]))
    np.testing.assert_allclose(val, expect, rtol=1e-5)


def test_perlin_noise_vs_oracle(rng):
    scene, tid = _scene_with(lambda b: b.noise(4.0))
    tt = scene.textures
    randvec = np.asarray(tt.perlin_vec)
    perms = np.asarray(tt.perlin_perm)
    p = rng.uniform(-10, 10, size=(3, 32))
    got = np.asarray(perlin_noise(tt, jnp.asarray(p, dtype=jnp.float32)))
    for i in range(32):
        expect = oracle.perlin_noise(randvec, perms, p[:, i])
        np.testing.assert_allclose(got[i], expect, rtol=2e-3, atol=2e-4)


def test_perlin_turb_and_marble(rng):
    scene, tid = _scene_with(lambda b: b.noise(4.0))
    tt = scene.textures
    randvec = np.asarray(tt.perlin_vec)
    perms = np.asarray(tt.perlin_perm)
    p = rng.uniform(-5, 5, size=(3, 8))
    got_turb = np.asarray(perlin_turb(tt, jnp.asarray(p, dtype=jnp.float32)))
    for i in range(8):
        expect = oracle.perlin_turb(randvec, perms, p[:, i])
        np.testing.assert_allclose(got_turb[i], expect, rtol=5e-3, atol=5e-4)
    # marble formula (texture/mod.rs:76-78)
    val = _eval(scene, tid, p.astype(np.float32))
    for i in range(8):
        expect = 0.5 * (1 + np.sin(4.0 * p[2, i] + 10 * oracle.perlin_turb(randvec, perms, p[:, i])))
        np.testing.assert_allclose(val[:, i], expect, rtol=5e-3, atol=5e-3)


def test_image_texture_nearest_and_flip(rng):
    # 4x2 image with distinct corner colors
    img = np.zeros((2, 4, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]  # top-left in file
    img[1, 3] = [0, 0, 255]  # bottom-right in file
    b = SceneBuilder()
    tid = b.image(img)
    b.sphere((0, 0, 0), 1, b.lambertian(tid))
    scene = b.finalize()
    # v=1 samples the TOP row of the original (flipped storage);
    # u=0,v=1 -> red; u=1,v=0 -> blue
    p = np.zeros((3, 2), dtype=np.float32)
    val = _eval(scene, tid, p, u=np.array([0.0, 1.0]), v=np.array([1.0, 0.0]))
    np.testing.assert_allclose(val[:, 0], [255 / 255.999, 0, 0], atol=1e-3)
    np.testing.assert_allclose(val[:, 1], [0, 0, 255 / 255.999], atol=1e-3)


def test_image_texture_clamps(rng):
    img = np.full((2, 2, 3), 128, dtype=np.uint8)
    b = SceneBuilder()
    tid = b.image(img)
    b.sphere((0, 0, 0), 1, b.lambertian(tid))
    scene = b.finalize()
    p = np.zeros((3, 2), dtype=np.float32)
    val = _eval(scene, tid, p, u=np.array([-0.5, 1.5]), v=np.array([1.7, -0.3]))
    np.testing.assert_allclose(val, 128 / 255.999, rtol=1e-5)
