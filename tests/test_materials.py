"""Material scatter/emission semantics vs the reference rules."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer2022_tpu.ops.intersect import closest_hit
from raytracer2022_tpu.ops.materials import emitted, scatter, scattering_pdf_lambertian, texture_value
from raytracer2022_tpu.scene.builder import SceneBuilder

KEY = jax.random.PRNGKey(7)


def _hit_sphere(mat_builder, n=512, key=KEY):
    b = SceneBuilder()
    mat_builder(b)
    scene = b.finalize()
    # rays from a ring of origins aimed at the sphere center
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    o = np.stack([3 * np.cos(ang), 3 * np.sin(ang), np.zeros(n)]).astype(np.float32)
    d = (-o).astype(np.float32)
    tm = np.full(n, 0.5, dtype=np.float32)
    hit, shade = closest_hit(scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), 1e-3, jnp.inf, key)
    return scene, hit, shade, jnp.asarray(d), jnp.asarray(tm)


def test_metal_reflects_with_fuzz_ball():
    fuzz = 0.3
    scene, hit, shade, d, tm = _hit_sphere(
        lambda b: b.sphere((0, 0, 0), 1, b.metal((0.8, 0.6, 0.2), fuzz))
    )
    sc = scatter(shade, hit, texture_value(scene.textures, shade, hit, scene.stats.features), d, tm, KEY)
    assert np.asarray(sc.is_specular).all()
    assert np.asarray(sc.has_scatter).all()
    # metal zeroes the scattered time (material/mod.rs:92)
    np.testing.assert_allclose(np.asarray(sc.spec_time), 0.0)
    # reflected dir within fuzz ball of the mirror dir
    dn = np.asarray(d) / np.linalg.norm(np.asarray(d), axis=0)
    n = np.asarray(hit.normal)
    mirror = dn - 2 * np.sum(dn * n, axis=0) * n
    dev = np.linalg.norm(np.asarray(sc.spec_dir) - mirror, axis=0)
    assert dev.max() <= fuzz + 1e-5
    np.testing.assert_allclose(
        np.asarray(sc.attenuation), np.array([[0.8], [0.6], [0.2]]) * np.ones_like(mirror), rtol=1e-5
    )


def test_dielectric_attenuation_and_branches():
    scene, hit, shade, d, tm = _hit_sphere(lambda b: b.sphere((0, 0, 0), 1, b.dielectric(1.5)))
    sc = scatter(shade, hit, texture_value(scene.textures, shade, hit, scene.stats.features), d, tm, KEY)
    np.testing.assert_allclose(np.asarray(sc.attenuation), 1.0)
    # head-on rays (cos=1): Schlick R0 = 0.04 -> mostly refract (straight through)
    dn = np.asarray(d) / np.linalg.norm(np.asarray(d), axis=0)
    spec = np.asarray(sc.spec_dir)
    spec = spec / np.linalg.norm(spec, axis=0)
    cos_to_d = np.sum(spec * dn, axis=0)
    frac_through = (cos_to_d > 0.999).mean()
    assert frac_through > 0.9  # ~96% refract at normal incidence
    # dielectric keeps the ray time (material/mod.rs:140)
    np.testing.assert_allclose(np.asarray(sc.spec_time), 0.5)


def test_dielectric_total_internal_reflection():
    b = SceneBuilder()
    b.sphere((0, 0, 0), 1, b.dielectric(1.5))
    scene = b.finalize()
    # ray from inside hitting the surface at a grazing angle beyond critical
    o = jnp.asarray([[0.0], [0.0], [0.0]])
    d = jnp.asarray([[0.95], [0.3122], [0.0]])  # oblique from center... still normal incidence
    # from the center every hit is normal incidence; use an off-center origin
    o = jnp.asarray([[0.9], [0.0], [0.0]])
    d = jnp.asarray([[0.05], [1.0], [0.0]])
    tm = jnp.zeros(1)
    hit, shade = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, KEY)
    assert not np.asarray(hit.front)[0]  # exiting: back face
    sc = scatter(shade, hit, texture_value(scene.textures, shade, hit, scene.stats.features), d, tm, KEY)
    # sin(theta) * 1.5 > 1 here -> must reflect (stay inside)
    spec = np.asarray(sc.spec_dir)[:, 0]
    p = np.asarray(hit.p)[:, 0]
    outward = p / np.linalg.norm(p)
    # a refracted ray would exit (positive outward component); TIR stays in
    assert np.dot(spec, outward) < 0


def test_diffuse_light_emits_front_only():
    b = SceneBuilder()
    b.rect_xz(-1, 1, -1, 1, 0.0, b.diffuse_light((4.0, 4.0, 4.0)))
    scene = b.finalize()
    o = jnp.asarray([[0.0, 0.0], [1.0, -1.0], [0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0], [-1.0, 1.0], [0.0, 0.0]])
    tm = jnp.zeros(2)
    hit, shade = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, KEY)
    em = np.asarray(emitted(shade, hit, texture_value(scene.textures, shade, hit, scene.stats.features)))
    # ray 0 from above: front -> emits; ray 1 from below: back -> black
    np.testing.assert_allclose(em[:, 0], 4.0)
    np.testing.assert_allclose(em[:, 1], 0.0)
    # no scatter from lights
    sc = scatter(shade, hit, texture_value(scene.textures, shade, hit, scene.stats.features), d, tm, KEY)
    assert not np.asarray(sc.has_scatter).any()


def test_flip_face_reverses_emission():
    b = SceneBuilder()
    pid = b.rect_xz(-1, 1, -1, 1, 0.0, b.diffuse_light((4.0, 4.0, 4.0)))
    b.flip_face(pid)
    scene = b.finalize()
    o = jnp.asarray([[0.0, 0.0], [1.0, -1.0], [0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0], [-1.0, 1.0], [0.0, 0.0]])
    tm = jnp.zeros(2)
    hit, shade = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, KEY)
    em = np.asarray(emitted(shade, hit, texture_value(scene.textures, shade, hit, scene.stats.features)))
    # flipped: now emits only from below (the Cornell one-sided light trick)
    np.testing.assert_allclose(em[:, 0], 0.0)
    np.testing.assert_allclose(em[:, 1], 4.0)


def test_lambertian_pdf_formula(rng):
    n = jnp.asarray(np.tile(np.array([[0.0], [1.0], [0.0]], dtype=np.float32), (1, 16)))
    dirs = rng.normal(size=(3, 16)).astype(np.float32)
    pdf = np.asarray(scattering_pdf_lambertian(n, jnp.asarray(dirs)))
    cos = dirs[1] / np.linalg.norm(dirs, axis=0)
    expect = np.where(cos < 0, 0.0, cos / np.pi)
    np.testing.assert_allclose(pdf, expect, rtol=1e-5, atol=1e-6)


def test_isotropic_scatters_uniformly():
    # direct check of the isotropic branch via a constant-medium material
    b = SceneBuilder()
    sph = b.sphere((0, 0, 0), 1, b.lambertian((1, 1, 1)))
    b.constant_medium([sph], 5.0, (0.3, 0.3, 0.3))
    scene = b.finalize()
    o = jnp.asarray(np.tile(np.array([[0.0], [0.0], [-3.0]], dtype=np.float32), (1, 256)))
    d = jnp.asarray(np.tile(np.array([[0.0], [0.0], [1.0]], dtype=np.float32), (1, 256)))
    tm = jnp.zeros(256)
    keys = jax.random.split(KEY, 2)
    hit, shade = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, keys[0])
    assert np.asarray(hit.hit).mean() > 0.9  # dense medium: almost all scatter inside
    assert np.asarray(hit.front).all()  # mediums set front_face=true
    sc = scatter(shade, hit, texture_value(scene.textures, shade, hit, scene.stats.features), d, tm, keys[1])
    assert np.asarray(sc.is_specular).all()
    v = np.asarray(sc.spec_dir)
    # uniform ball: mean ~ 0
    assert np.abs(v.mean(axis=1)).max() < 0.1
    np.testing.assert_allclose(
        np.asarray(sc.attenuation), 0.3, rtol=1e-5
    )
