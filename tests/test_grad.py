"""Finite-difference gradient checks (BASELINE north star: pixel gradients
w.r.t. albedo/emission/camera must pass FD)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer2022_tpu import TraceConfig, make_camera
from raytracer2022_tpu.render.renderer import render_batch
from raytracer2022_tpu.scene.builder import SceneBuilder

KEY = jax.random.PRNGKey(3)


def _mini_cornell():
    b = SceneBuilder()
    light = b.rect_xz(-1, 1, -1, 1, 3.9, b.diffuse_light((8.0, 8.0, 8.0)))
    b.flip_face(light)
    b.add_light(light)
    b.rect_xz(-4, 4, -4, 4, 0.0, b.lambertian((0.6, 0.4, 0.3)))
    b.sphere((0, 1, 0), 1, b.lambertian((0.3, 0.5, 0.7)))
    return b.finalize()


def _loss_fn(scene, cam, cfg, spp=32):
    img = render_batch(scene, cam, KEY, 12, 12, spp, cfg)
    return jnp.mean(img) / spp


def test_albedo_gradient_finite_difference():
    scene = _mini_cornell()
    cam = make_camera((0, 2, -8), (0, 1, 0), (0, 1, 0), 40, 1.0)
    cfg = TraceConfig(max_depth=6, background=(0.0, 0.0, 0.0))

    @jax.jit
    def f(color_table):
        return _loss_fn(scene.replace(textures=scene.textures.replace(color=color_table)), cam, cfg)

    c0 = scene.textures.color
    g = jax.grad(f)(c0)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # FD check on the floor albedo's red channel (texture id of floor mat)
    # material table order is creation order (prims are kind-permuted):
    # 0 = light, 1 = floor lambertian, 2 = sphere lambertian
    floor_tex = int(scene.materials.tex[1])
    eps = 1e-2
    e = jnp.zeros_like(c0).at[0, floor_tex].set(eps)
    fd = (f(c0 + e) - f(c0 - e)) / (2 * eps)
    # same RNG -> correlated estimates; FD of the piecewise-linear estimator
    # matches autodiff tightly
    np.testing.assert_allclose(g[0, floor_tex], float(fd), rtol=2e-2, atol=1e-5)
    assert g[0, floor_tex] > 0  # brighter floor -> brighter image


def test_emission_gradient_finite_difference():
    scene = _mini_cornell()
    cam = make_camera((0, 2, -8), (0, 1, 0), (0, 1, 0), 40, 1.0)
    cfg = TraceConfig(max_depth=6, background=(0.0, 0.0, 0.0))
    light_tex = int(scene.materials.tex[0])

    @jax.jit
    def f(color_table):
        return _loss_fn(scene.replace(textures=scene.textures.replace(color=color_table)), cam, cfg)

    c0 = scene.textures.color
    g = np.asarray(jax.grad(f)(c0))
    eps = 1e-1
    e = jnp.zeros_like(c0).at[1, light_tex].set(eps)
    fd = (f(c0 + e) - f(c0 - e)) / (2 * eps)
    np.testing.assert_allclose(g[1, light_tex], float(fd), rtol=2e-2, atol=1e-6)
    assert g[1, light_tex] > 0  # brighter light -> brighter image


def test_regen_diff_albedo_gradient_finite_difference():
    """The production differentiable integrator (trace_regen_diff) must give
    the same FD-verified albedo gradients as the scan path."""
    from raytracer2022_tpu.render.renderer import render_batch_regen_diff

    scene = _mini_cornell()
    cam = make_camera((0, 2, -8), (0, 1, 0), (0, 1, 0), 40, 1.0)
    cfg = TraceConfig(max_depth=6, background=(0.0, 0.0, 0.0))

    @jax.jit
    def f(color_table):
        s = scene.replace(textures=scene.textures.replace(color=color_table))
        img, cnt = render_batch_regen_diff(s, cam, KEY, 12, 12, 4, 8, 4 * 6 + 1, cfg)
        return jnp.mean(img / cnt[None])

    c0 = scene.textures.color
    g = np.asarray(jax.grad(f)(c0))
    assert np.isfinite(g).all()
    floor_tex = int(scene.materials.tex[1])
    eps = 1e-2
    e = jnp.zeros_like(c0).at[0, floor_tex].set(eps)
    fd = (f(c0 + e) - f(c0 - e)) / (2 * eps)
    np.testing.assert_allclose(g[0, floor_tex], float(fd), rtol=2e-2, atol=1e-5)
    assert g[0, floor_tex] > 0


def test_albedo_gradient_through_bvh_scene_finite_difference():
    """Gradients through an ACCELERATED scene (cluster-tree traversal):
    the lockstep walk's while_loop is not reverse-differentiable, so
    closest_hit stop-grads the discrete winner search and recomputes the
    winner's hit distance differentiably (r4).  FD-verify albedo through
    the scan integrator on a 64-triangle tree scene — before r4 this
    raised ValueError (latent: every earlier grad test was dense-only)."""
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    light = b.rect_xz(-3, 3, -3, 3, 10.0, b.diffuse_light((6.0, 6.0, 6.0)))
    b.flip_face(light)
    b.add_light(light)
    mat = b.lambertian((0.6, 0.5, 0.4))
    for _ in range(64):
        c = rng.uniform(-6, 6, 3) * np.array([1.0, 0.2, 1.0])
        b.triangle(c, c + rng.uniform(-2, 2, 3), c + rng.uniform(-2, 2, 3), mat)
    scene = b.finalize(bvh_threshold=16, cluster_size=32)
    assert scene.use_bvh
    cam = make_camera((0, 8, -10), (0, 0, 0), (0, 1, 0), 45, 1.0)
    cfg = TraceConfig(max_depth=4, background=(0.0, 0.0, 0.0))
    tri_tex = int(scene.materials.tex[int(np.argmax(np.asarray(scene.materials.kind) == 0))])

    @jax.jit
    def f(color_table):
        s = scene.replace(textures=scene.textures.replace(color=color_table))
        img = render_batch(s, cam, KEY, 12, 12, 32, cfg)
        return jnp.mean(img) / 32

    c0 = scene.textures.color
    g = np.asarray(jax.grad(f)(c0))
    assert np.isfinite(g).all() and g[0, tri_tex] > 0
    eps = 1e-2
    e = jnp.zeros_like(c0).at[0, tri_tex].set(eps)
    fd = (float(f(c0 + e)) - float(f(c0 - e))) / (2 * eps)
    np.testing.assert_allclose(g[0, tri_tex], float(fd), rtol=2e-2, atol=1e-5)


def test_camera_gradient_finite_difference():
    """Camera lookfrom gradient vs central finite differences (VERDICT r3
    item 6: an FD assertion, not just finite+nonzero).

    The scene is built to make f(lookfrom) SMOOTH — a marble-noise floor
    extending beyond the frustum under an edgeless emissive dome — because
    pathwise autodiff computes the derivative of the integrand, which
    equals the derivative of the integral only away from silhouette jumps
    (on Cornell the FD signal is swamped by the boxes' edges sweeping
    across pixels).  Geometry is kept SMALL and the view near-perpendicular
    so hit points move slowly with lookfrom: with far-away grazing hits the
    7-octave marble makes f oscillate on scales below any usable eps and
    central differences alias.  Depth 2: camera -> textured floor -> dome,
    so f = 2 * mean(marble(p(y))) exactly — a smooth composition."""
    b = SceneBuilder()
    dome = b.sphere((0, 0, 0), 50, b.diffuse_light((2.0, 2.0, 2.0)))
    b.flip_face(dome)
    b.rect_xz(-30, 30, -30, 30, 0.0, b.lambertian(b.noise(0.5)))
    scene = b.finalize()
    # unroll=True: 2 python-looped bounces instead of the checkpointed scan
    # — same estimator, much smaller reverse-mode graph (this test is
    # COMPILE-bound on the CPU mesh: the 7-octave marble's AD graph)
    cfg = TraceConfig(max_depth=2, background=(0.0, 0.0, 0.0), unroll=True)

    def f(lookfrom_y):
        cam = make_camera((0.0, lookfrom_y, -2.0), (0.0, 0.0, -1.9), (0, 1, 0), 30, 1.0)
        return _loss_fn(scene, cam, cfg, spp=32)

    g = float(jax.grad(f)(8.0))
    assert np.isfinite(g) and abs(g) > 1e-6
    eps = 1e-3
    fd = (float(f(8.0 + eps)) - float(f(8.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=5e-2, atol=1e-6)


def test_fuzz_gradient_finite_difference():
    """Metal fuzz gradient vs central FD (material/mod.rs:85-96).  Fuzz
    perturbs the reflected direction continuously (reparameterized in-ball
    jitter); for the pathwise gradient to be NONZERO the radiance reaching
    the metal must vary smoothly with direction.  The SKY GRADIENT serves
    as that smooth envmap (r5: a marble-noise emissive dome did the same
    job with a 3x larger, compile-dominated reverse graph; a
    constant-emission environment would give an exactly-zero pathwise fuzz
    gradient).  eps sweep: at 5e-3+ the scaled jitter ball crosses the
    sphere's self-reflection silhouette and FD blows up; 2e-3 agrees to
    ~4%."""
    b = SceneBuilder()
    b.sphere((0, 0, 0), 1, b.metal((0.9, 0.9, 0.9), 0.3))
    scene = b.finalize()
    cam = make_camera((0, 1.5, -4), (0, 0, 0), (0, 1, 0), 30, 1.0)
    cfg = TraceConfig(max_depth=3, background=None)  # sky gradient
    metal_mat = int(np.argmax(np.asarray(scene.materials.kind) == 1))

    @jax.jit
    def f(param):
        return _loss_fn(
            scene.replace(materials=scene.materials.replace(param=param)), cam, cfg, spp=64
        )

    p0 = scene.materials.param
    g = np.asarray(jax.grad(f)(p0))
    assert np.isfinite(g).all() and abs(g[metal_mat]) > 1e-4
    eps = 2e-3
    e = jnp.zeros_like(p0).at[metal_mat].set(eps)
    fd = (float(f(p0 + e)) - float(f(p0 - e))) / (2 * eps)
    np.testing.assert_allclose(g[metal_mat], fd, rtol=0.1, atol=1e-5)


def test_ir_gradient_finite_difference():
    """Dielectric IOR gradient vs central FD (material/mod.rs:120-147).

    Full-estimator FD is NOT well-posed for ir: the stochastic Schlick
    reflect/refract pick (mod.rs:134-137) flips discretely as reflectance
    crosses each sample's fixed uniform draw, and one flip at 12x12x32
    shifts the FD by ~0.2 while pathwise autodiff (correctly, by the
    reparameterization convention the fit relies on) drops those Bernoulli
    jump terms — measured: the flip-term dominates the smooth part at
    every usable eps.  So the FD assertion targets the DERIVATIVE
    MACHINERY on the flip-free set: d(scattered direction)/d(ir) through
    the full closest_hit -> scatter pipeline, masked to lanes whose
    branch choice is identical at ir +- eps (the mask is a fixed
    constant, so both sides differentiate the same smooth function).
    The render-level gradient is additionally asserted finite+nonzero."""
    from raytracer2022_tpu.ops.intersect import closest_hit
    from raytracer2022_tpu.ops.materials import scatter, texture_value

    b = SceneBuilder()
    b.rect_xz(-8, 8, -8, 8, 2.0, b.dielectric(1.5))
    scene = b.finalize()
    diel_mat = int(np.argmax(np.asarray(scene.materials.kind) == 2))
    p0 = scene.materials.param

    n = 256
    k = jax.random.PRNGKey(5)
    o = jnp.tile(jnp.asarray([[3.0], [6.0], [-3.0]]), (1, n))
    t = jax.random.normal(k, (3, n)) * jnp.asarray([[2.0], [0.0], [2.0]])
    d = t + jnp.asarray([[0.0], [2.0], [0.5]]) - o
    tm = jnp.zeros(n)
    probe = jax.random.normal(jax.random.fold_in(k, 1), (3, n))

    @jax.jit
    def spec_dirs(param):
        s = scene.replace(materials=scene.materials.replace(param=param))
        hit, shade = closest_hit(s, o, d, tm, 1e-3, jnp.inf, k)
        tex = texture_value(s.textures, shade, hit, s.stats.features)
        sc = scatter(shade, hit, tex, d, tm, jax.random.fold_in(k, 2))
        return jnp.where((hit.hit & sc.is_specular)[None], sc.spec_dir, 0.0)

    eps = 1e-3
    e = jnp.zeros_like(p0).at[diel_mat].set(eps)
    d_plus = np.asarray(spec_dirs(p0 + e))
    d_minus = np.asarray(spec_dirs(p0 - e))
    # flip-free lanes: the reflect/refract choice did not change under eps
    mask = jnp.asarray(np.linalg.norm(d_plus - d_minus, axis=0) < 0.1)
    assert float(mask.sum()) > 50  # plenty of refracting lanes survive

    @jax.jit
    def f(param):
        return jnp.sum(jnp.where(mask[None], spec_dirs(param) * probe, 0.0))

    g = float(jax.grad(f)(p0)[diel_mat])
    fd = (float(f(p0 + e)) - float(f(p0 - e))) / (2 * eps)
    assert abs(g) > 1e-3
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=1e-4)

    # render-level: the ir gradient through the full bounce loop is finite
    # and nonzero (the refracted direction sweeps the smooth sky gradient
    # as ir changes; r5 dropped the marble floor — compile-dominated)
    cam = make_camera((3, 6, -3), (0, 0, 0.5), (0, 1, 0), 35, 1.0)
    cfg = TraceConfig(max_depth=3, background=None)

    def loss(param):
        return _loss_fn(
            scene.replace(materials=scene.materials.replace(param=param)), cam, cfg
        )

    gr = np.asarray(jax.jit(jax.grad(loss))(p0))
    assert np.isfinite(gr).all() and abs(gr[diel_mat]) > 1e-5


def test_regen_diff_drain_gradient_and_estimator():
    """The two-phase (pooled + narrow-drain cascade) differentiable
    integrator (r5): estimator consistent with the single-phase form and
    FD-verified albedo gradients through the drain scatter-add."""
    from raytracer2022_tpu.render.renderer import render_batch_regen_diff

    scene = _mini_cornell()
    cam = make_camera((0, 2, -8), (0, 1, 0), (0, 1, 0), 40, 1.0)
    cfg = TraceConfig(max_depth=6, background=(0.0, 0.0, 0.0))

    # estimator: the drain arm vs the SAME budget without a drain — the
    # first 20 iterations are identical (same key, same schedule), the
    # drain only COMPLETES the in-flight samples truncation would drop,
    # so the done-normalized means are tightly correlated
    img1, cnt1 = render_batch_regen_diff(
        scene, cam, KEY, 12, 12, 4, 8, 20, cfg, n_drain=6
    )
    img0, cnt0 = render_batch_regen_diff(scene, cam, KEY, 12, 12, 4, 8, 20, cfg)
    m1 = np.asarray(img1) / np.maximum(np.asarray(cnt1), 1)
    m0 = np.asarray(img0) / np.maximum(np.asarray(cnt0), 1)
    assert np.asarray(cnt1).mean() > 0.95 * 32  # drain completes ~all samples
    assert (np.asarray(cnt1) >= np.asarray(cnt0)).all()  # drain only adds
    np.testing.assert_allclose(m1.mean(), m0.mean(), rtol=2e-2)

    @jax.jit
    def f(color_table):
        s = scene.replace(textures=scene.textures.replace(color=color_table))
        img, cnt = render_batch_regen_diff(
            s, cam, KEY, 12, 12, 4, 8, 18, cfg, n_drain=6
        )
        return jnp.mean(img / jnp.maximum(cnt, 1)[None])

    c0 = scene.textures.color
    g = np.asarray(jax.grad(f)(c0))
    assert np.isfinite(g).all()
    floor_tex = int(scene.materials.tex[1])
    eps = 1e-2
    e = jnp.zeros_like(c0).at[0, floor_tex].set(eps)
    fd = (float(f(c0 + e)) - float(f(c0 - e))) / (2 * eps)
    np.testing.assert_allclose(g[0, floor_tex], float(fd), rtol=2e-2, atol=1e-5)
