"""Geometry-parameter gradients through the ACCELERATED (Pallas BVH8) path.

VERDICT r4 item 3: gradients w.r.t. sphere centers/radii (sphere.rs:11-19)
and triangle vertices (triangle.rs:22-35) previously flowed only through the
unaccelerated cluster-walk recompute — the packet kernel's winner rows are
host-baked constants.  closest_hit now re-fetches the winner's param row
differentiably from scene.params (numerically identical to the baked row),
so d(image)/d(geometry) flows through the production trace_regen_diff path.

FD design note: pathwise (reparameterized) gradients of GEOMETRY carry only
the interior term — silhouette/occlusion shifts are discontinuity terms that
autodiff correctly drops, so a scene with visible silhouettes FD-disagrees
by construction.  The FD scenes below keep every silhouette outside the
frame (the target prim fills the view) and use the smooth sky-gradient
background as the direction-dependent light, so the image is a LOW-CURVATURE
smooth function of the perturbed parameter: geometry moves the shading
normal, the normal rotates the cosine-sampled bounce direction, and the sky
integral responds smoothly.  (A marble-noise emissive dome was tried first:
its 10*turb phase term oscillates with period ~0.03 in the parameter, so
central differences never converge at any usable eps.)

The Mosaic kernel needs real TPU; run with RT2022_TEST_TPU=1 on hardware.
On the CPU CI mesh the same tests exercise the cluster-walk recompute.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer2022_tpu import TraceConfig, make_camera
from raytracer2022_tpu.render.renderer import render_batch_regen_diff
from raytracer2022_tpu.scene.builder import SceneBuilder
from raytracer2022_tpu.scene.types import SPHERE, TRIANGLE

KEY = jax.random.PRNGKey(11)


def _sphere_scene():
    """A big lambertian sphere filling the view under the sky gradient, plus
    filler spheres (inside the target, never hit) to force a tree."""
    b = SceneBuilder()
    b.sphere((0.0, 0.0, 0.0), 3.0, b.lambertian((0.6, 0.5, 0.4)))  # target
    filler = b.lambertian((0.5, 0.5, 0.5))
    for i in range(20):
        b.sphere((0.0, 0.0, 0.0), 0.05 + 0.001 * i, filler)
    scene = b.finalize(bvh_threshold=16, cluster_size=8, bvh8_kinds=(SPHERE,))
    assert scene.use_bvh and scene.bvh8[0] is not None
    col = int(np.argmax(np.asarray(scene.params[3]) == 3.0))  # radius row
    cam = make_camera((0.0, 0.0, -4.5), (0.0, 0.0, 0.0), (0, 1, 0), 30, 1.0)
    return scene, cam, col


def _triangle_scene():
    """One lambertian triangle covering the whole frame (vertices outside
    the frustum, tilted so in-plane vertex moves DO rotate the normal —
    vertex sensitivity scales as 1/edge-length, so the triangle is kept
    small enough that the gradient stays well above f32 FD noise) under
    the sky gradient, plus far-away filler
    triangles behind it to force a tree."""
    b = SceneBuilder()
    # generic (tilted, unequal-z) vertices: an axis-aligned triangle's
    # normal is INDEPENDENT of in-plane vertex moves (zero true gradient)
    b.triangle((-6.0, -3.0, 2.8), (5.5, -2.6, 4.2), (0.3, 7.0, 2.2), b.lambertian((0.6, 0.5, 0.4)))
    filler = b.lambertian((0.5, 0.5, 0.5))
    rng = np.random.default_rng(5)
    for _ in range(20):
        c = rng.uniform(-3, 3, 3) + np.array([0.0, 0.0, 20.0])  # behind target
        b.triangle(c, c + rng.uniform(-1, 1, 3), c + rng.uniform(-1, 1, 3), filler)
    scene = b.finalize(bvh_threshold=16, cluster_size=8, bvh8_kinds=(TRIANGLE,))
    assert scene.use_bvh and scene.bvh8[0] is not None
    col = int(np.argmax(np.asarray(scene.params[0]) == -6.0))
    cam = make_camera((0.0, 0.0, -1.0), (0.0, 0.3, 3.0), (0, 1, 0), 25, 1.0)
    return scene, cam, col


def _geom_fd_check(scene, cam, row, col, eps):
    """FD-check d(mean image)/d(scene.params[row, col]) through the
    production differentiable regen integrator (use_pallas=True: on TPU the
    packet kernel traverses, on CPU the cluster walk — both stop-grad the
    discrete winner and recompute the continuous quantities from
    scene.params, so the same gradient convention holds on either
    backend)."""
    # spawn_eps 5e-3 >> FD eps: the walk SEARCHES baked geometry while the
    # recompute uses perturbed params, so a hit point can land up to eps
    # inside the baked surface; a spawn offset below that flips
    # self-intersections and swamps FD (measured: radius FD jumped to ~16)
    cfg = TraceConfig(max_depth=3, background=None, spawn_eps=5e-3)

    @jax.jit
    def f(params):
        s = scene.replace(params=params)
        img, cnt = render_batch_regen_diff(s, cam, KEY, 12, 12, 4, 8, 4 * 3 + 1, cfg)
        return jnp.mean(img / jnp.maximum(cnt, 1)[None])

    p0 = scene.params
    g = np.asarray(jax.jit(jax.grad(f))(p0))
    assert np.isfinite(g).all()
    gv = g[row, col]
    e = jnp.zeros_like(p0).at[row, col].set(eps)
    fd = (float(f(p0 + e)) - float(f(p0 - e))) / (2 * eps)
    assert abs(gv) > 1e-5, f"geometry gradient vanished: {gv}"
    # eps sweep (r5 devlog): at 5e-3 a handful of edge pixels flip
    # discretely (|pixel FD| up to 16); at 5e-4 FD converges to AD to ~5e-4
    # relative.  f32 rounding noise stays ~1e-4 absolute at this eps; atol
    # 3e-4 additionally covers jit-vs-eager fusion reassociation (measured
    # 2.3e-4 on the radius row).
    np.testing.assert_allclose(gv, fd, rtol=2e-2, atol=3e-4)


@pytest.mark.parametrize("row", [1, 3])
def test_sphere_geometry_gradient_bvh_scene(row):
    """d(image)/d(sphere center-y) (row 1) and /d(radius) (row 3) through
    the accelerated scene (sphere.rs:11-19 parameters)."""
    scene, cam, col = _sphere_scene()
    assert int(scene.kind[col]) == SPHERE
    _geom_fd_check(scene, cam, row, col, eps=5e-4)


def test_triangle_geometry_gradient_bvh_scene():
    """d(image)/d(triangle vertex a_y) through the accelerated scene
    (triangle.rs:22-35 parameters)."""
    scene, cam, col = _triangle_scene()
    assert int(scene.kind[col]) == TRIANGLE
    _geom_fd_check(scene, cam, 1, col, eps=2e-3)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic winner-row path needs real TPU (RT2022_TEST_TPU=1)",
)
@pytest.mark.parametrize("builder", [_sphere_scene, _triangle_scene])
def test_geometry_gradient_matches_cluster_walk_on_tpu(builder):
    """On hardware: the packet-kernel path's geometry gradient must equal
    the XLA cluster-walk path's (same estimator, same recompute formulas;
    only the discrete winner search differs and both stop-grad it)."""
    from raytracer2022_tpu.render.integrator import trace_regen_diff
    from raytracer2022_tpu.render.renderer import _regen_gen_rays

    scene, cam, col = builder()
    scene_nokernel = scene.replace(bvh8=(None,))
    cfg = TraceConfig(max_depth=3, background=None)  # sky gradient
    n = 12 * 12 * 4
    pix0 = jnp.arange(n, dtype=jnp.int32) % (12 * 12)
    gen = _regen_gen_rays(cam, 12, 12, n)

    def f(params, s):
        rad, done = trace_regen_diff(
            s.replace(params=params), gen, pix0, 8, 13, KEY, cfg, spp_par=4
        )
        return jnp.mean(rad) / 8.0

    g_kernel = np.asarray(jax.grad(f)(scene.params, scene))
    g_walk = np.asarray(jax.grad(f)(scene.params, scene_nokernel))
    # near-identical discrete winners => near-identical continuous
    # gradients.  atol covers isolated tie-break flips between the two
    # traversal implementations: one flipped lane shifts the mean-image
    # gradient by ~1/(12*12*4*8) x O(1) ~ 2e-4 (measured max 1.1e-4).
    np.testing.assert_allclose(g_kernel, g_walk, rtol=1e-3, atol=3e-4)
    # and the dominant entries must agree tightly in relative terms
    big = np.abs(g_walk) > 10 * np.abs(g_walk).max() / 100
    np.testing.assert_allclose(g_kernel[big], g_walk[big], rtol=2e-2)
