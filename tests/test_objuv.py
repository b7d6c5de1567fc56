"""ObjTexture (TEX_OBJUV) end-to-end: OBJ vt -> triangle uv params ->
barycentric tex_uv in the hit record -> atlas sample (reference
texture/mod.rs:141-189, scene.rs:368-375)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer2022_tpu.ops.intersect import closest_hit
from raytracer2022_tpu.ops.materials import texture_value
from raytracer2022_tpu.scene.builder import SceneBuilder


def _checker_image(n=8):
    """n x n red/blue checkerboard u8 image."""
    img = np.zeros((n, n, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:n, 0:n]
    img[(yy + xx) % 2 == 0] = [255, 0, 0]
    img[(yy + xx) % 2 == 1] = [0, 0, 255]
    return img


def test_objuv_barycentric_interpolation_and_sample():
    b = SceneBuilder()
    tex = b.objuv(_checker_image())
    mat = b.lambertian(tex)
    # triangle spanning uv space: corner uvs (0,0), (1,0), (0,1)
    b.triangle((0, 0, 0), (2, 0, 0), (0, 2, 0), mat, uv=((0, 0), (1, 0), (0, 1)))
    scene = b.finalize()

    # rays straight down +z onto barycentric points (beta, gamma)
    pts = np.array([[0.25, 0.25], [0.9, 0.05], [0.05, 0.9], [0.1, 0.1]])
    n = len(pts)
    o = jnp.asarray(np.stack([2 * pts[:, 0], 2 * pts[:, 1], -np.ones(n)]), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [1.0]]), (3, n))
    tm = jnp.zeros(n)
    hit, shade = closest_hit(scene, o, d, tm, 1e-3, jnp.inf, jax.random.PRNGKey(0))
    assert bool(hit.hit.all())
    # HitRecord u,v = (beta, gamma) (triangle.rs:65-72); tex_uv = barycentric
    # interpolation of the corner uvs == (beta, gamma) for this uv layout
    np.testing.assert_allclose(np.asarray(hit.u), pts[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.v), pts[:, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.tex_uv).T, pts, atol=1e-5)

    val = np.asarray(texture_value(scene.textures, shade, hit, scene.stats.features))
    # oracle: ObjTexture indexes i = u*W, j_from_top = (1-v)*H into the raw
    # image (texture/mod.rs:176-186)
    img = _checker_image()
    h, w = img.shape[:2]
    for k, (u, v) in enumerate(pts):
        i = min(int(u * w), w - 1)
        j = min(int((1 - v) * h), h - 1)
        np.testing.assert_allclose(val[:, k], img[j, i] / 255.999, atol=1e-3)


def test_objuv_demo_scene_renders():
    """The obj_uv_demo scene must produce visibly textured (multi-colored)
    triangles through the full render path."""
    import jax

    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.render.renderer import render_batch
    from raytracer2022_tpu.scene.library import obj_uv_demo

    bundle = obj_uv_demo()
    assert "objuv" in bundle.scene.stats.features
    cam = make_camera(**bundle.camera_kwargs)
    cfg = RenderConfig(width=24, height=24, spp=4, max_depth=3, background=bundle.background)
    img = np.asarray(
        render_batch(bundle.scene, cam, jax.random.PRNGKey(0), 24, 24, 4, cfg.trace_cfg())
    )
    assert np.isfinite(img).all()
    # earth texture: green/blue variation across the quad, not a flat color
    center = img[:, 8:16, 8:16]
    assert center.std() > 0.01
