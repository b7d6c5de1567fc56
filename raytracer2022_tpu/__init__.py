"""raytracer2022_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/Pallas re-architecture with the full capability set of
the Rust "Ray Tracing in One Weekend" renderer Jerx2y/Raytracer-2022
(mounted read-only at /root/reference): all primitives (sphere, moving
sphere, axis rects, boxes, triangles, the custom Ring, constant mediums),
all materials (lambertian/metal/dielectric/diffuse-light/isotropic), all
textures (solid/checker/perlin-marble/image/per-triangle-uv), instance
wrappers, BVH acceleration, OBJ meshes, mixture-PDF importance sampling —
plus capabilities the reference lacks: differentiability w.r.t. materials
and camera, and multi-chip scaling over a jax.sharding Mesh.

Architecture: wavefront path tracing over SoA buffers (component-leading
(3, N) vectors for TPU lane efficiency), fixed-depth lax.scan bounce loop,
masked integer-kind dispatch instead of trait objects, host-compiled flat
scenes, and a flattened skip-link BVH.
"""

from .render.camera import Camera, get_rays, make_camera
from .render.film import linear_image, save_image, tonemap_u8
from .render.integrator import TraceConfig, trace
from .render.renderer import RenderConfig, render, render_sum
from .scene.builder import SceneBuilder
from .scene.types import SceneData

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "RenderConfig",
    "SceneBuilder",
    "SceneData",
    "TraceConfig",
    "get_rays",
    "linear_image",
    "make_camera",
    "render",
    "render_sum",
    "save_image",
    "tonemap_u8",
    "trace",
]
