"""Film: tone mapping and image assembly.

Reference: ``write_color`` (raytracer/src/main.rs:280-299) — NaN scrub on
the per-pixel *sum*, divide by spp, gamma-2 (sqrt), clamp to [0, 0.999],
scale by 255.999 and floor to u8.  Image assembly flips rows: pixel row y is
written at IMAGE_HEIGHT - y - 1 (main.rs:193-198).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def tonemap_u8(color_sum: jnp.ndarray, spp: int) -> jnp.ndarray:
    """(3, H, W) radiance sum -> u8[H, W, 3] sRGB-ish (write_color).

    ``color_sum`` rows are in render orientation (v up); the output is
    image orientation (row 0 at top), applying the reference's flip.
    """
    c = jnp.nan_to_num(color_sum, nan=0.0, posinf=0.0, neginf=0.0)
    c = jnp.sqrt(c / float(spp))
    c = jnp.clip(c, 0.0, 0.999) * 255.999
    img = jnp.floor(c).astype(jnp.uint8)
    img = jnp.transpose(img, (1, 2, 0))  # (H, W, 3)
    return img[::-1]  # vertical flip (main.rs:196)


def linear_image(color_sum: jnp.ndarray, spp: int) -> jnp.ndarray:
    """(3, H, W) radiance sum -> linear mean (3, H, W), NaN-scrubbed, flipped."""
    c = jnp.nan_to_num(color_sum, nan=0.0, posinf=0.0, neginf=0.0) / float(spp)
    return c[:, ::-1]


def save_image(path: str, img_u8) -> None:
    """Write a u8[H, W, 3] image (JPEG quality 100 like main.rs:213-221,
    or PNG by extension)."""
    from PIL import Image

    arr = np.asarray(img_u8)
    im = Image.fromarray(arr, mode="RGB")
    if path.lower().endswith((".jpg", ".jpeg")):
        im.save(path, quality=100)
    else:
        im.save(path)
