"""Wavefront ray sorting: restore coherence between bounces.

The reference never needs this: its 8 CPU threads each trace one whole path
recursively, so cache locality follows the path (reference:
raytracer/src/main.rs:140-153).  A TPU wavefront is the transpose — after
one bounce the N in-flight rays point every which way, and any
block-shared acceleration-structure walk (ops/intersect.traverse_clusters)
degenerates to visiting the union of every lane's clusters.

TPU-native fix: once per bounce, sort the whole wavefront by a coarse
spatial+directional key so neighboring lanes trace similar rays again.
Sorting is done with ONE multi-operand ``lax.sort`` that carries every
per-lane state row as payload — a bitonic network of vectorized
compare-exchanges, no per-element gathers anywhere (gathers are the TPU
anti-pattern; a permutation apply via ``take`` would cost more than the
sort itself).  Each lane carries its pixel id as one of the payloads, so
lanes are re-grouped by pixel with one final sort when tracing ends.

Key layout (i32, compared ascending):
  [octant:3 | morton:3*MORTON_BITS] — direction octant first (rays going the
  same way share front-to-back cluster order), then an interleaved Morton
  code of the origin quantized against the static scene bounding box.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

MORTON_BITS = 4  # per-axis origin bits; 3*4+3 = 15 key bits total


def _part_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Spread MORTON_BITS low bits of x so there are 2 zero bits between
    each (classic Morton spreading, specialized to 4 bits)."""
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_key(o: jnp.ndarray, d: jnp.ndarray, bmin, bmax) -> jnp.ndarray:
    """Coherence key per lane -> i32[N].

    ``bmin``/``bmax`` are static python 3-tuples (the scene's world bounds,
    SceneStats.world_bounds) so the quantization is compile-time constant.
    """
    n_cells = (1 << MORTON_BITS) - 1
    key = jnp.zeros(o.shape[1], dtype=jnp.int32)
    for a in range(3):
        lo, hi = float(bmin[a]), float(bmax[a])
        scale = n_cells / (hi - lo) if hi > lo else 0.0
        q = jnp.clip(((o[a] - lo) * scale).astype(jnp.int32), 0, n_cells)
        key = key | (_part_bits(q) << a)
    octant = (
        (d[0] >= 0.0).astype(jnp.int32)
        | ((d[1] >= 0.0).astype(jnp.int32) << 1)
        | ((d[2] >= 0.0).astype(jnp.int32) << 2)
    )
    return (octant << (3 * MORTON_BITS)) | key


def sort_by_key(key: jnp.ndarray, payload: tuple) -> tuple:
    """Sort every payload row by ``key`` (ascending) -> reordered payloads.

    One fused bitonic sort over lanes; returns payloads in input order.
    """
    out = lax.sort((key, *payload), dimension=0, is_stable=False, num_keys=1)
    return out[1:]
