"""Batched 3-vector math on component-leading ``f32[3, ...]`` arrays.

TPU-native replacement for the reference's scalar ``Vec3`` class
(reference: raytracer/src/basic/vec.rs:12-128).  There is no vector *class*:
a batch of points/colors/directions is a single array of shape ``(3, *batch)``
with the component axis LEADING.  This is deliberate TPU layout design: the
large batch axis lands on the 128-wide vector lanes, while a trailing
``(..., 3)`` axis would waste 125/128 lanes of every VPU register and VMEM
tile.  All ops are elementwise over the batch dims and fuse in XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def vec3(x, y, z) -> jnp.ndarray:
    """Stack three equal-shape component arrays into a ``(3, *batch)`` vector."""
    return jnp.stack([x, y, z], axis=0)


def safe_div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a / b`` with a 1-denominator on b==0 lanes.

    Gradient-safety helper: masked-out lanes must not compute inf/NaN
    primals, or the VJP of the surrounding ``jnp.where`` poisons gradients
    (0 * inf = NaN).  Callers must mask the b==0 lanes out of validity
    themselves.
    """
    return a / jnp.where(b == 0.0, 1.0, b)


def masked_sqrt(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """sqrt evaluated only on valid lanes (1 elsewhere).

    Avoids sqrt'(0) = inf on clamped-to-zero lanes contaminating gradients.
    """
    return jnp.sqrt(jnp.where(valid, x, 1.0))


def from_xyz(x: float, y: float, z: float, dtype=jnp.float32) -> jnp.ndarray:
    """A single constant vector of shape ``(3,)``."""
    return jnp.array([x, y, z], dtype=dtype)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the leading axis (vec.rs:24-26). Returns ``f32[...]``."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the leading axis (vec.rs:28-34)."""
    return vec3(
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def length_sqr(a: jnp.ndarray) -> jnp.ndarray:
    """Squared length (vec.rs:36-38)."""
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    """Euclidean length (vec.rs:40-42)."""
    return jnp.sqrt(length_sqr(a))


def scale(a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Multiply a ``(3, *batch)`` vector by a ``[...]``-shaped scalar field."""
    return a * s[None]


def to_unit(a: jnp.ndarray) -> jnp.ndarray:
    """Normalize to unit length (vec.rs:44-46).

    Like the reference, a zero vector divides by zero and produces non-finite
    components rather than being silently fixed up.
    """
    return scale(a, 1.0 / length(a))


def near_zero(a: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """True where all components are < eps in magnitude (vec.rs:63-66)."""
    return (jnp.abs(a[0]) < eps) & (jnp.abs(a[1]) < eps) & (jnp.abs(a[2]) < eps)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of ``v`` about normal ``n`` (vec.rs:119-121)."""
    return v - scale(n, 2.0 * dot(v, n))


def refract(uv: jnp.ndarray, n: jnp.ndarray, etai_over_etat: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of unit direction ``uv`` about ``n`` (vec.rs:123-128).

    ``etai_over_etat`` is a ``[...]``-shaped scalar field.
    """
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_out_perp = scale(uv + scale(n, cos_theta), etai_over_etat)
    # tiny floor keeps sqrt' finite at exactly-critical angles (grad safety)
    r_out_parallel = scale(
        -n, jnp.sqrt(jnp.maximum(jnp.abs(1.0 - length_sqr(r_out_perp)), 1e-12))
    )
    return r_out_perp + r_out_parallel


def ray_at(orig: jnp.ndarray, direction: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Point along a ray: ``orig + t * dir`` (reference ray.rs:18-20)."""
    return orig + scale(direction, t)


def onb_from_w(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Branchless orthonormal basis about ``n`` (reference onb.rs:26-36).

    Returns ``(u, v, w)`` with the exact construction of the reference:
    ``a = (0,1,0) if |w.x| > 0.9 else (1,0,0)``; ``v = unit(w x a)``;
    ``u = w x v`` — vectorized with ``jnp.where`` instead of a branch.
    """
    w = to_unit(n)
    use_y = jnp.abs(w[0]) > 0.9
    zeros = jnp.zeros_like(w[0])
    ones = jnp.ones_like(w[0])
    a = vec3(jnp.where(use_y, zeros, ones), jnp.where(use_y, ones, zeros), zeros)
    v = to_unit(cross(w, a))
    u = cross(w, v)
    return u, v, w


def onb_local(u: jnp.ndarray, v: jnp.ndarray, w: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Transform local coords ``a`` into the (u,v,w) basis (onb.rs:22-24)."""
    return scale(u, a[0]) + scale(v, a[1]) + scale(w, a[2])
