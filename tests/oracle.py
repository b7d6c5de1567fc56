"""NumPy oracle: straightforward scalar ports of the reference math
(raytracer/src/...), used only to verify the vectorized TPU kernels."""

from __future__ import annotations

import math

import numpy as np


def unit(v):
    return v / np.linalg.norm(v)


def onb_from_w(n):
    """onb.rs:26-36."""
    w = unit(np.asarray(n, dtype=np.float64))
    a = np.array([0.0, 1.0, 0.0]) if abs(w[0]) > 0.9 else np.array([1.0, 0.0, 0.0])
    v = unit(np.cross(w, a))
    u = np.cross(w, v)
    return u, v, w


def reflect(v, n):
    """vec.rs:119-121."""
    return v - n * np.dot(v, n) * 2.0


def refract(uv, n, etai_over_etat):
    """vec.rs:123-128."""
    cos_theta = min(np.dot(-uv, n), 1.0)
    r_out_perp = (uv + n * cos_theta) * etai_over_etat
    r_out_parallel = -n * math.sqrt(abs(1.0 - np.dot(r_out_perp, r_out_perp)))
    return r_out_perp + r_out_parallel


def sphere_hit(center, radius, o, d, t_min, t_max):
    """sphere.rs:39-66 -> t or None."""
    oc = o - center
    a = np.dot(d, d)
    half_b = np.dot(oc, d)
    c = np.dot(oc, oc) - radius * radius
    disc = half_b * half_b - a * c
    if disc < 0:
        return None
    sq = math.sqrt(disc)
    root = (-half_b - sq) / a
    if root < t_min or t_max < root:
        root = (-half_b + sq) / a
        if root < t_min or t_max < root:
            return None
    return root


def sphere_uv(p):
    """sphere.rs:30-34 on the outward unit normal."""
    theta = math.acos(max(-1.0, min(1.0, -p[1])))
    phi = math.atan2(-p[2], p[0]) + math.pi
    return phi / (2 * math.pi), theta / math.pi


def rect_hit(axes, a0, a1, b0, b1, k, o, d, t_min, t_max):
    """aarect.rs hit; axes = (a_axis, b_axis, k_axis)."""
    aa, bb, ka = axes
    if d[ka] == 0:
        return None
    t = (k - o[ka]) / d[ka]
    if t < t_min or t > t_max:
        return None
    av = o[aa] + t * d[aa]
    bv = o[bb] + t * d[bb]
    if av < a0 or av > a1 or bv < b0 or bv > b1:
        return None
    return t


def triangle_hit(a, b, c, o, d, t_min, t_max):
    """triangle.rs:51-63."""
    n = unit(np.cross(b - a, c - a))
    denom = np.dot(d, n)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.dot(a - o, n) / denom
    if math.isnan(t) or t < t_min or t > t_max:
        return None
    p = o + d * t
    ins = (
        np.dot(np.cross(c - a, p - a), np.cross(c - a, b - a)) >= 0
        and np.dot(np.cross(a - b, p - b), np.cross(a - b, c - b)) >= 0
        and np.dot(np.cross(b - c, p - c), np.cross(b - c, a - c)) >= 0
    )
    return t if ins else None


def triangle_bary(a, b, c, p):
    """triangle.rs:65-72 beta/gamma."""
    a1 = a[0] - b[0]
    b1 = a[0] - c[0]
    c1 = a[0] - p[0]
    a2 = a[1] - b[1]
    b2 = a[1] - c[1]
    c2 = a[1] - p[1]
    beta = (c1 * b2 - b1 * c2) / (a1 * b2 - b1 * a2)
    gama = (a1 * c2 - a2 * c1) / (a1 * b2 - b1 * a2)
    return beta, gama


def ring_hit(r, th, o, d, t_min, t_max):
    """ring.rs:36-52."""
    if d[1] == 0:
        return None
    t = -o[1] / d[1]
    if math.isnan(t) or t < t_min or t > t_max:
        return None
    p = o + d * t
    dd = p[0] ** 2 + p[2] ** 2
    if dd < (r - th) ** 2 or dd > (r + th) ** 2:
        return None
    return t


def aabb_hit(bmin, bmax, o, d, t_min, t_max):
    """aabb.rs:15-32."""
    for i in range(3):
        inv_d = 1.0 / d[i] if d[i] != 0 else math.inf
        t0 = (bmin[i] - o[i]) * inv_d
        t1 = (bmax[i] - o[i]) * inv_d
        if inv_d < 0:
            t0, t1 = t1, t0
        t_min = max(t_min, t0)
        t_max = min(t_max, t1)
        if t_max <= t_min:
            return False
    return True


def perlin_noise(randvec, perms, p):
    """perlin.rs:52-99 including the double-Hermite quirk."""

    def herm(x):
        return x * x * (3.0 - 2.0 * x)

    u = herm(p[0] - math.floor(p[0]))
    v = herm(p[1] - math.floor(p[1]))
    w = herm(p[2] - math.floor(p[2]))
    i = math.floor(p[0])
    j = math.floor(p[1])
    k = math.floor(p[2])
    uu, vv, ww = herm(u), herm(v), herm(w)
    accum = 0.0
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                idx = (
                    perms[0][(int(i) + di) & 255]
                    ^ perms[1][(int(j) + dj) & 255]
                    ^ perms[2][(int(k) + dk) & 255]
                )
                g = randvec[:, idx]
                weight_v = np.array([u - di, v - dj, w - dk])
                accum += (
                    np.dot(g, weight_v)
                    * (di * uu + (1 - di) * (1.0 - uu))
                    * (dj * vv + (1 - dj) * (1.0 - vv))
                    * (dk * ww + (1 - dk) * (1.0 - ww))
                )
    return accum


def perlin_turb(randvec, perms, p, depth=7):
    """perlin.rs:100-112."""
    accum = 0.0
    tmp = np.asarray(p, dtype=np.float64).copy()
    weight = 1.0
    for _ in range(depth):
        accum += weight * perlin_noise(randvec, perms, tmp)
        weight *= 0.5
        tmp = tmp * 2.0
    return abs(accum)
