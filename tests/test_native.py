"""C++ host-runtime bindings: OBJ parse and BVH build parity.

The native library (native/rt_native.cpp) mirrors the reference's Rust
host-side pipeline — tobj import (scene.rs:364-414) and BVH build
(hittable/bvh/mod.rs:30-81).  These tests check it against the pure-Python
fallbacks and the flattened-BVH structural contract.
"""

import numpy as np
import pytest

from raytracer2022_tpu import native
from raytracer2022_tpu.scene.bvh import build_bvh

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

SHUTTLE = "/root/reference/source/obj/Shuttle.obj"


def test_obj_native_matches_python(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "# comment\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0.5 0.5\nf 1/1 2/1 3/1 4/1\nf -1 -2 -3\n"
    )
    v, f, fuv = native.load_obj_native(str(obj))
    assert v.shape == (4, 3)
    # quad fan-triangulates to 2 faces + 1 negative-index face
    assert f.shape == (3, 3)
    assert f[0].tolist() == [0, 1, 2] and f[1].tolist() == [0, 2, 3]
    assert f[2].tolist() == [3, 2, 1]
    # uv channel: corners with "p/t" carry vt, bare "p" corners get 0
    assert fuv.shape == (3, 3, 2)
    np.testing.assert_allclose(fuv[0], 0.5)
    np.testing.assert_allclose(fuv[2], 0.0)


def test_obj_uv_native_matches_python(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0.1 0.2\nvt 0.9 0.2\nvt 0.1 0.8\n"
        "f 1/1 2/2 3/3\nf 1/3 2/2 3/1\n"
    )
    from raytracer2022_tpu.scene import objio

    v_n, f_n, uv_n = native.load_obj_native(str(obj))
    import os

    os.environ["RT2022_NO_NATIVE"] = "1"
    try:
        native._tried, native._lib = False, None
        v_p, f_p, uv_p = objio.load_obj(str(obj))
    finally:
        del os.environ["RT2022_NO_NATIVE"]
        native._tried, native._lib = False, None
    np.testing.assert_allclose(v_n, v_p)
    np.testing.assert_array_equal(f_n, f_p)
    np.testing.assert_allclose(uv_n, uv_p)
    np.testing.assert_allclose(uv_n[0], [[0.1, 0.2], [0.9, 0.2], [0.1, 0.8]])
    np.testing.assert_allclose(uv_n[1], [[0.1, 0.8], [0.9, 0.2], [0.1, 0.2]])


def test_obj_native_shuttle():
    import os

    if not os.path.exists(SHUTTLE):
        pytest.skip("reference Shuttle.obj not mounted")
    v, f, _ = native.load_obj_native(SHUTTLE)
    assert v.shape == (7174, 3)  # SURVEY.md §6: 7,174 verts / 13,079 tris
    assert f.shape == (13079, 3)
    assert f.min() >= 0 and f.max() < len(v)


def _structural_check(nodes, order, bmin, bmax, leaf_size):
    n = len(bmin)
    N = nodes["skip"].shape[0]
    assert sorted(order.tolist()) == list(range(n))
    assert (nodes["skip"] > np.arange(N)).all() and (nodes["skip"] <= N).all()
    leaf = nodes["leaf_count"] > 0
    assert nodes["leaf_count"][leaf].sum() == n
    assert nodes["leaf_count"].max() <= leaf_size
    # leaf windows tile [0, n) without overlap
    starts = nodes["leaf_start"][leaf]
    counts = nodes["leaf_count"][leaf]
    covered = np.zeros(n, dtype=int)
    for s, c in zip(starts, counts):
        covered[s : s + c] += 1
    assert (covered == 1).all()
    # every node bbox contains its subtree's prims (check all leaves)
    for i in np.where(leaf)[0]:
        ids = order[nodes["leaf_start"][i] : nodes["leaf_start"][i] + nodes["leaf_count"][i]]
        assert (bmin[ids] >= nodes["bmin"][:, i][None] - 1e-4).all()
        assert (bmax[ids] <= nodes["bmax"][:, i][None] + 1e-4).all()


@pytest.mark.parametrize("sah", [False, True])
def test_bvh_native_structure(rng, sah):
    P = 777
    c = rng.uniform(-50, 50, (P, 3))
    h = rng.uniform(0.1, 3, (P, 3))
    bmin = (c - h).astype(np.float32)
    bmax = (c + h).astype(np.float32)
    nodes, order = native.build_bvh_native(bmin, bmax, leaf_size=4, sah=sah)
    _structural_check(nodes, order, bmin, bmax, leaf_size=4)


def test_bvh_default_builder_uses_native(rng):
    P = 64
    c = rng.uniform(-50, 50, (P, 3))
    h = rng.uniform(0.1, 3, (P, 3))
    nodes, order = build_bvh((c - h).astype(np.float32), (c + h).astype(np.float32), leaf_size=4)
    _structural_check(nodes, order, (c - h), (c + h), leaf_size=4)
