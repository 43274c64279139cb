"""Native C++ host library vs the pure-Python oracles (obj parsing and
half-edge pairing; reference: Source/Meshing/ObjParser.cpp and
Mesh::CreateHalfEdges, Mesh.cpp:87-131)."""

import os

import numpy as np
import pytest

from hpsdf_tpu import native
from hpsdf_tpu.mesh.core import NotWatertightError, build_mesh
from hpsdf_tpu.mesh.obj import load_obj

from .util import cube_mesh, icosphere_mesh

REF_OBJ = "/root/reference/Resources/halfedge_fail.obj"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _write_obj(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


SYNTH = """# synthetic: all three face formats, a quad, negative indices
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
vn 0 0 1
vn 0 1 0
vt 0.5 0.5
f 1 2 3
f 1/1/1 2/1/2 4/1/1
f 1//2 3//1 4//2
f -4 -3 -2 -1
"""


def test_parse_synthetic_matches_python(tmp_path):
    p = _write_obj(tmp_path / "synth.obj", SYNTH)
    vn_, fn_, nn_ = load_obj(p, native=True)
    vp, fp, np_ = load_obj(p, native=False)
    np.testing.assert_array_equal(fn_, fp)
    np.testing.assert_allclose(vn_, vp)
    np.testing.assert_allclose(nn_, np_, atol=1e-12)
    assert fn_.dtype == np.int32 and vn_.dtype == np.float64


def test_parse_reference_asset_matches_python():
    if not os.path.exists(REF_OBJ):
        pytest.skip("reference asset missing")
    vn_, fn_, nn_ = load_obj(REF_OBJ, native=True)
    vp, fp, np_ = load_obj(REF_OBJ, native=False)
    np.testing.assert_array_equal(fn_, fp)
    np.testing.assert_allclose(vn_, vp)
    np.testing.assert_allclose(nn_, np_, atol=1e-12)
    assert fn_.shape[0] > 1000


@pytest.mark.parametrize("maker", [cube_mesh,
                                   lambda: icosphere_mesh(0.3, 3)])
def test_half_edges_match_python(maker, monkeypatch):
    v, f = maker()
    twins_native = native.half_edge_twins(np.asarray(f, np.int32), len(v))
    monkeypatch.setenv("HPSDF_NO_NATIVE", "1")
    # the env var is read at load time; force the numpy path via build_mesh
    # on a fresh import state by calling the fallback directly
    import hpsdf_tpu.native as nat
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", True)
    m = build_mesh(v, f)
    np.testing.assert_array_equal(twins_native.reshape(-1, 3), m.twin)


def test_half_edges_reject_open_mesh():
    v, f = cube_mesh()
    with pytest.raises(NotWatertightError):
        native.half_edge_twins(np.asarray(f, np.int32)[:-1], len(v))


def test_mesh_geom_native_matches_numpy():
    # native single-pass pseudo-normal precompute vs the vectorized numpy
    # oracle: same face normals, angle-weighted vertex pseudo-normals, and
    # edge pseudo-normals to f64 rounding.
    if not native.available():
        pytest.skip("native library unavailable")
    import hpsdf_tpu.native as nat

    v, f = icosphere_mesh(0.3, 3)
    m_nat = build_mesh(v, f)
    lib, tried = nat._lib, nat._tried
    try:
        nat._lib, nat._tried = None, True
        m_np = build_mesh(v, f)
    finally:
        nat._lib, nat._tried = lib, tried
    for name in ("face_normals", "vertex_pn", "edge_pn", "twin"):
        np.testing.assert_allclose(
            getattr(m_nat, name), getattr(m_np, name), atol=1e-12,
            err_msg=name)


def test_bvh_build_native_matches_numpy():
    # The whole native fast path (kd_order + pack_tri_rows + bvh_node_rows)
    # against the pure-numpy build: the ORDER may differ (nth_element vs
    # stable argsort on ties), so compare behaviorally -- node rows must be
    # exactly the heap unions of the packed leaf rows, and both BVHs must
    # return identical signed distances.
    import jax.numpy as jnp
    from hpsdf_tpu.mesh import bvh as B
    from hpsdf_tpu.mesh import sdf as msdf
    from hpsdf_tpu.mesh import tri as _tri

    if not native.available():
        pytest.skip("native library unavailable")
    v, f = icosphere_mesh(0.3, 3)
    m = build_mesh(v, f)
    bn = B.build_bvh(m)                     # native path
    tri_rows = np.asarray(bn.tri_rows)
    T2 = tri_rows.shape[0]

    # node rows == numpy heap unions of the same packed leaves
    tris = tri_rows[:, :9].reshape(T2, 3, 3).astype(np.float64)
    bmin, bmax = map(np.asarray, _tri.triangle_aabbs(tris))
    ref = np.zeros((T2, 16), np.float32)
    cm, cx = bmin, bmax
    first = T2 // 2
    while first >= 1:
        idx = np.arange(first, 2 * first)
        ref[idx, 0:3] = cm[0::2]
        ref[idx, 3:6] = cx[0::2]
        ref[idx, 6:9] = cm[1::2]
        ref[idx, 9:12] = cx[1::2]
        cm = np.minimum(cm[0::2], cm[1::2])
        cx = np.maximum(cx[0::2], cx[1::2])
        first //= 2
    np.testing.assert_array_equal(np.asarray(bn.node_rows), ref)

    # identical signed distances vs the numpy-built BVH
    import hpsdf_tpu.native as nat
    lib, tried = nat._lib, nat._tried
    try:
        nat._lib, nat._tried = None, True
        bp = B.build_bvh(m)                 # numpy path
    finally:
        nat._lib, nat._tried = lib, tried
    pts = jnp.asarray(
        np.random.default_rng(3).uniform(-0.5, 0.5, (256, 3)), jnp.float32)
    dn = np.asarray(msdf.signed_distance(bn, pts))
    dp = np.asarray(msdf.signed_distance(bp, pts))
    np.testing.assert_allclose(dn, dp, atol=1e-6)
