"""Reference-scale meshing: procedural generators, kd-ordered BVH quality,
and the hybrid (cluster-pruned) signed-distance path.

The reference benchmarks its meshing stack on a 1.6M-triangle asset
(Source/Tests/MeshingBenchmarks.cpp:24-111) absent from the mount; these
tests exercise the same pipeline on generated meshes and pin the hybrid
path's exactness guarantee against the brute-force oracle (the reference's
own differential pattern, MeshingUnitTests.cpp:110-138).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hpsdf_tpu.mesh import gen, build_bvh
from hpsdf_tpu.mesh.core import build_mesh
from hpsdf_tpu.mesh import sdf as msdf


@pytest.fixture(scope="module")
def bumpy():
    v, f = gen.bumpy_sphere(0.3, 5)          # 20,480 triangles
    mesh = build_mesh(v, f)                   # watertight or this raises
    return mesh, build_bvh(mesh)


def test_generators_watertight_and_sized():
    for sub, want in ((3, 1280), (5, 20480)):
        v, f = gen.icosphere(0.3, sub)
        assert f.shape[0] == want
        build_mesh(v, f)                      # watertightness check
    v, f = gen.bumpy_sphere(0.25, 4, amplitude=0.2)
    assert f.shape[0] == 5120
    build_mesh(v, f)


def test_save_obj_roundtrip(tmp_path):
    from hpsdf_tpu.mesh.obj import load_obj
    v, f = gen.icosphere(0.3, 3)
    path = str(tmp_path / "ico.obj")
    gen.save_obj(path, v, f)
    v2, f2, _ = load_obj(path)
    assert np.array_equal(f2, f)
    np.testing.assert_allclose(v2, v, atol=1e-6)


def test_kd_order_heap_boxes_tight(bumpy):
    """Every pow2-aligned heap range must be a compact box: the median
    cluster diagonal must be far below the mesh diameter (the round-1
    Morton-run layout measured 0.23 of a 0.6-diameter mesh here)."""
    _, bvh = bumpy
    nr = np.asarray(bvh.node_rows)
    T2 = bvh.n_leaves
    ids = np.arange(T2 // 256, 2 * (T2 // 256))
    lo = np.minimum(nr[ids, 0:3], nr[ids, 6:9])
    hi = np.maximum(nr[ids, 3:6], nr[ids, 9:12])
    diag = np.linalg.norm(hi - lo, axis=1)
    diag = diag[diag < 1e29]
    # 128 clusters on a sphere of diameter 0.6: patches ~ sqrt(A/128)
    assert np.median(diag) < 0.25


def test_hybrid_exact_matches_brute(bumpy):
    _, bvh = bumpy
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (4096, 3)).astype(np.float32))
    sb = np.asarray(msdf.signed_distance_brute(bvh.tri_rows, pts))
    sh = np.asarray(msdf.signed_distance_hybrid(bvh, pts))   # atol=0: exact
    assert np.max(np.abs(sh - sb)) < 1e-6


def test_hybrid_error_bound_is_sound(bumpy):
    """The per-query guaranteed bound must dominate the actual error of the
    fixed-K (no escalation) result."""
    _, bvh = bumpy
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (4096, 3)).astype(np.float32))
    lo, hi = msdf.cluster_aabbs(bvh)
    d2, idx, bd = msdf._hybrid_closest(lo, hi, bvh.node_rows, bvh.tri_rows,
                                       pts, 8, 8)   # deliberately weak K
    bound = msdf._dist_err_bound(d2, bd)
    true_d = np.abs(np.asarray(
        msdf.signed_distance_brute(bvh.tri_rows, pts)))
    err = np.sqrt(np.asarray(d2)) - true_d
    assert np.all(err >= -1e-6)                      # found >= true always
    assert np.all(err <= bound + 1e-6)               # bound dominates error


def test_hybrid_sdf_fn_jit_pure(bumpy):
    """The fit-time F wrapper must be jax-traceable and close to the brute
    oracle within the fit-relevant tolerance."""
    import jax
    _, bvh = bumpy
    F = msdf.hybrid_sdf_fn(bvh)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (2048, 3)).astype(np.float32))
    got = np.asarray(jax.jit(F)(pts))
    want = np.asarray(msdf.signed_distance_brute(bvh.tri_rows, pts))
    err = np.abs(got - want)
    # per-query guarantee: error within the pruned-bound slack everywhere
    lo, hi = msdf.cluster_aabbs(bvh)
    d2, _, bd = msdf._hybrid_closest(lo, hi, bvh.node_rows, bvh.tri_rows,
                                     pts, msdf.HYBRID_K1, msdf.HYBRID_K2)
    assert np.all(err <= msdf._dist_err_bound(d2, bd) + 1e-6)
    # near the surface -- where fit accuracy matters -- it is near-exact
    near = np.abs(want) < 0.1
    assert near.any() and np.max(err[near]) < 1e-4


def test_auto_method_selects_hybrid_at_scale(bumpy):
    mesh, bvh = bumpy
    assert bvh.n_leaves <= msdf.AUTO_TILES_MAX       # small mesh -> tiles
    F = msdf.mesh_sdf(mesh, bvh=bvh, method="auto")
    pts = jnp.asarray(np.random.default_rng(3)
                      .uniform(-0.4, 0.4, (256, 3)).astype(np.float32))
    want = np.asarray(msdf.signed_distance_brute(bvh.tri_rows, pts))
    np.testing.assert_allclose(np.asarray(F(pts)), want, atol=1e-5)
    # hybrid selected above the crossover
    old = msdf.AUTO_TILES_MAX
    try:
        msdf.AUTO_TILES_MAX = 1
        Fh = msdf.mesh_sdf(mesh, bvh=bvh, method="auto")
        got = np.asarray(Fh(pts))
    finally:
        msdf.AUTO_TILES_MAX = old
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_mesh_pipeline_at_82k():
    """Pipeline smoke above the tiles crossover (81,920 tris): generate,
    half-edge, BVH, hybrid-vs-brute differential on a subsample. (The full
    1.3M-triangle run is exercised by ``bench.py --suite`` on hardware.)"""
    v, f = gen.bumpy_sphere(0.3, 6)
    mesh = build_mesh(v, f)
    bvh = build_bvh(mesh)
    assert bvh.n_leaves > msdf.AUTO_TILES_MAX     # auto picks hybrid here
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (128, 3)).astype(np.float32))
    sb = np.asarray(msdf.signed_distance_brute(bvh.tri_rows, pts))
    sh = np.asarray(msdf.signed_distance_hybrid(bvh, pts))
    assert np.max(np.abs(sh - sb)) < 1e-6
