"""Unit tests for the Legendre basis layer (hpsdf_tpu/basis.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpsdf_tpu import basis, consts


def test_coeff_count_matches_reference_table():
    # (n+1)(n+2)(n+3)/6: 455 at degree 12 (Include/HP/Utility.h:87-106)
    assert consts.coeff_count(0) == 1
    assert consts.coeff_count(2) == 10
    assert consts.coeff_count(6) == 84
    assert consts.coeff_count(12) == 455


def test_basis_indices_ordering():
    idx = basis.basis_indices(2)
    # grouped by total degree, lexicographic (i, j, k) within each degree
    assert idx.shape == (10, 3)
    total = idx.sum(axis=1)
    assert (np.diff(total) >= 0).all()
    assert tuple(idx[0]) == (0, 0, 0)
    assert {tuple(r) for r in idx[1:4]} == {(0, 0, 1), (0, 1, 0), (1, 0, 0)}


def test_leggauss_integrates_polynomials_exactly():
    # n-point rule is exact for degree 2n-1
    x, w = basis.leggauss(5)
    for p in range(0, 10):
        integral = np.sum(w * x**p)
        exact = 0.0 if p % 2 else 2.0 / (p + 1)
        assert abs(integral - exact) < 1e-13


def test_legendre_recurrence_values():
    x = jnp.linspace(-1, 1, 11, dtype=jnp.float64)
    L = np.asarray(basis.legendre_all(x, 4))
    xn = np.asarray(x)
    np.testing.assert_allclose(L[:, 0], 1.0)
    np.testing.assert_allclose(L[:, 1], xn, atol=1e-15)
    np.testing.assert_allclose(L[:, 2], 0.5 * (3 * xn**2 - 1), atol=1e-14)
    np.testing.assert_allclose(
        L[:, 3], 0.5 * (5 * xn**3 - 3 * xn), atol=1e-14)
    np.testing.assert_allclose(
        L[:, 4], (35 * xn**4 - 30 * xn**2 + 3) / 8, atol=1e-14)


def test_legendre_derivatives_match_finite_differences():
    x = jnp.linspace(-0.95, 0.95, 7, dtype=jnp.float64)
    L, dL = basis.legendre_all_with_derivative(x, 6)
    eps = 1e-6
    Lp = np.asarray(basis.legendre_all(x + eps, 6))
    Lm = np.asarray(basis.legendre_all(x - eps, 6))
    fd = (Lp - Lm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(dL), fd, atol=1e-8)


def test_orthonormality_on_unit_cell():
    # Basis functions with the depth-0 normalizer are orthonormal under the
    # uniform measure on [-1,1]^3 scaled by the cell volume factor (1/2)^3,
    # i.e. sum_q w3 * phi_a * phi_b / 8 = delta_ab ... with the norm
    # convention norm = sqrt((2p+1) * 2^depth) and volume factor half^3
    # the fit of phi_b returns exactly e_b. Verified via the fit identity:
    deg = 3
    idx = basis.basis_indices(deg)
    A = basis.quadrature_matrix(deg)          # (P+1, Q) = w_q L_p(x_q)
    x, w = basis.leggauss(basis.fit_rule_size(deg))
    nt = basis.norm_table()
    # inner product matrix M[a,b] = (1/8)*sum_{ijk} w3 phi_a phi_b at depth 0
    Lv = basis.legendre_all_np(x, deg)        # (P+1, Q)
    C = idx.shape[0]
    M = np.zeros((C, C))
    for a in range(C):
        for b in range(C):
            va = 1.0
            for ax in range(3):
                pa, pb = idx[a][ax], idx[b][ax]
                na = nt[pa, 0] * nt[pb, 0]
                va *= np.sum(w * Lv[pa] * Lv[pb]) * na * 0.5
            M[a, b] = va
    np.testing.assert_allclose(M, np.eye(C), atol=1e-12)


@pytest.mark.parametrize("depth", [0, 2, 5])
def test_eval_basis_reproduces_polynomial(depth):
    # project x^2 + 0.3 y - 0.1 onto the depth-`depth` cell at the origin
    # corner and evaluate back: must be exact for degree >= 2
    from hpsdf_tpu import build
    from hpsdf_tpu.config import Config

    def F(p):
        return p[..., 0] ** 2 + 0.3 * p[..., 1] - 0.1

    cfg = Config(continuity=False)
    fit = build._FitCache(F, cfg)
    half = 2.0 ** -(depth + 1)
    centre = np.array([[half, -half, half]])
    coeffs, _ = fit(2, centre, np.array([depth], np.int32))
    pts = np.random.default_rng(1).uniform(-1, 1, (50, 3))
    local = jnp.asarray(pts)
    world = centre + half * pts
    vals = basis.eval_basis(jnp.asarray(coeffs), local,
                            jnp.full(1, depth, jnp.int32), 2)
    np.testing.assert_allclose(np.asarray(vals), F(world), atol=1e-12)
