"""df64 (double-float) arithmetic + compensated TPU-resident fit parity.

The compensated fit is the repo's answer to SURVEY.md section 7's "f64 on
TPU" hard part: the reference fits in f64 (Source/HP/Octree.cpp:1007-1093);
fit_dtype="compensated" reproduces it in native f32 ops via error-free
transforms. These tests pin (a) the exactness of the transforms under XLA,
(b) df64 op accuracy, (c) fit-level parity against the f64 projection, and
(d) end-to-end build parity at the reference oracle tolerance
(|Query - F_true| <= 0.01, HPUnitTests.cpp:46-77).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hpsdf_tpu as hp
from hpsdf_tpu import build as B
from hpsdf_tpu import df64


def test_error_free_transforms_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(50000).astype(np.float32)
    b = (rng.standard_normal(50000) * 10.0 ** rng.integers(
        -6, 6, 50000)).astype(np.float32)

    @jax.jit
    def run(a, b):
        s, se = df64.two_sum(a, b)
        p, pe = df64.two_prod(a, b)
        return s, se, p, pe

    s, se, p, pe = (np.asarray(x) for x in run(jnp.asarray(a),
                                               jnp.asarray(b)))
    assert np.all(s.astype(np.float64) + se
                  == a.astype(np.float64) + b.astype(np.float64))
    want = a.astype(np.float64) * b.astype(np.float64)
    got = p.astype(np.float64) + pe
    # two_prod's error-term accumulation rounds twice: ~2^-45 relative
    assert np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-30)) < 6e-14


def test_df64_ops_accuracy():
    rng = np.random.default_rng(1)
    xa = rng.uniform(-2.0, 2.0, 20000)
    xb = rng.uniform(0.1, 3.0, 20000)
    A = df64.from_f64(xa)
    Bv = df64.from_f64(xb)

    @jax.jit
    def run(ah, al, bh, bl):
        a, b = (ah, al), (bh, bl)
        return (df64.add(a, b), df64.mul(a, b), df64.sqrt(b),
                df64.sub(a, b))

    (s, m, q, d) = run(*(jnp.asarray(v) for v in A + Bv))
    rel = lambda got, want, scale: np.max(
        np.abs(df64.to_f64(got) - want) / np.maximum(scale, 1e-30))
    mag = np.abs(xa) + np.abs(xb)   # add/sub error scales with the operands
    assert rel(s, xa + xb, mag) < 1e-13
    assert rel(d, xa - xb, mag) < 1e-13
    assert rel(m, xa * xb, np.abs(xa * xb)) < 1e-13
    assert rel(q, np.sqrt(xb), np.sqrt(xb)) < 1e-13


def test_df64_sphere_matches_f64():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.5, 0.5, (5000, 3))
    sph = df64.Sphere(0.3, centre=(0.05, -0.02, 0.01))
    hi, lo = df64.from_f64(pts)
    vh, vl = jax.jit(sph.eval_df)(jnp.asarray(hi), jnp.asarray(lo))
    got = df64.to_f64((vh, vl))
    want = np.linalg.norm(pts - np.asarray([0.05, -0.02, 0.01]), axis=1) - 0.3
    assert np.max(np.abs(got - want)) < 1e-12


def test_df64_box_matches_f64():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.5, 0.5, (5000, 3))
    box = df64.Box((0.2, 0.25, 0.15))
    hi, lo = df64.from_f64(pts)
    vh, vl = jax.jit(box.eval_df)(jnp.asarray(hi), jnp.asarray(lo))
    got = df64.to_f64((vh, vl))
    q = np.abs(pts) - np.asarray([0.2, 0.25, 0.15])
    want = (np.linalg.norm(np.maximum(q, 0.0), axis=1)
            + np.minimum(np.max(q, axis=1), 0.0))
    assert np.max(np.abs(got - want)) < 1e-12


def _fit_pair(degree, fit_dtype, F):
    cfg = hp.Config(target_error=1e-6, continuity=False, max_depth=4,
                    max_degree=degree, fit_dtype=fit_dtype)
    cache = B._FitCache(F, cfg)
    rng = np.random.default_rng(4)
    depths = rng.integers(1, 4, 40).astype(np.int32)
    # centres on the exact cell lattice for each depth
    q = np.exp2(-(depths.astype(np.float64) + 2.0))
    k = rng.integers(-2, 3, (40, 3))
    centres = (2 * k + 1) * q[:, None]
    return cache(degree, centres, depths)


@pytest.mark.parametrize("degree", [3, 6])
def test_compensated_fit_matches_f64_fit(degree):
    sph = df64.Sphere(0.3)
    c64, e64 = _fit_pair(degree, "float64", sph)
    ccmp, ecmp = _fit_pair(degree, "compensated", sph)
    assert np.max(np.abs(ccmp - c64)) < 1e-11
    assert np.max(np.abs(ecmp - e64) / np.maximum(e64, 1e-18)) < 1e-5


def test_compensated_build_oracle():
    """End-to-end compensated build meets the reference oracle tolerance
    (HPUnitTests.cpp:46-77: |Query - F| <= 0.01 at random samples)."""
    sph = df64.Sphere(0.3)
    cfg = hp.Config(target_error=1e-7, continuity=False, max_depth=5,
                    max_degree=6, fit_dtype="compensated")
    tree = hp.build_octree(cfg, sph)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-0.5, 0.5, (200000, 3))
    got = np.asarray(hp.query(tree, jnp.asarray(pts)))
    want = np.linalg.norm(pts, axis=1) - 0.3
    assert np.max(np.abs(got - want)) <= 0.01


def test_build_converges_past_degree_6():
    """High-degree convergence (VERDICT round-1 missing #2): a smooth
    high-frequency field localized in one corner, with h-refinement capped
    at the coarse depth, must drive p-refinement past degree 6 and still
    meet a tight oracle tolerance. Mirrors the reference's degree-12 cap
    headroom (Include/HP/Consts.h:7) without a full reference-default
    build in CI (that runs on hardware via bench.py --suite)."""

    def F(p):
        g = jnp.exp(-150.0 * jnp.sum((p - 0.38) ** 2, axis=-1))
        return 0.05 * (jnp.sin(40.0 * p[..., 0]) * jnp.sin(40.0 * p[..., 1])
                       * jnp.sin(40.0 * p[..., 2])) * g

    cfg = hp.Config(target_error=1e-11, continuity=False, max_depth=4,
                    max_degree=10)
    tree = hp.build_octree(cfg, F)
    assert tree.deg_used > 6
    rng = np.random.default_rng(8)
    pts = jnp.asarray(rng.uniform(0.3, 0.46, (50000, 3)))  # the hot corner
    got = np.asarray(hp.query(tree, pts))
    want = np.asarray(F(pts))
    assert np.max(np.abs(got - want)) < 1e-3


def test_compensated_build_close_to_f64_build():
    """Same config, df64-aware F: compensated and f64 builds agree to well
    below the oracle tolerance on queried values (topology may differ on
    near-tie refinement decisions; values must not)."""
    sph = df64.Sphere(0.3)
    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (50000, 3)))
    cfgc = hp.Config(target_error=1e-6, continuity=False, max_depth=4,
                     max_degree=5, fit_dtype="compensated")
    cfg6 = hp.Config(target_error=1e-6, continuity=False, max_depth=4,
                     max_degree=5, fit_dtype="float64")
    tc = hp.build_octree(cfgc, sph)
    t6 = hp.build_octree(cfg6, sph)
    qc = np.asarray(hp.query(tc, pts))
    q6 = np.asarray(hp.query(t6, pts))
    assert np.max(np.abs(qc - q6)) < 1e-4
