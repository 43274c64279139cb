"""End-to-end build + query tests.

Vectorized equivalents of the reference's HP unit tests
(Source/Tests/HPUnitTests.cpp:46-316): analytic-oracle + dense random
sampling, tolerance 0.01 (0.05 for CSG).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import hpsdf_tpu as hp
from .util import sphere_sdf, box_sdf, uniform_pts

TOL = 0.01
N_SAMPLES = 200_000  # the reference uses 1M; trimmed for CI speed


@pytest.fixture(scope="module")
def sphere_tree():
    # Mirror of "Octree Creation" (HPUnitTests.cpp:46-77): offset sphere,
    # polynomial nearness weighting, thr 1e-8, no continuity.
    cfg = hp.Config(target_error=1e-8, continuity=False,
                    nearness_weighting=hp.NearnessWeighting.POLYNOMIAL,
                    nearness_strength=2.0)
    return hp.build_octree(cfg, sphere_sdf(centre=(0.25, 0, 0), radius=0.2))


def test_octree_creation_sphere(sphere_tree):
    F = sphere_sdf(centre=(0.25, 0, 0), radius=0.2)
    pts = uniform_pts(N_SAMPLES)
    got = np.asarray(hp.query(sphere_tree, jnp.asarray(pts)))
    want = np.asarray(F(jnp.asarray(pts)))
    assert np.abs(got - want).max() < TOL


def test_query_outside_root_returns_max(sphere_tree):
    pts = jnp.asarray([[0.75, 0.0, 0.0], [0.0, -0.51, 0.0]])
    got = np.asarray(hp.query(sphere_tree, pts))
    assert (got > 1e30).all()


def test_query_with_gradient(sphere_tree):
    # gradient of a sphere SDF is the unit radial direction
    pts = uniform_pts(5000, seed=3)
    keep = np.linalg.norm(pts - [0.25, 0, 0], axis=-1) > 0.03
    pts = pts[keep]
    val, grad = hp.query_with_gradient(sphere_tree, jnp.asarray(pts))
    want_dir = pts - np.array([0.25, 0, 0.0])
    want_dir /= np.linalg.norm(want_dir, axis=-1, keepdims=True)
    dots = np.sum(np.asarray(grad) * want_dir, axis=-1)
    assert np.quantile(dots, 0.01) > 0.99


def test_custom_domain():
    # "Octree Custom Domains" (HPUnitTests.cpp:285-316): non-unit,
    # non-centred root AABB.
    cfg = hp.Config(target_error=1e-7, continuity=False,
                    root_min=(-0.25, -0.25, -0.25), root_max=(5.0, 5.0, 5.0))
    F = sphere_sdf(centre=(2.0, 2.0, 2.0), radius=1.0)
    tree = hp.build_octree(cfg, F)
    rng = np.random.default_rng(7)
    pts = rng.uniform(-0.25, 5.0, (50_000, 3))
    got = np.asarray(hp.query(tree, jnp.asarray(pts)))
    want = np.asarray(F(jnp.asarray(pts)))
    # scaled domain (5.25 wide): scale tolerance like the reference's
    # unit-cube tol x domain size
    assert np.abs(got - want).max() < TOL * 5.25


def test_serialisation_roundtrip(tmp_path, sphere_tree):
    # "Octree Serialisation" (HPUnitTests.cpp:115-154)
    p = str(tmp_path / "tree.npz")
    hp.save(sphere_tree, p)
    tree2 = hp.load(p)
    pts = uniform_pts(20_000, seed=5)
    a = np.asarray(hp.query(sphere_tree, jnp.asarray(pts)))
    b = np.asarray(hp.query(tree2, jnp.asarray(pts)))
    np.testing.assert_array_equal(a, b)


def test_csg_union():
    # "Octree SDF Operations" (HPUnitTests.cpp:207-282), tol 0.05
    cfg = hp.Config(target_error=1e-7, continuity=False)
    Fs = sphere_sdf(centre=(-0.15, 0, 0), radius=0.2)
    Fb = box_sdf(centre=(0.15, 0, 0), half=(0.15, 0.15, 0.15))
    tree = hp.build_octree(cfg, Fs)
    tree = hp.union_sdf(tree, Fb)
    pts = uniform_pts(50_000, seed=11)
    got = np.asarray(hp.query(tree, jnp.asarray(pts)))
    want = np.minimum(np.asarray(Fs(jnp.asarray(pts))),
                      np.asarray(Fb(jnp.asarray(pts))))
    assert np.abs(got - want).max() < 0.05


def test_csg_intersect_subtract():
    cfg = hp.Config(target_error=1e-7, continuity=False)
    Fs = sphere_sdf(centre=(0, 0, 0), radius=0.25)
    Fb = box_sdf(centre=(0, 0, 0), half=(0.2, 0.2, 0.2))
    pts = uniform_pts(50_000, seed=13)
    sv = np.asarray(Fs(jnp.asarray(pts)))
    bv = np.asarray(Fb(jnp.asarray(pts)))

    t1 = hp.intersect_sdf(hp.build_octree(cfg, Fs), Fb)
    got = np.asarray(hp.query(t1, jnp.asarray(pts)))
    assert np.abs(got - np.maximum(sv, bv)).max() < 0.05

    t2 = hp.subtract_sdf(hp.build_octree(cfg, Fs), Fb)
    got = np.asarray(hp.query(t2, jnp.asarray(pts)))
    assert np.abs(got - np.maximum(-sv, bv)).max() < 0.05


def test_csg_keyed_operands_not_conflated():
    # Round-2 advisor, HIGH: two same-structure keyed operands (both
    # df64.Sphere instances share the structural key ("df64.Sphere",))
    # must not reuse one compiled CSG program's baked-in operand state.
    # Before the fix, the second union returned a tree bit-identical to
    # the first -- silently built against the first sphere.
    from hpsdf_tpu import df64

    cfg = hp.Config(target_error=1e-7, fit_dtype="compensated",
                    continuity=False)
    base = hp.build_octree(cfg, df64.Sphere(0.3))
    t1 = hp.union_sdf(base, df64.Sphere(0.2, centre=(0.3, 0.0, 0.0)))
    t2 = hp.union_sdf(base, df64.Sphere(0.45))
    assert not np.array_equal(np.asarray(t1.coeffs), np.asarray(t2.coeffs))

    pts = uniform_pts(50_000, seed=17)
    base_v = np.linalg.norm(pts, axis=-1) - 0.3
    want1 = np.minimum(base_v,
                       np.linalg.norm(pts - [0.3, 0, 0], axis=-1) - 0.2)
    want2 = np.minimum(base_v, np.linalg.norm(pts, axis=-1) - 0.45)
    got1 = np.asarray(hp.query(t1, jnp.asarray(pts)))
    got2 = np.asarray(hp.query(t2, jnp.asarray(pts)))
    assert np.abs(got1 - want1).max() < 0.05
    assert np.abs(got2 - want2).max() < 0.05


def test_build_converges_past_depth_5():
    """Deep h-refinement (VERDICT round-1 missing #2, depth arm): a sharp
    feature localized well below the depth-5 cell size, fit with the degree
    cap at 2, must drive h-refinement past depth 5 (the cap every other
    test stops at) and still meet the oracle tolerance. Exercises the
    deep-tree read path too: descent below the packed grid depth
    (accel.extra_rounds > 0). Reference headroom: TREE_MAX_DEPTH=10
    (Include/HP/Consts.h:8)."""

    def F(p):
        # linear background (exactly representable at degree 1) + a
        # Gaussian bump of width ~0.005 (depth-7 cells are ~0.008)
        r2 = jnp.sum((p - jnp.asarray([0.31, -0.07, 0.12])) ** 2, axis=-1)
        return p[..., 0] + 0.05 * jnp.exp(-2e4 * r2)

    cfg = hp.Config(target_error=1e-10, continuity=False, max_degree=2,
                    max_depth=8)
    tree = hp.build_octree(cfg, F)
    assert tree.depth_used > 5
    pts = uniform_pts(50000, seed=9)
    got = np.asarray(hp.query(tree, jnp.asarray(pts)))
    want = np.asarray(F(jnp.asarray(pts)))
    assert np.abs(got - want).max() < TOL


def test_grid_query_shape(sphere_tree):
    g = hp.query_grid(sphere_tree, 32)
    assert g.shape == (32, 32, 32)
    # centre of the offset sphere is inside
    assert float(g[24, 16, 16]) < 0.0
