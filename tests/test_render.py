"""Sphere-tracer tests: hit geometry vs the closed-form sphere, implicit
VJP vs finite differences (the reference has no renderer; oracles are
analytic, following SURVEY.md section 4's pattern)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hpsdf_tpu as hp
from hpsdf_tpu import render
from .util import sphere_sdf


RADIUS = 0.3


@pytest.fixture(scope="module")
def sphere_tree():
    cfg = hp.Config(target_error=1e-8, continuity=False, max_depth=5,
                    max_degree=6)
    return hp.build_octree(cfg, sphere_sdf(radius=RADIUS))


def test_intersect_aabb():
    o = jnp.asarray([[0.0, 0.0, -2.0],   # hits head-on
                     [0.0, 0.0, 0.0],    # starts inside
                     [2.0, 0.0, -2.0],   # misses
                     [0.0, 0.0, 2.0]])   # box behind the ray
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    tn, tf, hit = render.intersect_aabb(o, d, (-0.5, -0.5, -0.5),
                                        (0.5, 0.5, 0.5))
    np.testing.assert_array_equal(np.asarray(hit), [True, True, False, False])
    np.testing.assert_allclose(float(tn[0]), 1.5, atol=1e-6)
    np.testing.assert_allclose(float(tf[0]), 2.5, atol=1e-6)
    assert float(tn[1]) <= 0.0 <= float(tf[1])


def test_trace_sphere_hit_distance(sphere_tree):
    # rays from -z toward the sphere: hit t should be (|o| - R) on-axis
    n = 64
    rng = np.random.default_rng(1)
    # aim from z=-2 at plane targets well inside the silhouette
    tgt = rng.uniform(-0.1, 0.1, (n, 2))
    o = np.concatenate([np.zeros((n, 2)), np.full((n, 1), -2.0)], axis=1)
    d = np.concatenate([tgt, np.full((n, 1), 2.0)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    res = render.trace(sphere_tree, o, d, t_max=5.0)
    assert bool(jnp.all(res.hit))
    p = o + np.asarray(res.t)[:, None] * d
    r_hit = np.linalg.norm(p, axis=1)
    # sphere tracing stops within hit_eps of the surface, before it
    np.testing.assert_allclose(r_hit, RADIUS, atol=5e-3)
    assert np.all(r_hit >= RADIUS - 1e-3)


def test_trace_miss(sphere_tree):
    o = np.asarray([[0.45, 0.45, -2.0]])
    d = np.asarray([[0.0, 0.0, 1.0]])
    res = render.trace(sphere_tree, o, d, t_max=5.0)
    assert not bool(res.hit[0])


def test_trace_gradient_matches_fd(sphere_tree):
    """Implicit-function VJP vs finite differences of the *true* hit root.

    The marched t is step-quantized (not a smooth function of the coeffs);
    the implicit VJP represents the gradient of the exact root of
    f(o + t d) = 0, so the FD oracle Newton-refines the root in f64 for each
    perturbed coefficient vector before differencing.
    """
    import dataclasses

    o = jnp.asarray([[0.02, -0.03, -2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    tree32 = render._tree_f32(sphere_tree)
    packed = render.pack_tree(sphere_tree)
    static = render._static_of(tree32, packed, render.HIT_EPS, 200)

    def t_march(coeffs):
        t, _, _ = render._trace_core(
            static, packed.rows, packed.grid, tree32.child_idx,
            tree32.centre, tree32.depth, coeffs.astype(jnp.float32), o, d,
            jnp.float32(5.0))
        return t[0]

    o64 = jnp.asarray(o, jnp.float64)
    d64 = jnp.asarray(d, jnp.float64)

    def t_root(c64):
        tr = dataclasses.replace(sphere_tree, coeffs=jnp.asarray(c64))

        def f(tv):
            return hp.query(tr, o64 + tv * d64, outside_value_max=False)[0]

        t = float(t_march(jnp.asarray(c64)))
        for _ in range(20):
            val, dfdt = jax.jvp(f, (jnp.float64(t),), (jnp.float64(1.0),))
            t = t - float(val) / float(dfdt)
        return t

    g = np.asarray(jax.grad(t_march)(tree32.coeffs), np.float64)

    # FD on the few largest-|g| coefficients
    idx = np.argsort(-np.abs(g).ravel())[:4]
    eps = 1e-5
    base = np.asarray(sphere_tree.coeffs)
    for k in idx:
        ij = np.unravel_index(k, g.shape)
        cp = base.copy()
        cp[ij] += eps
        cm = base.copy()
        cm[ij] -= eps
        fd = (t_root(cp) - t_root(cm)) / (2 * eps)
        assert abs(fd - g[ij]) < 1e-2 * max(1.0, abs(fd)), (
            f"coeff {ij}: fd={fd} vjp={g[ij]}")


def test_render_image(sphere_tree):
    img, depth, hit = render.render(
        sphere_tree, eye=(0.0, 0.0, -1.8), look_at=(0.0, 0.0, 0.0),
        width=64, height=64, t_max=5.0)
    img = np.asarray(img)
    hit = np.asarray(hit)
    assert img.shape == (64, 64, 3)
    # centre pixel hits the sphere, corners miss
    assert hit[32, 32]
    assert not hit[0, 0] and not hit[63, 63]
    # silhouette is a disc: hit fraction ~ pi*(ang_r)^2; just sanity-band it
    frac = hit.mean()
    assert 0.05 < frac < 0.9
    # shading is lit at the centre
    assert img[32, 32, 0] > 0.5
    # depth at the centre ~ eye distance - R
    np.testing.assert_allclose(np.asarray(depth)[32, 32], 1.8 - RADIUS,
                               atol=2e-2)


def test_sorted_march_identical_results():
    # Ray sorting only regroups lanes into chunks; per-lane march
    # arithmetic is independent of chunk membership (lanes share
    # termination, not values), so sorted and unsorted traces must agree
    # EXACTLY on every ray of a multi-chunk batch.
    import hpsdf_tpu as hp
    from hpsdf_tpu.render import MARCH_CHUNK, camera_rays

    cfg = hp.Config(target_error=1e-6, continuity=False, max_depth=4,
                    max_degree=3)
    tree = hp.build_octree(cfg, lambda p: jnp.linalg.norm(p, axis=-1) - 0.3)
    side = int(np.ceil(np.sqrt(2 * MARCH_CHUNK)))      # > 2 chunks
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=side, height=side)
    rs = hp.trace(tree, o, d, t_max=5.0, sort_rays=True)
    ru = hp.trace(tree, o, d, t_max=5.0, sort_rays=False)
    assert np.array_equal(np.asarray(rs.hit), np.asarray(ru.hit))
    assert np.array_equal(np.asarray(rs.t), np.asarray(ru.t))
    assert bool(np.asarray(rs.hit).any())


def test_lod_march_matches_full(sphere_tree):
    # The far-field LOD phase takes CONSERVATIVE steps (v_lo - err <= f),
    # so it can never skip a crossing the full march would find: hit masks
    # agree exactly, and both reported t satisfy the same |f| < hit_eps
    # stopping contract (t values differ by at most an eps-band).
    from hpsdf_tpu import accel
    from hpsdf_tpu.render import _lo_of, _march_block, camera_rays

    # depth-capped build forces p-refinement above degree 2 so the 32-lane
    # LOD tables engage (the shared fixture happens to converge at deg 3 /
    # width 32, where _lo_of correctly disables itself)
    cfg = hp.Config(target_error=1e-9, continuity=False, max_depth=4,
                    max_degree=6)
    tree = hp.build_octree(cfg, sphere_sdf(radius=RADIUS))
    pt = accel.pack_tree(tree)
    assert pt.deg_used > 2 and pt.width > accel.LO_W
    lo = _lo_of(pt)
    assert lo is not None
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=48, height=48)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    tm = jnp.float32(5.0)
    t1, h1, kk = _march_block(pt, o, d, tm, 1e-4, 200, lo=lo)
    t2, h2, _ = _march_block(pt, o, d, tm, 1e-4, 200)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert int(kk[0]) > 0                    # the LOD phase actually ran
    assert np.array_equal(h1, h2)
    assert h1.any()
    assert np.abs(np.asarray(t1) - np.asarray(t2))[h1].max() < 5e-4
    # the LOD-phase hit positions satisfy the march's own stopping contract
    p = np.asarray(o) + np.asarray(t1)[:, None] * np.asarray(d)
    v = np.asarray(accel.values_at(pt, jnp.asarray(p[h1])))
    assert np.abs(v).max() < 2e-4


def test_overrelaxed_march_matches_plain():
    # Over-relaxation (OMEGA=1.6) changes the approach path but not the
    # hit guarantee: both marches stop with |f| < hit_eps, so on a
    # unit-gradient field (sphere) hits agree and t differs by at most a
    # few eps-bands.
    import hpsdf_tpu as hp
    from hpsdf_tpu import accel
    from hpsdf_tpu.render import _march_block, camera_rays

    cfg = hp.Config(target_error=1e-6, continuity=False, max_depth=4,
                    max_degree=3)
    tree = hp.build_octree(cfg, lambda p: jnp.linalg.norm(p, axis=-1) - 0.3)
    pt = accel.pack_tree(tree)
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=48, height=48)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    tm = jnp.float32(5.0)
    t1, h1, _ = _march_block(pt, o, d, tm, 1e-4, 200, omega=1.0)
    t2, h2, _ = _march_block(pt, o, d, tm, 1e-4, 200)   # OMEGA default
    h1 = np.asarray(h1)
    h2 = np.asarray(h2)
    # hits may disagree only on tangent-ambiguous rays; none here
    assert np.array_equal(h1, h2)
    m = h1
    assert np.abs(np.asarray(t1) - np.asarray(t2))[m].max() < 5e-4
    assert m.any()
