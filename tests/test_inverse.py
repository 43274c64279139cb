"""Inverse rendering (BASELINE.json config #5, scaled down): optimize the
coefficients of a sphere tree so its traced depths match a differently-sized
target sphere. Exercises accel.repack + the implicit-function VJP end to
end inside one jitted scan."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import hpsdf_tpu as hp
from hpsdf_tpu import accel, inverse
from hpsdf_tpu.render import camera_rays

from .util import sphere_sdf


def _tree(radius):
    cfg = hp.Config(target_error=1e-6, continuity=False, max_depth=4,
                    max_degree=3)
    return hp.build_octree(cfg, sphere_sdf(radius=radius))


@pytest.fixture(scope="module")
def trees():
    return _tree(0.30), _tree(0.33)


def test_repack_matches_pack_tree(trees):
    tree, _ = trees
    packed = accel.pack_tree(tree)
    support = accel.pack_support(tree)
    re = accel.repack(packed, support, tree.coeffs)
    np.testing.assert_allclose(np.asarray(re.rows), np.asarray(packed.rows),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(re.grid), np.asarray(packed.grid),
                               rtol=1e-6, atol=1e-7)


def test_repack_tracks_new_coeffs(trees):
    tree, other = trees
    packed = accel.pack_tree(tree)
    support = accel.pack_support(tree)
    re = accel.repack(packed, support, other.coeffs)
    want = accel.pack_tree(dataclasses.replace(tree, coeffs=other.coeffs))
    np.testing.assert_allclose(np.asarray(re.rows), np.asarray(want.rows),
                               rtol=1e-6, atol=1e-7)


def test_repack_folded_matches_repack(trees):
    # repack_folded(c * fold) must be exactly repack(c): the folded lanes
    # ARE the packed-row coefficient lanes (the inverse-rendering
    # optimization coordinates).
    tree, other = trees
    packed = accel.pack_tree(tree)
    support = accel.pack_support(tree)
    c32 = jnp.asarray(other.coeffs, jnp.float32)
    a = accel.repack(packed, support, c32)
    b = accel.repack_folded(packed, support, c32 * support.fold)
    np.testing.assert_array_equal(np.asarray(a.rows), np.asarray(b.rows))
    np.testing.assert_array_equal(np.asarray(a.grid), np.asarray(b.grid))


def test_fit_to_depth_raw_space_still_works(trees):
    # param_space="raw" (round-2 behavior) stays supported and finite;
    # bad values raise.
    init, target = trees
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=8, height=8)
    tgt_t, tgt_hit = inverse.render_targets(target, o, d, t_max=5.0)
    res = inverse.fit_to_depth(init, o, d, tgt_t, tgt_hit, n_steps=2,
                               lr=1e-3, t_max=5.0, param_space="raw")
    assert np.isfinite(np.asarray(res.losses)).all()
    with pytest.raises(ValueError):
        inverse.fit_to_depth(init, o, d, tgt_t, tgt_hit, n_steps=1,
                             param_space="bogus")


def test_fit_to_depth_recovers_target(trees):
    init, target = trees
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=32, height=32)
    tgt_t, tgt_hit = inverse.render_targets(target, o, d, t_max=5.0)

    def depth_err(tree):
        ft, fh = inverse.render_targets(tree, o, d, t_max=5.0,
                                        step_cap=0.02)
        m = np.asarray(fh & tgt_hit)
        return np.abs(np.asarray(ft) - np.asarray(tgt_t))[m]

    err0 = depth_err(init)
    res = inverse.fit_to_depth(init, o, d, tgt_t, tgt_hit,
                               n_steps=300, lr=1e-3, t_max=5.0)
    losses = np.asarray(res.losses)
    assert np.isfinite(losses).all()
    err = depth_err(res.tree)
    # the optimization shrinks the median traced-depth error substantially
    assert np.median(err) < 0.25 * np.median(err0), (
        np.median(err0), np.median(err))
    assert np.median(err) < 5e-3


def test_loss_chunk_invariant(trees):
    # Round-2 advisor, low: the chunked depth term must normalize by the
    # TOTAL (hit & target_hit) count accumulated across chunks (the
    # depth_loss contract), so the loss trajectory is identical whatever
    # the ray chunking -- including the padded-tail path.
    init, target = trees
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=20, height=20)   # B=400
    tgt_t, tgt_hit = inverse.render_targets(target, o, d, t_max=5.0)
    runs = [inverse.fit_to_depth(init, o, d, tgt_t, tgt_hit, n_steps=3,
                                 lr=1e-3, t_max=5.0, ray_chunk=rc).losses
            for rc in (400, 96)]              # 96 forces padding (400->480)
    np.testing.assert_allclose(np.asarray(runs[0]), np.asarray(runs[1]),
                               rtol=2e-4)


def test_sharded_rays_match_single_device(trees):
    """fit_to_depth with rays sharded over the 8-device mesh matches the
    single-device run step for step at 256^2 rays (round-3 verdict item 6:
    'sharded-vs-single equivalence at >= 256^2 rays')."""
    from hpsdf_tpu import parallel

    tree, _ = trees
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=256, height=256)
    t_star, hit_star = inverse.render_targets(tree, o, d, t_max=4.0)
    mesh = parallel.make_mesh()
    kw = dict(n_steps=2, t_max=4.0, ray_chunk=1 << 14)
    single = inverse.fit_to_depth(tree, o, d, t_star, hit_star, **kw)
    sharded = inverse.fit_to_depth(tree, o, d, t_star, hit_star,
                                   mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(sharded.losses),
                               np.asarray(single.losses), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sharded.tree.coeffs),
                               np.asarray(single.tree.coeffs),
                               rtol=1e-4, atol=1e-7)
