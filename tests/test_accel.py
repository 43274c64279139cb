"""Packed-layout (accel.py) correctness: the gather-optimized read path must
agree with the generic f64 query path to f32 tolerance."""

import numpy as np
import jax.numpy as jnp
import pytest

import hpsdf_tpu as hp
from hpsdf_tpu import accel
from .util import sphere_sdf, box_sdf, uniform_pts


@pytest.fixture(scope="module", params=["sphere", "box_offcentre"])
def tree(request):
    if request.param == "sphere":
        cfg = hp.Config(target_error=1e-7, continuity=False, max_depth=5,
                        max_degree=6)
        return hp.build_octree(cfg, sphere_sdf(radius=0.3))
    # non-unit, non-centred domain exercises the root transform
    cfg = hp.Config(target_error=1e-6, continuity=False, max_depth=5,
                    max_degree=4, root_min=(-0.25, -0.25, -0.25),
                    root_max=(1.75, 1.75, 1.75))
    return hp.build_octree(cfg, box_sdf(centre=(0.75, 0.75, 0.75),
                                        half=(0.4, 0.3, 0.5)))


def test_packed_matches_query(tree):
    pt = accel.pack_tree(tree)
    lo, hi = tree.root_aabb
    pts = np.asarray(uniform_pts(20000, seed=11))
    pts = lo + (pts + 0.5) * (hi - lo)
    want = np.asarray(hp.query(tree, jnp.asarray(pts)))
    got = np.asarray(accel.query_packed(pt, jnp.asarray(pts, jnp.float32)))
    scale = np.maximum(1.0, np.abs(want))
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


def test_packed_outside_sentinel(tree):
    pt = accel.pack_tree(tree)
    lo, hi = tree.root_aabb
    far = np.asarray([hi + 1.0, lo - 1.0], np.float32)
    got = np.asarray(accel.query_packed(pt, jnp.asarray(far)))
    assert np.all(got == np.finfo(np.float32).max)


def test_grid_depth_cap_extra_rounds(tree):
    # forcing a shallow grid must not change results (extra descent rounds)
    pt = accel.pack_tree(tree, grid_depth=2)
    assert pt.extra_rounds == tree.depth_used - 2
    lo, hi = tree.root_aabb
    pts = np.asarray(uniform_pts(5000, seed=12))
    pts = lo + (pts + 0.5) * (hi - lo)
    want = np.asarray(hp.query(tree, jnp.asarray(pts)))
    got = np.asarray(accel.query_packed(pt, jnp.asarray(pts, jnp.float32)))
    scale = np.maximum(1.0, np.abs(want))
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)
