"""Batched octree queries.

Vectorized, jit-compiled equivalents of the reference's scalar read path
(hot loops #2/#3 in SURVEY.md):

  * ``query``            <- Octree::Query            (Source/HP/Octree.cpp:662-702)
  * ``query_with_gradient`` <- Octree::QueryWithGradient (:749-789), but with
    exact analytic gradients instead of central differences (:904-985).

Design: the pointer-free descent becomes ``depth_used`` rounds of pure
gathers -- child = child_idx[cur] + (x>=cx) + 2*(y>=cy) + 4*(z>=cz) -- over
the whole point batch at once, with settled (leaf) lanes carried through
unchanged. No data-dependent control flow; XLA fuses descent + polynomial
evaluation into one program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import basis
from .tree import Octree

# Value returned for points outside the root AABB
# (reference returns std::numeric_limits<f64>::max(), Octree.cpp:668-671).
OUTSIDE_VALUE = jnp.finfo(jnp.float64).max


def _to_unit(tree: Octree, pts: jax.Array) -> jax.Array:
    """World -> internal unit-cube coords (reference: Octree.cpp:665)."""
    centre = jnp.asarray(tree.config.root_centre, pts.dtype)
    inv = jnp.asarray(1.0 / tree.config.root_sizes, pts.dtype)
    return (pts - centre) * inv


def descend(tree: Octree, unit_pts: jax.Array) -> jax.Array:
    """Return the leaf node index containing each unit-cube point.

    unit_pts: (B, 3). Returns (B,) int32 leaf indices. Points outside the
    root land in whatever boundary leaf the comparisons select; callers mask
    them separately.
    """
    cur0 = jnp.zeros(unit_pts.shape[:-1], jnp.int32)

    def body(_, cur):
        child0 = tree.child_idx[cur]                       # (B,)
        is_leaf = child0 < 0
        cc = tree.centre[cur]                              # (B, 3)
        oct_ = ((unit_pts[..., 0] >= cc[..., 0]).astype(jnp.int32)
                + ((unit_pts[..., 1] >= cc[..., 1]).astype(jnp.int32) << 1)
                + ((unit_pts[..., 2] >= cc[..., 2]).astype(jnp.int32) << 2))
        return jnp.where(is_leaf, cur, child0 + oct_)

    # depth_used gather rounds suffice: every leaf is at depth <= depth_used.
    return jax.lax.fori_loop(0, tree.depth_used, body, cur0, unroll=True)


def _leaf_eval(tree: Octree, leaf: jax.Array, unit_pts: jax.Array):
    """Per-leaf local frame + padded coeff rows for a batch of points."""
    depth = tree.depth[leaf]                               # (B,)
    scale = jnp.exp2((depth + 1).astype(unit_pts.dtype))   # 2**(depth+1)
    local = (unit_pts - tree.centre[leaf]) * scale[..., None]
    return tree.coeffs[leaf], local, depth


@functools.partial(jax.jit, static_argnames=("outside_value_max",))
def query(tree: Octree, pts: jax.Array, outside_value_max: bool = True):
    """Approximated signed distance at world points ``pts`` (B, 3) -> (B,).

    Negative inside the surface. Points outside the root AABB return the f64
    max sentinel (matching Octree::Query) unless ``outside_value_max`` is
    False, in which case they return the clamped-boundary evaluation (useful
    for rendering).
    """
    unit = _to_unit(tree, pts)
    inside = jnp.all(jnp.abs(unit) <= 0.5, axis=-1)
    clamped = jnp.clip(unit, -0.5, 0.5)
    leaf = descend(tree, clamped)
    coeffs, local, depth = _leaf_eval(tree, leaf, clamped)
    val = basis.eval_basis(coeffs, local, depth, tree.deg_used)
    if outside_value_max:
        val = jnp.where(inside, val, OUTSIDE_VALUE)
    return val


@jax.jit
def query_with_gradient(tree: Octree, pts: jax.Array):
    """Value and unit world-space gradient at ``pts`` (B, 3).

    Analytic gradients via the Legendre derivative recurrence -- exact, and
    ~3x cheaper than the reference's 3-axis central differences
    (Source/HP/Octree.cpp:904-985). Returns (val (B,), unit_grad (B, 3)).
    """
    unit = _to_unit(tree, pts)
    inside = jnp.all(jnp.abs(unit) <= 0.5, axis=-1)
    clamped = jnp.clip(unit, -0.5, 0.5)
    leaf = descend(tree, clamped)
    coeffs, local, depth = _leaf_eval(tree, leaf, clamped)
    val, g_local = basis.eval_basis_grad(coeffs, local, depth, tree.deg_used)
    # chain rule: local = (unit - centre) * 2**(depth+1); unit = (w - c)/sizes
    scale = jnp.exp2((depth + 1).astype(pts.dtype))
    inv_sizes = jnp.asarray(1.0 / tree.config.root_sizes, pts.dtype)
    g_world = g_local * scale[..., None] * inv_sizes
    norm = jnp.linalg.norm(g_world, axis=-1, keepdims=True)
    unit_grad = g_world / jnp.maximum(norm, 1e-30)
    val = jnp.where(inside, val, OUTSIDE_VALUE)
    return val, unit_grad


def query_grid(tree: Octree, resolution: int, axis_min=None, axis_max=None):
    """Query a uniform resolution^3 grid over the root AABB (the reference's
    grid benchmark, Source/Tests/HPBenchmarks.cpp:118-166)."""
    lo, hi = tree.root_aabb
    if axis_min is not None:
        lo = axis_min
    if axis_max is not None:
        hi = axis_max
    axes = [jnp.linspace(lo[a], hi[a], resolution) for a in range(3)]
    g = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    return query(tree, g.reshape(-1, 3)).reshape(resolution, resolution,
                                                 resolution)
