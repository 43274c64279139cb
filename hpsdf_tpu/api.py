"""Top-level user API.

The TPU-native counterpart of the ``SDF::Octree`` public surface
(reference: Include/HP/Octree.h:50-86): build, query, CSG, serialization.
Functional style -- every operation returns a new (immutable) Octree pytree.
"""

from __future__ import annotations

from typing import Callable

import jax

from . import build as _build
from . import query as _query
from .config import Config
from .tree import Octree

SDFFn = Callable[[jax.Array], jax.Array]


def build_octree(config: Config, F: SDFFn, **kw) -> Octree:
    """Approximate the batched SDF callable ``F`` (world pts (K,3) -> (K,)).

    Equivalent of Octree::Create (Source/HP/Octree.cpp:312-352), including
    the continuity post-process when config.continuity is set.
    """
    if config.continuity and "continuity_fn" not in kw:
        from . import continuity as _continuity

        kw["continuity_fn"] = _continuity.enforce_continuity
    return _build.build(config, F, **kw)


query = _query.query
query_with_gradient = _query.query_with_gradient
query_grid = _query.query_grid


def as_sdf(tree: Octree) -> SDFFn:
    """Wrap a fitted octree as a batched SDF callable usable as a build
    input -- the composition mechanism behind the CSG rebuilds."""
    import dataclasses

    def F(pts):
        # The fit kernels close over this tree, turning its arrays into
        # XLA constants; without a barrier the compiler constant-folds
        # multi-million-element gathers on them at COMPILE time (measured
        # 126 s for a union rebuild, ~2 s with the barrier).
        t = dataclasses.replace(
            tree,
            child_idx=jax.lax.optimization_barrier(tree.child_idx),
            centre=jax.lax.optimization_barrier(tree.centre),
            depth=jax.lax.optimization_barrier(tree.depth),
            coeffs=jax.lax.optimization_barrier(tree.coeffs))
        return _query.query(t, pts, outside_value_max=False)

    return F


def union_sdf(tree: Octree, F: SDFFn, **kw) -> Octree:
    """Rebuild approximating min(tree, F) (Octree::UnionSDF,
    Source/HP/Octree.cpp:355-374)."""
    old = as_sdf(tree)
    return build_octree(tree.config, lambda p: jax.numpy.minimum(old(p), F(p)),
                        **kw)


def subtract_sdf(tree: Octree, F: SDFFn, **kw) -> Octree:
    """Rebuild approximating max(-tree, F) (Octree::SubtractSDF,
    Source/HP/Octree.cpp:377-387)."""
    old = as_sdf(tree)
    return build_octree(tree.config, lambda p: jax.numpy.maximum(-old(p), F(p)),
                        **kw)


def intersect_sdf(tree: Octree, F: SDFFn, **kw) -> Octree:
    """Rebuild approximating max(tree, F) (Octree::IntersectSDF,
    Source/HP/Octree.cpp:390-400)."""
    old = as_sdf(tree)
    return build_octree(tree.config, lambda p: jax.numpy.maximum(old(p), F(p)),
                        **kw)
