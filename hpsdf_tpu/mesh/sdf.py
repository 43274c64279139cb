"""Batched mesh signed distance (the reference's Mesh::SignedDistanceAtPt +
BVH::ClosestTriangleToPt read path, Source/Meshing/Mesh.cpp:42-63 and
Source/Meshing/BVH.cpp:263-342), as jit-compatible device loops.

``signed_distance``       -- BVH traversal (descend-nearer/push-farther).
``signed_distance_brute`` -- O(T) chunked scan (the reference's no-BVH
                             overload, Mesh.cpp:42-51); the differential
                             oracle for the fast path, exactly as the
                             reference tests use it
                             (MeshingUnitTests.cpp:110-138).
``mesh_sdf``              -- wraps a mesh as a batched F callable for
                             build_octree (the coupling pattern in the
                             reference's test code, HPUnitTests.cpp:60-61).

Sign convention (Baerentzen-Aanaes): sign(dot(pseudo_normal(feature),
p - closest)), with the pseudo-normal picked by the closest simplex
(vertex / edge / face) -- reference Mesh.cpp:162-242.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import bvh as _bvh
from . import tri as _tri
from . import pallas_sdf as _pallas
from .bvh import BVH, build_bvh
from .core import TriMesh

# Default traversal iteration cap = 4 * n_leaves: enough for a complete DFS
# (each node entered once plus a pop transition each), i.e. EXACT results.
# Deep-interior query points prune poorly (every surface leaf is nearly
# equidistant), so tighter caps trade accuracy for speed; callers can pass
# max_iters explicitly for approximate queries.


def _tri_parts(rows):
    a = rows[..., _bvh._V0:_bvh._V0 + 3]
    b = rows[..., _bvh._V1:_bvh._V1 + 3]
    c = rows[..., _bvh._V2:_bvh._V2 + 3]
    return a, b, c


def _pseudo_normal(rows, feature):
    """Select the feature's pseudo-normal from a packed triangle row."""
    fn = rows[..., _bvh._FN:_bvh._FN + 3]
    out = fn
    for k in range(3):
        vpn = rows[..., _bvh._VPN + 3 * k:_bvh._VPN + 3 * k + 3]
        out = jnp.where((feature == k)[..., None], vpn, out)
    for k in range(3):
        epn = rows[..., _bvh._EPN + 3 * k:_bvh._EPN + 3 * k + 3]
        out = jnp.where((feature == 3 + k)[..., None], epn, out)
    return out


def _signed_from_best(tri_rows, best_idx, p):
    """Final sign + distance evaluation on the best triangle only."""
    rows = tri_rows[best_idx]
    a, b, c = _tri_parts(rows)
    closest, feature = _tri.closest_point_triangle(p, a, b, c)
    pn = _pseudo_normal(rows, feature)
    diff = p - closest
    dist = jnp.linalg.norm(diff, axis=-1)
    sign = jnp.where(jnp.sum(pn * diff, axis=-1) >= 0.0, 1.0, -1.0)
    return sign * dist


def _closest_bvh_impl(bvh: BVH, p, max_iters=None):
    """Batched BVH closest-triangle search. p: (B, 3) f32.

    Returns (best_d2 (B,), best_idx (B,) int32 into tri_rows).
    State per lane: current heap node, a depth-sized stack (one-hot
    push/pop -- no narrow scatters), best-so-far.
    """
    node_rows, tri_rows = bvh.node_rows, bvh.tri_rows
    T2 = tri_rows.shape[0]
    S = bvh.depth + 1
    if max_iters is None:
        max_iters = 4 * T2
    B = p.shape[0]

    # Phase 0 -- greedy seed: descend always-nearer to ONE leaf and evaluate
    # its triangle. This is a true upper bound on the closest distance (and
    # usually the exact answer), which makes the DFS prune effective even
    # for deep-interior points where all surface leaves are equidistant.
    seed = jnp.full((B,), 1, jnp.int32)
    for _ in range(max(bvh.depth, 0)):
        nrow = node_rows[jnp.clip(seed, 1, node_rows.shape[0] - 1)]
        dl = _tri.aabb_dist2(p, nrow[..., 0:3], nrow[..., 3:6])
        dr = _tri.aabb_dist2(p, nrow[..., 6:9], nrow[..., 9:12])
        nxt = jnp.where(dl <= dr, 2 * seed, 2 * seed + 1)
        seed = jnp.where(seed < T2, nxt, seed)
    seed_tid = jnp.clip(seed - T2, 0, T2 - 1)
    a, b, c = _tri_parts(tri_rows[seed_tid])
    closest, _ = _tri.closest_point_triangle(p, a, b, c)
    best_d2 = jnp.sum((p - closest) ** 2, axis=-1)
    best_idx = seed_tid

    stack = jnp.zeros((B, S), jnp.int32)
    sp = jnp.zeros((B,), jnp.int32)
    cur = jnp.full((B,), 1, jnp.int32)          # heap root
    active = jnp.ones((B,), bool)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)

    def cond(s):
        return jnp.any(s[3])

    def body(s):
        stack, sp, cur, active, best_d2, best_idx, it = s
        is_leaf = cur >= T2

        # --- leaf: evaluate the triangle ------------------------------
        tid = jnp.clip(cur - T2, 0, T2 - 1)
        rows = tri_rows[tid]                             # wide gather
        a, b, c = _tri_parts(rows)
        closest, _ = _tri.closest_point_triangle(p, a, b, c)
        d2 = jnp.sum((p - closest) ** 2, axis=-1)
        better = active & is_leaf & (d2 < best_d2)
        best_d2 = jnp.where(better, d2, best_d2)
        best_idx = jnp.where(better, tid, best_idx)

        # --- internal: child distances, descend nearer, push farther --
        nid = jnp.clip(cur, 1, node_rows.shape[0] - 1)
        nrow = node_rows[nid]                            # wide gather
        dl = _tri.aabb_dist2(p, nrow[..., 0:3], nrow[..., 3:6])
        dr = _tri.aabb_dist2(p, nrow[..., 6:9], nrow[..., 9:12])
        left = 2 * cur
        right = left + 1
        l_near = dl <= dr
        near = jnp.where(l_near, left, right)
        far = jnp.where(l_near, right, left)
        d_near = jnp.minimum(dl, dr)
        d_far = jnp.maximum(dl, dr)
        descend = active & ~is_leaf & (d_near < best_d2)
        push = descend & (d_far < best_d2)

        # push the far child (one-hot write at sp)
        mask = push[:, None] & (lane == sp[:, None])
        stack = jnp.where(mask, far[:, None], stack)
        sp = sp + push.astype(jnp.int32)

        # next node: descend, or pop, or deactivate
        need_pop = active & ~descend
        can_pop = need_pop & (sp > 0)
        sp_pop = jnp.maximum(sp - 1, 0)
        top = jnp.sum(jnp.where(lane == sp_pop[:, None], stack, 0), axis=1,
                      dtype=jnp.int32)
        cur = jnp.where(descend, near, jnp.where(can_pop, top, cur))
        sp = jnp.where(can_pop, sp_pop, sp)
        active = active & (descend | can_pop) & (it + 1 < max_iters)
        return stack, sp, cur, active, best_d2, best_idx, it + 1

    init = (stack, sp, cur, active, best_d2, best_idx, jnp.int32(0))
    *_, best_d2, best_idx, _ = jax.lax.while_loop(cond, body, init)
    return best_d2, best_idx


def signed_distance(bvh: BVH, pts, max_iters: int | None = None) -> jax.Array:
    """Signed distances via BVH traversal. pts: (B, 3) -> (B,) f32.

    Batched equivalent of Mesh::SignedDistanceAtPt(pt, bvh, threadIdx)
    (Mesh.cpp:54-63) -- per-thread traversal scratch becomes per-lane loop
    state. Exact by default; pass ``max_iters`` to bound work (the greedy
    seed keeps capped results a true upper bound with the right sign)."""
    p = jnp.asarray(pts, jnp.float32)
    _, best_idx = _closest_bvh_impl(bvh, p, max_iters=max_iters)
    return _signed_from_best(bvh.tri_rows, best_idx, p)


def signed_distance_brute(tri_rows, pts, chunk: int = 128) -> jax.Array:
    """O(T) scan oracle (Mesh::SignedDistanceAtPt without BVH,
    Mesh.cpp:42-51). tri_rows: (T2, TRI_W) packed rows (dummy rows are fine
    -- their distances are astronomically large)."""
    p = jnp.asarray(pts, jnp.float32)
    T2 = tri_rows.shape[0]
    pad = (-T2) % chunk
    if pad:
        tri_rows = jnp.concatenate(
            [tri_rows, jnp.full((pad, tri_rows.shape[1]), _bvh.BIG,
                                tri_rows.dtype)], axis=0)
    n_chunks = tri_rows.shape[0] // chunk
    chunks = tri_rows.reshape(n_chunks, chunk, -1)

    def body(carry, rows):
        best_d2, best_row = carry
        a, b, c = _tri_parts(rows[None])                 # (1, chunk, 3)
        closest, _ = _tri.closest_point_triangle(p[:, None, :], a, b, c)
        d2 = jnp.sum((p[:, None, :] - closest) ** 2, axis=-1)   # (B, chunk)
        k = jnp.argmin(d2, axis=-1)
        d2b = jnp.take_along_axis(d2, k[:, None], axis=1)[:, 0]
        better = d2b < best_d2
        rowb = rows[k]                                   # (B, TRI_W)
        best_row = jnp.where(better[:, None], rowb, best_row)
        return (jnp.where(better, d2b, best_d2), best_row), None

    init = (jnp.full((p.shape[0],), jnp.inf, jnp.float32),
            jnp.zeros((p.shape[0], tri_rows.shape[1]), tri_rows.dtype))
    (best_d2, best_row), _ = jax.lax.scan(body, init, chunks)
    a, b, c = _tri_parts(best_row)
    closest, feature = _tri.closest_point_triangle(p, a, b, c)
    pn = _pseudo_normal(best_row, feature)
    diff = p - closest
    dist = jnp.linalg.norm(diff, axis=-1)
    return jnp.where(jnp.sum(pn * diff, axis=-1) >= 0.0, 1.0, -1.0) * dist


def signed_distance_tiles(tri_rows, pts) -> jax.Array:
    """Exact signed distances by the dense Pallas tile scan
    (mesh/pallas_sdf.py) -- same contract as ``signed_distance_brute``
    (Mesh::SignedDistanceAtPt without BVH, Mesh.cpp:42-51) but shaped for
    the TPU VPU: one (triangles x points) distance-tile kernel instead of a
    sequential scan, then sign on the single best triangle."""
    p = jnp.asarray(pts, jnp.float32)
    _, best_idx = _pallas.closest_tri_tiles(tri_rows, p)
    return _signed_from_best(tri_rows, best_idx, p)


def mesh_sdf(mesh: TriMesh, bvh: BVH | None = None,
             max_iters: int | None = None, method: str = "bvh"):
    """Wrap a mesh as a batched SDF callable F: (K, 3) -> (K,) for
    build_octree (the reference wires this up in user/test code,
    MeshingUnitTests.cpp:110-138 + HPUnitTests.cpp:60-61).

    Fitting evaluates F at millions of quadrature points, many deep inside
    the surface where exact closest-triangle search degenerates to a full
    scan; the default bounds traversal at 48*depth iterations, which with
    the greedy seed is exact near the surface (where fit accuracy matters)
    and a tight upper bound deep inside. Pass ``max_iters=0`` for exact.

    ``method``: "bvh" (default, pruned traversal), "tiles" (exact dense
    Pallas tile scan -- O(T) per point but branch-free VPU work; the better
    choice on TPU for small/medium meshes), or "auto" (tiles for meshes up
    to ~16k triangles, bvh beyond).
    """
    if bvh is None:
        bvh = build_bvh(mesh)
    if method == "auto":
        method = "tiles" if bvh.n_leaves <= 16384 else "bvh"
    if method == "tiles":
        tri_rows = bvh.tri_rows

        def F_tiles(pts):
            return signed_distance_tiles(tri_rows, pts).astype(pts.dtype)

        return F_tiles
    if method != "bvh":
        raise ValueError(f"unknown mesh_sdf method {method!r}")
    if max_iters is None:
        max_iters = 48 * max(bvh.depth, 1)
    elif max_iters == 0:
        max_iters = None

    def F(pts):
        return signed_distance(bvh, pts, max_iters=max_iters).astype(
            pts.dtype)

    return F
