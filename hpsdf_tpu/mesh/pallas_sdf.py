"""Pallas TPU kernel: tiled points x triangles closest-distance scan.

The reference's exact signed-distance oracle is an O(T) scan per query point
(Mesh::SignedDistanceAtPt without a BVH, Source/Meshing/Mesh.cpp:42-51); its
fast path is a divergent best-first BVH walk (BVH.cpp:263-342). On TPU the
divergent walk is gather-bound, while the dense scan is exactly the shape the
VPU wants: a (triangles x points) tile of branch-free Ericson closest-point
arithmetic with a running min/argmin reduction. This module implements that
scan as one Pallas kernel:

  * grid (point-blocks, triangle-blocks); triangle blocks iterate innermost
    so the output block (one row per point block) stays resident in VMEM and
    accumulates the running best across triangle tiles.
  * triangles live on sublanes, points on lanes: every intermediate of the
    closest-point cascade is a (BT, BP) f32 tile, pure element-wise VPU work
    with no gathers and no MXU dependence.
  * the argmin is materialized as min-of-masked-iota so tie-breaking is
    deterministic (lowest triangle id wins, matching jnp.argmin).

The kernel returns (best squared distance, best triangle id); the sign +
pseudo-normal selection then runs on the single best triangle per point via
the shared epilogue in sdf.py (Baerentzen-Aanaes, Mesh.cpp:162-242).

Off-TPU the kernel runs in interpreter mode, so the same code path is
testable on the CPU backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bvh as _bvh

# Tile sizes: BP points on lanes, BT triangles on sublanes. The cascade keeps
# ~25 live (BT, BP) f32 tiles; swept on a v5e chip: (1024, 512) is fastest
# (~12.8 Gpairs/s) and fits VMEM; (512, 1024)/(2048, 256) overflow it.
BP = 1024
BT = 512
_EPS = 1e-30


def _closest_d2(px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz):
    """Squared distance from points to triangles, fully componentized.

    Point components are (1, BP); triangle components are (BT, 1); every
    derived quantity broadcasts to a (BT, BP) tile. Same region cascade as
    tri.closest_point_triangle (Ericson RTCD 5.1.5; reference
    Source/Meshing/Utility.cpp:5-97), minus the feature code.

    All constants are explicit f32: under jax_enable_x64 a bare Python float
    is a weak f64 that inserts an f64->f32 convert (tpu.truncf) which Mosaic
    cannot legalize."""
    zero = jnp.float32(0.0)
    eps = jnp.float32(_EPS)
    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx - ax, cy - ay, cz - az

    apx, apy, apz = px - ax, py - ay, pz - az
    d1 = abx * apx + aby * apy + abz * apz
    d2 = acx * apx + acy * apy + acz * apz

    bpx, bpy, bpz = px - bx, py - by, pz - bz
    d3 = abx * bpx + aby * bpy + abz * bpz
    d4 = acx * bpx + acy * bpy + acz * bpz

    cpx, cpy, cpz = px - cx, py - cy, pz - cz
    d5 = abx * cpx + aby * cpy + abz * cpz
    d6 = acx * cpx + acy * cpy + acz * cpz

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    in_a = (d1 <= zero) & (d2 <= zero)
    in_b = (d3 >= zero) & (d4 <= d3)
    in_c = (d6 >= zero) & (d5 <= d6)
    in_ab = (vc <= zero) & (d1 >= zero) & (d3 <= zero)
    in_ca = (vb <= zero) & (d2 >= zero) & (d6 <= zero)
    in_bc = (va <= zero) & (d4 - d3 >= zero) & (d5 - d6 >= zero)

    t_ab = d1 / jnp.where(jnp.abs(d1 - d3) > eps, d1 - d3, eps)
    t_ca = d2 / jnp.where(jnp.abs(d2 - d6) > eps, d2 - d6, eps)
    den_bc = (d4 - d3) + (d5 - d6)
    t_bc = (d4 - d3) / jnp.where(jnp.abs(den_bc) > eps, den_bc, eps)

    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) > eps, denom, eps)
    v = vb / denom
    w = vc / denom

    # closest-point components via the same first-true-wins cascade
    def pick(face, on_bc, on_ca, on_ab, vc_, vb_, va_):
        out = face
        out = jnp.where(in_bc, on_bc, out)
        out = jnp.where(in_ca, on_ca, out)
        out = jnp.where(in_ab, on_ab, out)
        out = jnp.where(in_c, vc_, out)
        out = jnp.where(in_b, vb_, out)
        out = jnp.where(in_a, va_, out)
        return out

    qx = pick(ax + abx * v + acx * w, bx + (cx - bx) * t_bc,
              ax + acx * t_ca, ax + abx * t_ab, cx, bx, ax)
    qy = pick(ay + aby * v + acy * w, by + (cy - by) * t_bc,
              ay + acy * t_ca, ay + aby * t_ab, cy, by, ay)
    qz = pick(az + abz * v + acz * w, bz + (cz - bz) * t_bc,
              az + acz * t_ca, az + abz * t_ab, cz, bz, az)

    dx, dy, dz = px - qx, py - qy, pz - qz
    return dx * dx + dy * dy + dz * dz


def _kernel(pts_ref, tri_ref, d2_ref, idx_ref):
    j = pl.program_id(1)
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    t = tri_ref[...]
    d2 = _closest_d2(
        px, py, pz,
        t[:, 0:1], t[:, 1:2], t[:, 2:3],
        t[:, 3:4], t[:, 4:5], t[:, 5:6],
        t[:, 6:7], t[:, 7:8], t[:, 8:9])                  # (BT, BP)

    # int32 throughout: under jax_enable_x64 a bare Python int would promote
    # to int64, which Mosaic cannot lower (its convert helper recurses).
    loc_min = jnp.min(d2, axis=0, keepdims=True)          # (1, BP)
    ii = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    nt = jnp.int32(d2.shape[0])
    loc_arg = jnp.min(jnp.where(d2 <= loc_min, ii, nt),
                      axis=0, keepdims=True)
    gidx = loc_arg + j.astype(jnp.int32) * nt

    @pl.when(j == 0)
    def _():
        d2_ref[...] = loc_min
        idx_ref[...] = gidx

    @pl.when(j > 0)
    def _():
        better = loc_min < d2_ref[...]
        idx_ref[...] = jnp.where(better, gidx, idx_ref[...])
        d2_ref[...] = jnp.where(better, loc_min, d2_ref[...])


def _should_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_tri_tiles(tri_rows: jax.Array, pts: jax.Array,
                      interpret: bool | None = None):
    """Exact closest triangle per point by dense tiled scan.

    tri_rows: (T, >=9) packed triangle rows (bvh.TRI_W layout; padding rows
    of coordinate BIG are never selected). pts: (B, 3) f32.
    Returns (best_d2 (B,) f32, best_idx (B,) i32 into tri_rows).
    """
    if interpret is None:
        interpret = _should_interpret()
    p = jnp.asarray(pts, jnp.float32)
    B = p.shape[0]
    T = tri_rows.shape[0]
    Bp = -(-B // BP) * BP
    Tp = -(-T // BT) * BT

    pts_t = jnp.zeros((3, Bp), jnp.float32).at[:, :B].set(p.T)
    verts = jnp.full((Tp, 16), _bvh.BIG, jnp.float32)
    verts = verts.at[:T, :9].set(tri_rows[:, :9].astype(jnp.float32))

    grid = (Bp // BP, Tp // BT)
    # Trace the kernel with x64 disabled: under jax_enable_x64 the grid /
    # index arithmetic becomes i64 and Mosaic fails to legalize the kernel
    # (observed as "failed to legalize operation 'func.return'"). All
    # operands are explicit f32/i32, so 32-bit tracing is exact.
    with jax.enable_x64(False):
        d2, idx = _call_kernel(pts_t, verts, grid, Bp, interpret)
    return d2[0, :B], jnp.clip(idx[0, :B], 0, T - 1)


def _call_kernel(pts_t, verts, grid, Bp, interpret):
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, BP), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 16), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BP), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(pts_t, verts)
