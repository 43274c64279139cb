"""Headline benchmark: sphere-traced Mrays/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

``python bench.py --suite`` additionally runs the full benchmark suite
mirroring the reference's Tests executable (Source/Tests/HPBenchmarks.cpp
:25-236 and MeshingBenchmarks.cpp:24-111 -- fit, fit+continuity, 8M random
/ grid / gradient queries, union rebuild, obj parse, mesh build, BVH build,
signed-distance queries) and writes BENCH_SUITE.json. Every row carries an
honest per-row ``device`` label (fits run on the accelerator via the
compensated double-float path; the f64 CG and host precomputes say so).

Protocol
--------
* Fits run ON the accelerator with fit_dtype="compensated" (the df64
  projection; build.py). Timing is the WARM protocol: one build warms the
  process-wide program caches (compile time is excluded, as the reference's
  C++ compile is), then a build of a slightly different radius is timed --
  different coefficients everywhere defeat the axon tunnel's
  per-(executable, args) result caching while hitting the compiled
  programs.
* Sphere-trace timing: REPS full traces inside ONE jitted fori_loop with
  per-iteration camera jitter, ending in a scalar readback (amortizes the
  tunnel dispatch round trip; the number reflects on-device work).
* Roofline: the march is gather-bound; the headline reports the achieved
  row-gather bandwidth against the chip's HBM peak (v5e: 819 GB/s) from
  the measured outer-relocation counts -- every relocation round moves one
  (1 + extra_rounds) x width row per ray lane.
* ``vs_baseline``: the reference is a CPU-only C++ library with no
  published machine-readable numbers (BASELINE.md) and cannot be built
  here (vendored Eigen needs egress). The denominator is the SAME traced
  workload on this host's multithreaded XLA CPU backend.
* ``fit_time_cold_s`` is dominated by the axon REMOTE COMPILE FARM's
  latency, which varies ~80x with load (measured round 4: the identical
  2-program fresh-HLO build compiled in 21.4 s at one point and 1098 s
  hours later; local compilation is unavailable -- libtpu version
  mismatch). The controllable part -- program count -- is 2 compiled + 2
  speculative for this build (round 3: dozens), reported as
  ``fit_programs_compiled``/``fit_programs_speculative`` in the detail.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import accel, df64
from hpsdf_tpu.render import MARCH_CHUNK, camera_rays, _march, _march_block

WIDTH = HEIGHT = 1024
CPU_WIDTH = CPU_HEIGHT = 256
T_MAX = 5.0
REPS = 10
HBM_PEAK_GBPS = 819.0      # v5e HBM bandwidth (public spec)


def _dev():
    return jax.devices()[0]


def _is_accel():
    return _dev().platform != "cpu"


def _fit_cfg(radius_jitter=0.0, **kw):
    base = dict(target_error=1e-7, continuity=False, max_depth=5,
                max_degree=6,
                fit_dtype="compensated" if _is_accel() else "float64")
    base.update(kw)
    return hp.Config(**base)


def build_tree(radius=0.3, **kw):
    cfg = _fit_cfg(**kw)
    t0 = time.perf_counter()
    tree = hp.build_octree(cfg, df64.Sphere(radius))
    return tree, time.perf_counter() - t0


def time_trace(packed, device, width, height, reps, cone: bool = True,
               use_lod: bool = True):
    packed = jax.tree.map(lambda x: jax.device_put(np.asarray(x), device),
                          packed)
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=width, height=height)
    o = jax.device_put(np.asarray(o), device)
    d = jax.device_put(np.asarray(d), device)
    from hpsdf_tpu.render import CONE_TILE
    tiles = ((height, width, CONE_TILE) if cone else None)

    def traced(o, d):
        def body(i, acc):
            # per-iteration origin jitter: distinct work every rep, same leaf
            # structure; magnitude well below a pixel footprint
            oj = o + (i.astype(jnp.float32) * 1e-6)
            t, hit, _ = _march(packed, oj, d, jnp.float32(T_MAX),
                               1e-4, 200, cone_tiles=tiles, use_lod=use_lod)
            return acc + jnp.sum(t) + jnp.sum(hit)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    fn = jax.jit(traced)
    # compile + warm (first execution; excluded from timing)
    float(fn(o, d))
    # fresh args => fresh execution (tunnel caches by (executable, args))
    o2 = o + 0.5e-6
    t0 = time.perf_counter()
    val = float(fn(o2, d))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(val)
    # hit fraction via one plain trace
    t, hit, _ = jax.jit(lambda o, d: _march(packed, o, d, jnp.float32(T_MAX),
                                            1e-4, 200, cone_tiles=tiles,
                                            use_lod=use_lod))(o, d)
    n_hit = float(jnp.mean(hit))
    return (width * height) / dt / 1e6, n_hit


# Measured cost of the TPU's dynamic-gather path (experiments/
# gather_probe2.py, v5e, round 4): row gathers are ROW-COUNT-bound and
# essentially FLAT at ~3.5 ns/row for widths 8..128 f32 lanes (random,
# coherent and sorted indices within ~10% of each other), rising to ~5 ns
# at 160-256 lanes and ~7.1 ns at 464-512. Far below HBM streaming peak --
# this per-row cost is the march's REAL memory ceiling. The round-3 model
# (3.7 ns <= 32 lanes, 9.9 ns @ 96) over-charged mid widths; these are the
# re-measured points, linearly interpolated and CLAMPED past the last
# measurement (callers see gather_model='extrapolated' beyond 512 lanes).
_GATHER_NS_POINTS = ((8, 3.5), (128, 3.6), (160, 5.0), (256, 5.3),
                     (464, 7.1), (512, 7.1))


def _gather_ns_per_row(width_lanes: int) -> float:
    pts = _GATHER_NS_POINTS
    if width_lanes <= pts[0][0]:
        return pts[0][1]
    for (w0, n0), (w1, n1) in zip(pts, pts[1:]):
        if width_lanes <= w1:
            return n0 + (n1 - n0) * (width_lanes - w0) / (w1 - w0)
    return pts[-1][1]          # clamp: no extrapolation past measurements


def _gather_model_label(width_lanes: int) -> str:
    return ("measured" if width_lanes <= _GATHER_NS_POINTS[-1][0]
            else "extrapolated")


def trace_roofline(packed, device, width, height, secs_per_frame):
    """Gather-bandwidth roofline of the march under the round-5 cone +
    compaction schedule: (cone rounds x coarse rays + pass-1 chunk rounds
    + tail chunk rounds) x (1 + extra_rounds) row gathers x row bytes, vs
    (a) the HBM streaming peak and (b) the measured dynamic-gather path
    ceiling. Mirrors the timed path exactly (same cone tiles)."""
    from hpsdf_tpu.accel import LO_W
    from hpsdf_tpu.render import (CONE_TILE, SORT_BLOCK, _lo_of,
                                  _march_compacted, cone_start)

    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=width, height=height)
    B = o.shape[0]
    o = jax.device_put(jnp.asarray(o, jnp.float32), device)
    d = jax.device_put(jnp.asarray(d, jnp.float32), device)
    pad = (-B) % MARCH_CHUNK
    Bp = B + pad
    lo = _lo_of(packed)
    lo_w = LO_W if lo is not None else packed.width

    use_cone = lo is None              # mirror _march's schedule policy

    @jax.jit
    def rounds(o, d):
        if use_cone:
            ts, k_cone, n_coarse = cone_start(
                packed, o, d, T_MAX, 1e-4, (height, width, CONE_TILE),
                lo=lo, with_stats=True)
        else:
            ts, k_cone, n_coarse = None, jnp.int32(0), 0
        o2 = jnp.concatenate([o, jnp.full((pad, 3), 10.0, jnp.float32)])
        d2 = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0., 0., 1.]], jnp.float32),
                         (pad, 1))])
        ts2 = (jnp.concatenate([ts, jnp.zeros(pad, jnp.float32)])
               if ts is not None else None)
        _, _, _, aux = _march_compacted(packed, o2, d2, jnp.float32(T_MAX),
                                        1e-4, 200, None, lo, t_start=ts2,
                                        with_stats=True)
        return aux + (k_cone, n_coarse)

    kk1, kk2, n_blk, k_cone, n_coarse = jax.tree.map(
        np.asarray, rounds(o, d))
    rows_per_round = 1 + packed.extra_rounds       # grid row + descent rows
    cone_rows = float(k_cone) * float(n_coarse) * rows_per_round
    lod_rounds = float(kk1[:, 0].sum() + kk2[:, 0].sum()) * MARCH_CHUNK
    full_rounds = float(kk1[:, 1].sum() + kk2[:, 1].sum()) * MARCH_CHUNK
    # the cone marches the LOD tables when present, full rows otherwise
    lod_rows = lod_rounds * rows_per_round + (cone_rows if lo is not None
                                              else 0.0)
    full_rows = full_rounds * rows_per_round + (0.0 if lo is not None
                                                else cone_rows)
    gbytes = (lod_rows * lo_w + full_rows * packed.width) * 4 / 1e9
    achieved = gbytes / secs_per_frame
    # width-aware gather-path ceiling: time the measured per-row costs say
    # these gathers MUST take; fraction of the frame explained by gathers
    gather_floor_s = (lod_rows * _gather_ns_per_row(LO_W)
                      + full_rows * _gather_ns_per_row(packed.width)) * 1e-9
    path_gbps = gbytes / gather_floor_s if gather_floor_s else 0.0
    return dict(
        gather_model=_gather_model_label(packed.width),
        cone_rounds=int(k_cone), cone_rays=int(n_coarse),
        pass1_chunk_rounds=int(kk1.sum()),
        tail_chunk_rounds=int(kk2.sum()),
        active_blocks_after_pass1_fraction=round(
            float(n_blk) / (Bp // SORT_BLOCK), 4),
        lod_rounds_fraction=round(
            lod_rounds / max(lod_rounds + full_rounds, 1), 3),
        row_width_lanes=packed.width,
        gather_gbytes_per_frame=round(gbytes, 3),
        achieved_gather_gbps=round(achieved, 1),
        hbm_peak_gbps=HBM_PEAK_GBPS,
        roofline_fraction_hbm=round(achieved / HBM_PEAK_GBPS, 4),
        gather_path_gbps=round(path_gbps, 1),
        gather_path_fraction=round(achieved / max(path_gbps, 1e-9), 4),
    )


# --------------------------------------------------------------------------
# Full suite (reference: HPBenchmarks.cpp + MeshingBenchmarks.cpp)
# --------------------------------------------------------------------------


def _amortized(fn, args, reps):
    """Seconds per call, REPS calls inside one jitted fori_loop (defeats
    the axon tunnel's per-(executable, args) caching; see module doc)."""
    def loop(*a):
        def body(i, acc):
            out = fn(*((a[0] + i.astype(a[0].dtype) * 1e-7,) + a[1:]))
            return acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    jl = jax.jit(loop)
    float(jl(*args))
    bumped = (args[0] + 0.5e-7,) + args[1:]
    t0 = time.perf_counter()
    float(jl(*bumped))
    return (time.perf_counter() - t0) / reps


def run_suite():
    from hpsdf_tpu import native
    from hpsdf_tpu.mesh import build_bvh, gen
    from hpsdf_tpu.mesh import sdf as msdf
    from hpsdf_tpu.mesh.obj import load_obj
    from hpsdf_tpu.mesh.core import build_mesh
    from hpsdf_tpu.render import _normals_at

    results = []
    dev = _dev()
    accel_name = str(dev.platform)
    rng = np.random.default_rng(0)

    def rec(metric, value, unit, device, **detail):
        row = {"metric": metric, "value": round(value, 4), "unit": unit,
               "device": device, **detail}
        results.append(row)
        print(json.dumps(row))
        # incremental write: a partial suite run still leaves a valid file
        with open("BENCH_SUITE.json", "w") as fh:
            json.dump(results, fh, indent=1)

    fit_dev = accel_name if _is_accel() else "cpu"
    fit_dtype = "compensated" if _is_accel() else "float64"

    # --- fit (HPBenchmarks.cpp:25-48 config at reduced scale; the full
    # reference-default config is the _refdefault row below) ---------------
    cfgw = _fit_cfg(nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                    nearness_strength=1.0)
    hp.build_octree(cfgw, df64.Sphere(0.3))          # warm the programs
    t0 = time.perf_counter()
    tree = hp.build_octree(cfgw, df64.Sphere(0.301))
    rec("octree_fit_sphere", time.perf_counter() - t0, "s", fit_dev,
        nodes=tree.n_nodes, fit_dtype=fit_dtype,
        protocol="warm build, jittered radius (compiles excluded)")

    # --- reference-default scale (HPBenchmarks.cpp:25-48 verbatim:
    # sphere r=0.5 at (0.25,0,0), thr 1e-10, exp weighting 3.0, full
    # degree-12/depth-10 caps) ---------------------------------------------
    cfgr = _fit_cfg(target_error=1e-10,
                    nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                    nearness_strength=3.0, max_degree=12, max_depth=10,
                    node_capacity=600000)
    hp.build_octree(cfgr, df64.Sphere(0.5, centre=(0.25, 0.0, 0.0)))
    from hpsdf_tpu.build import _FitCache
    _FitCache.timing_log = fit_log = []
    t0 = time.perf_counter()
    tree_r = hp.build_octree(cfgr, df64.Sphere(0.4993,
                                               centre=(0.25, 0.0, 0.0)))
    refdefault_wall = time.perf_counter() - t0
    _FitCache.timing_log = None
    disp_wall = sum(x[2] for x in fit_log)
    coll_wall = sum(x[3] for x in fit_log)
    per_deg = {}
    for dg, m, dd, dc in fit_log:
        n, tt, mm = per_deg.get(dg, (0, 0.0, 0))
        per_deg[dg] = (n + 1, tt + dd + dc, mm + m)
    rec("octree_fit_sphere_refdefault", refdefault_wall, "s",
        fit_dev, nodes=tree_r.n_nodes, deg_used=tree_r.deg_used,
        depth_used=tree_r.depth_used, fit_dtype=fit_dtype,
        target_error=1e-10,
        protocol="warm build, jittered radius (compiles excluded)",
        phases={
            "fit_calls": len(fit_log),
            "fit_dispatch_s": round(disp_wall, 3),
            "fit_collect_s": round(coll_wall, 3),
            "host_topology_s": round(
                refdefault_wall - disp_wall - coll_wall, 3),
            "per_degree": {str(d): {"calls": v[0],
                                    "wall_s": round(v[1], 3),
                                    "cells": v[2]}
                           for d, v in sorted(per_deg.items())},
            "note": "round-5 pipelined dispatch: each refinement round "
                    "issues the p- and h-candidate fits of ALL degree "
                    "groups (one packed output array each) before reading "
                    "any result back, so per-dispatch tunnel latencies "
                    "(~0.1-0.2 s; ~93% of the round-4 serialized build) "
                    "overlap. Device compute for the whole refdefault "
                    "build remains ~0.2 s (F-eval 1.1-1.4 Gpts/s + df64 "
                    "projection 1.1-1.3 Gpts/s, experiments/"
                    "fit_roofline2.py); per_degree wall_s = dispatch + "
                    "collect per group and OVERLAPS other groups' device "
                    "work, so the per-degree sum can exceed the build "
                    "wall",
        })

    # --- sphere trace on the reference-default tree (high degree: wide
    # coefficient rows; the march's LOD phase covers the far field on
    # 32-lane deg<=2 tables, see accel.lo_pack) ----------------------------
    from hpsdf_tpu.render import INNER_STEPS_LO, _inner_steps_for
    packed_r = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                            accel.pack_tree(tree_r))
    mrays_r, _ = time_trace(packed_r, dev, 1024, 1024, 5)
    rec("sphere_trace_refdefault_1024sq", mrays_r, "Mrays/s", accel_name,
        deg_used=tree_r.deg_used, depth_used=tree_r.depth_used,
        row_width=packed_r.width, grid_depth=packed_r.grid_depth,
        inner_steps=_inner_steps_for(packed_r),
        inner_steps_lo=INNER_STEPS_LO,
        note="compact schedule (capped pass + step-rate recompaction, "
             "round 5; cone prepass disabled on LOD trees by the measured "
             "policy in render._march)")

    # --- fit + continuity (HPBenchmarks.cpp:51-75) ------------------------
    cfgc = _fit_cfg(target_error=1e-6, continuity=True,
                    continuity_strength=8.0, max_depth=5, max_degree=4)
    hp.build_octree(cfgc, df64.Sphere(0.3))
    t0 = time.perf_counter()
    tree_c = hp.build_octree(cfgc, df64.Sphere(0.301))
    cg_label = ("f32 CG on-device + f64 host refinement" if _is_accel()
                else "f64 CG")
    rec("octree_fit_continuity", time.perf_counter() - t0, "s",
        f"{fit_dev}(fit+CG)+cpu(assembly/refine)", nodes=tree_c.n_nodes,
        fit_dtype=fit_dtype, cg=cg_label)

    # --- union rebuild (HPBenchmarks.cpp:206-236) -------------------------
    def box(p):
        q = jnp.abs(p) - 0.2
        return (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
                + jnp.minimum(jnp.max(q, axis=-1), 0.0))

    hp.union_sdf(tree, box)                          # warm CSG programs
    t0 = time.perf_counter()
    hp.union_sdf(tree, box)
    rec("union_rebuild", time.perf_counter() - t0, "s", fit_dev,
        fit_dtype=fit_dtype,
        note="round-1's 11s-vs-22.6s discrepancy was compile-cache state; "
             "CSG programs are now cached process-wide (CapturedSDF) and "
             "the warm number is the steady-state rebuild cost")

    packed = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                          accel.pack_tree(tree))

    # --- 8M random queries (HPBenchmarks.cpp:78-115) -----------------------
    N = 8 << 20
    pts = jax.device_put(rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32),
                         dev)
    dt = _amortized(lambda p: accel.query_packed(packed, p), (pts,), 5)
    rec("query_random_8m", N / dt / 1e6, "Mqueries/s", accel_name)

    # --- 8M grid queries, 200^3 pattern (HPBenchmarks.cpp:118-166) --------
    g = 200
    ax = np.linspace(-0.5, 0.5, g, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    gpts = jax.device_put(
        np.stack([gx, gy, gz], -1).reshape(-1, 3), dev)
    dt = _amortized(lambda p: accel.query_packed(packed, p), (gpts,), 5)
    rec("query_grid_200cubed", gpts.shape[0] / dt / 1e6, "Mqueries/s",
        accel_name)

    # --- 8M gradient queries, packed f32 serving path ----------------------
    def qgrad(p):
        return accel.values_at(packed, p), _normals_at(packed, p)

    dt = _amortized(qgrad, (pts,), 5)
    rec("query_with_gradient_8m", N / dt / 1e6, "Mqueries/s", accel_name,
        path="packed f32 + analytic normals")

    # --- f64 QueryWithGradient parity path (HPBenchmarks.cpp:169-203):
    # the generic f64 descent + analytic gradients; f64 means host CPU ----
    cpu = jax.devices("cpu")[0]
    pts64 = jax.device_put(rng.uniform(-0.5, 0.5, (1 << 20, 3)), cpu)
    tree_cpu = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), cpu), tree)
    dt = _amortized(lambda p: hp.query_with_gradient(tree_cpu, p),
                    (pts64,), 3)
    rec("query_with_gradient_f64_1m", pts64.shape[0] / dt / 1e6,
        "Mqueries/s", "cpu", path="generic f64 descent (reference parity)")

    # --- mesh pipeline at reference scale (MeshingBenchmarks.cpp:24-111
    # runs a 1.6M-tri Ramesses.obj; asset absent -> generated 1.31M-tri
    # bumpy sphere, same pipeline). These rows time HOST-side construction:
    # drain any background speculative fit compiles first (round-4's BVH
    # row read 13.5 s against 4.6 s on an idle host -- compile threads
    # were still running; round-4 verdict weak #2) -------------------------
    from hpsdf_tpu.build import wait_for_speculation
    wait_for_speculation()
    vb, fb = gen.bumpy_sphere(0.3, 8)                # 1,310,720 tris
    obj_path = "/tmp/hpsdf_bench_1p3m.obj"
    gen.save_obj(obj_path, vb, fb)
    t0 = time.perf_counter()
    v2, f2, _ = load_obj(obj_path)
    rec("obj_parse_1p3m", time.perf_counter() - t0, "s", "cpu",
        faces=int(len(f2)), native=native.available())
    t0 = time.perf_counter()
    mesh_big = build_mesh(vb, fb)
    rec("mesh_build_halfedges_1p3m", time.perf_counter() - t0, "s", "cpu",
        native=native.available())
    # host-pinned construction: the row measures BVH::Create-equivalent work
    # (the reference is CPU-only); shipping the ~400 MB row tables to the
    # accelerator is an untimed explicit device_put below -- through the
    # axon debug tunnel that copy alone costs ~19 s and would swamp the row
    cpu0 = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu0):
        bvh_big = build_bvh(mesh_big)
        jax.block_until_ready(bvh_big.tri_rows)
    rec("bvh_build_1p3m", time.perf_counter() - t0, "s", "cpu",
        tris=mesh_big.n_faces, layout="kd-order + perfect heap",
        note="host construction; accelerator upload excluded (explicit "
             "device_put, tunnel-dominated here)")

    bvh_big = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                           bvh_big)
    qp = jax.device_put(
        rng.uniform(-0.5, 0.5, (10240, 3)).astype(np.float32), dev)
    lo, hi = msdf.cluster_aabbs(bvh_big)

    # the mesh arrays MUST travel as jit arguments: closed over, the 268 MB
    # tri_rows become compile-request constants (tunnel rejects them)
    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("reps",))
    def hybrid_loop(p, lo_, hi_, nr, tr, reps):
        def body(i, acc):
            d2, idx, _ = msdf._hybrid_closest(
                lo_, hi_, nr, tr, p + i.astype(jnp.float32) * 1e-7,
                msdf.HYBRID_K1, msdf.HYBRID_K2)
            return acc + jnp.sum(msdf._signed_from_best(tr, idx, p))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    args = (lo, hi, bvh_big.node_rows, bvh_big.tri_rows)
    float(hybrid_loop(qp, *args, reps=5))
    dt = np.inf          # best of 3 timed passes (tunnel load is noisy)
    for trial in range(3):
        q2 = qp + np.float32((trial + 1) * 1e-7)
        t0 = time.perf_counter()
        float(hybrid_loop(q2, *args, reps=5))
        dt = min(dt, (time.perf_counter() - t0) / 5)
    rec("hybrid_signed_distance_10k_1p3m", qp.shape[0] / dt / 1e3,
        "Kqueries/s", accel_name, tris=mesh_big.n_faces,
        path="two-level kd-cluster prune + exact refine (fixed-K)")

    # --- 100 brute-force queries at 1.3M tris (MeshingBenchmarks.cpp:93-111
    # runs 100 O(T) scans; the Pallas tile kernel IS that scan, batched).
    # tri_rows MUST travel as a jit argument: closed over, the 268 MB array
    # becomes a compile-request constant (tunnel rejects it, HTTP 413) -----
    qp100 = qp[:128]

    @_ft.partial(jax.jit, static_argnames=("reps",))
    def brute_loop(p, tr, reps):
        def body(i, acc):
            return acc + jnp.sum(msdf.signed_distance_tiles(
                tr, p + i.astype(jnp.float32) * 1e-7))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(brute_loop(qp100, bvh_big.tri_rows, reps=3))
    dt = np.inf
    for trial in range(3):
        q2 = qp100 + np.float32((trial + 1) * 1e-7)
        t0 = time.perf_counter()
        float(brute_loop(q2, bvh_big.tri_rows, reps=3))
        dt = min(dt, (time.perf_counter() - t0) / 3)
    rec("brute_signed_distance_100_1p3m", qp100.shape[0] / dt,
        "queries/s", accel_name, tris=mesh_big.n_faces, kernel="pallas",
        note="O(T) scan per query, reference brute-force parity row")

    # --- 20k-tri rows kept for round-over-round comparability -------------
    vi, fi = gen.icosphere(0.3, 5)                   # 20,480 tris
    mesh_s = build_mesh(vi, fi)
    bvh_s = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                         build_bvh(mesh_s))
    dt = _amortized(lambda p: msdf.signed_distance(bvh_s, p), (qp,), 3)
    rec("bvh_signed_distance_10k", qp.shape[0] / dt / 1e3, "Kqueries/s",
        accel_name, tris=mesh_s.n_faces)
    dt = _amortized(
        lambda p: msdf.signed_distance_tiles(bvh_s.tri_rows, p), (qp,), 3)
    rec("tiles_signed_distance_10k", qp.shape[0] / dt / 1e3, "Kqueries/s",
        accel_name, tris=mesh_s.n_faces, kernel="pallas")

    # --- compile-heavy new rows LAST so a slow compile farm cannot
    # starve the legacy suite rows (file is written incrementally) --
    # --- wide-row serving (deg >= 8): depth-capped build forces
    # p-refinement into genuinely wide coefficient rows, stress-testing the
    # LOD tables and wide-gather path (round-3 verdict weak #6) -----------
    cfgw8 = _fit_cfg(target_error=1e-12, max_degree=12, max_depth=4,
                     nearness_weighting=hp.NearnessWeighting.NONE)
    hp.build_octree(cfgw8, df64.Sphere(0.31))
    t0 = time.perf_counter()
    tree_w = hp.build_octree(cfgw8, df64.Sphere(0.312))
    fit_w = time.perf_counter() - t0
    packed_w = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                            accel.pack_tree(tree_w))
    mrays_w, _ = time_trace(packed_w, dev, 1024, 1024, 5)
    rec("sphere_trace_wide_row_1024sq", mrays_w, "Mrays/s", accel_name,
        deg_used=tree_w.deg_used, depth_used=tree_w.depth_used,
        row_width=packed_w.width, grid_depth=packed_w.grid_depth,
        fit_time_s=round(fit_w, 3), nodes=tree_w.n_nodes,
        note="depth-capped (<=4) build p-refined to wide rows; LOD "
             "far-field phase active when width > 32")

    # --- wide-row with the LOD phase disabled (round-4 verdict item 7:
    # round 3 asked for the sweep with AND without LOD) ---------------------
    mrays_wn, _ = time_trace(packed_w, dev, 1024, 1024, 5, use_lod=False)
    rec("sphere_trace_wide_row_lod_off_1024sq", mrays_wn, "Mrays/s",
        accel_name, row_width=packed_w.width,
        note="same tree/march as sphere_trace_wide_row_1024sq with the "
             "32-lane far-field LOD tables disabled: every round gathers "
             "full-width rows")

    # --- refdefault grid-depth sweep (round-4 verdict item 7: grid depth
    # 5 vs 6 / byte budget on the tree most likely to move) ----------------
    packed_r6 = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), dev),
        accel.pack_tree(tree_r, grid_depth=6))
    mrays_r6, _ = time_trace(packed_r6, dev, 1024, 1024, 5)
    rec("sphere_trace_refdefault_gd6_1024sq", mrays_r6, "Mrays/s",
        accel_name, row_width=packed_r6.width, grid_depth=6,
        grid_mbytes=round(packed_r6.grid.size * 4 / 1e6, 1),
        note="grid at depth 6 (67 MB table, past the ~16 MB fast-gather "
             "regime) removes the one masked descent round of the "
             "default gd=5 pack -- measures the table-size vs row-count "
             "trade on the reference-default tree")

    # (the 260k-leaf continuity row runs as its OWN process --
    # `python bench.py --contscale`, which APPENDS to BENCH_SUITE.json:
    # in-suite, the row's mixed CG killed the TPU worker in rounds 4 and 5
    # even after the matvec was chunked, while the identical computation
    # survives in a fresh process -- the trigger is the suite's ~1.5 GB of
    # accumulated device residency ahead of the CG's ~0.8 GB COO upload)

    with open("BENCH_SUITE.json", "w") as fh:
        json.dump(results, fh, indent=1)
    return results


def run_contscale():
    """Continuity at 260k leaves (round-3 verdict item 7 / round-4 item 4)
    as a standalone process; appends its row to BENCH_SUITE.json."""
    import hpsdf_tpu.continuity as cont

    fit_dev = _dev().platform if _is_accel() else "cpu"
    cfg_s = _fit_cfg(target_error=3e-9, continuity=False, max_depth=7,
                     max_degree=2, node_capacity=1_000_000,
                     nearness_weighting=hp.NearnessWeighting.NONE)
    tree_s = hp.build_octree(cfg_s, df64.Sphere(0.3))
    t0 = time.perf_counter()
    stv, R_, C_, V_ = cont.assemble_face_matrix(tree_s)
    t_asm = time.perf_counter() - t0
    t0 = time.perf_counter()
    import dataclasses as _dc
    tree_sc = _dc.replace(
        tree_s, config=_dc.replace(tree_s.config, continuity=True,
                                   continuity_strength=8.0,
                                   enable_logging=True))
    cont.enforce_continuity(tree_sc)
    t_total = time.perf_counter() - t0
    row = {"metric": "continuity_scale_260k_leaves",
           "value": round(t_total, 4), "unit": "s",
           "device": f"{fit_dev}(CG)+cpu(assembly)",
           "leaves": int(tree_s.num_leaves()),
           "face_pairs_and_assembly_s": round(t_asm, 2),
           "nnz": int(R_.size), "n_coeffs": int(stv.n_coeffs),
           "note": "standalone process (appended to the suite). Root "
                   "cause of the round-4/5 crashes at this row: a single "
                   "CG program running hundreds of iterations over the "
                   "62M-entry system executes for minutes and the TPU "
                   "worker kills it (reproduced in a fresh process; "
                   "independent of matvec shape or device residency). "
                   "The mixed CG now runs 50-iteration warm-restarted "
                   "segments (continuity._cg_solve_mixed) and completes. "
                   "Wall includes assembly + the mixed-precision CG; the "
                   "separate assembly timing isolates the host-side "
                   "enumeration+emission phase"}
    print(json.dumps(row))
    try:
        with open("BENCH_SUITE.json") as fh:
            rows = [r for r in json.load(fh)
                    if r.get("metric") != "continuity_scale_260k_leaves"]
    except Exception:
        rows = []
    rows.append(row)
    with open("BENCH_SUITE.json", "w") as fh:
        json.dump(rows, fh, indent=1)
    return row


def run_nodeshard():
    """Node-sharded vs replicated query THROUGHPUT at a real 2.4M-node
    tree on the 8-virtual-device CPU mesh (round-4 verdict item 8: the
    memory analysis existed, the cost side was never timed). Writes
    NODESHARD_r05.json. Run with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 HPSDF_PLATFORM=cpu.
    """
    from hpsdf_tpu import consts, parallel
    from hpsdf_tpu.query import query as query_fn
    from hpsdf_tpu.tree import Octree
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) >= 8, "needs the 8-virtual-device CPU mesh"
    DEPTH = 7
    n_total = (8 ** (DEPTH + 1) - 1) // 7
    N = -(-n_total // 8) * 8
    cw = consts.coeff_count(2)
    rng = np.random.default_rng(0)

    # complete-octree topology in BFS level order: level l starts at
    # s_l = (8^l - 1)/7; node (s_l + j) has child block s_{l+1} + 8j
    child = np.full(N, -1, np.int32)
    depth = np.zeros(N, np.int32)
    degree = np.full(N, -1, np.int32)
    centre = np.zeros((N, 3), np.float64)
    start = 0
    for lvl in range(DEPTH + 1):
        cnt = 8 ** lvl
        nxt = start + cnt
        if lvl < DEPTH:
            child[start: start + cnt] = nxt + 8 * np.arange(cnt)
        else:
            degree[start: start + cnt] = 2
        depth[start: start + cnt] = lvl
        # centre from the node's octal path (digit d: x=bit0 y=bit1 z=bit2)
        j = np.arange(cnt, dtype=np.int64)
        c = np.zeros((cnt, 3))
        jj = j.copy()
        for lev in range(lvl, 0, -1):
            digit = jj % 8
            q = 2.0 ** -(lev + 1)
            c[:, 0] += q * ((digit & 1) * 2 - 1)
            c[:, 1] += q * (((digit >> 1) & 1) * 2 - 1)
            c[:, 2] += q * (((digit >> 2) & 1) * 2 - 1)
            jj //= 8
        centre[start: start + cnt] = c
        start = nxt
    coeffs = np.zeros((N, cw))
    leaf = degree >= 0
    coeffs[leaf] = rng.normal(0, 0.01, (int(leaf.sum()), cw))

    cfg = hp.Config(target_error=1e-4, continuity=False, max_depth=DEPTH,
                    max_degree=2)
    tree = Octree(child_idx=jnp.asarray(child), centre=jnp.asarray(centre),
                  depth=jnp.asarray(depth), degree=jnp.asarray(degree),
                  coeffs=jnp.asarray(coeffs), n_nodes=N, deg_used=2,
                  depth_used=DEPTH, config=cfg)
    mesh = parallel.make_mesh(node_parallel=8)
    NPTS = 1 << 20
    pts = rng.uniform(-0.5, 0.5, (NPTS, 3))

    def timed_query(shard_nodes):
        stree = parallel._shard_tree(tree, mesh, shard_nodes)
        dpts = jax.device_put(pts, NamedSharding(
            mesh, P(parallel.BATCH_AXIS, None)))
        fn = jax.jit(query_fn)
        jax.block_until_ready(fn(stree, dpts))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(stree, dpts))
            best = min(best, time.perf_counter() - t0)
        comp = fn.lower(stree, dpts).compile()
        txt = comp.as_text()
        return best, {
            "all_reduce": txt.count("all-reduce("),
            "all_gather": txt.count("all-gather("),
            "arg_mb": round(
                comp.memory_analysis().argument_size_in_bytes / 1e6, 1),
        }

    t_rep, h_rep = timed_query(False)
    t_shd, h_shd = timed_query(True)
    result = {
        "metric": "node_sharded_query_throughput_2p4m_nodes",
        "value": round(NPTS / t_shd / 1e6, 3),
        "unit": "Mqueries/s",
        "device": "cpu x8 (virtual mesh)",
        "detail": {
            "nodes": int(N), "points": NPTS,
            "replicated_mqps": round(NPTS / t_rep / 1e6, 3),
            "sharded_over_replicated": round(t_rep / t_shd, 3),
            "replicated_hlo": h_rep, "sharded_hlo": h_shd,
            "note": "same query program, node/coefficient rows sharded "
                    "over 8 devices (P('node')) vs replicated; the "
                    "sharded layout trades ~(depth+1) batch-sized "
                    "all-reduces per query batch for 1/8 per-device "
                    "argument bytes (memory analysis in "
                    "tests/test_parallel.py::test_node_sharded_memory_"
                    "scales)",
        },
    }
    print(json.dumps(result))
    with open("NODESHARD_r05.json", "w") as fh:
        json.dump(result, fh, indent=1)
    return result


def run_inverse_1080p(use_mesh: bool = False, n_steps: int = 40):
    """Inverse rendering at 1080p ray count (BASELINE config #5): optimize
    a deformed sphere's coefficients against a 1920x1080 target depth map;
    writes INVERSE_1080P.json with the loss curve and depth-error
    reduction.

    ``use_mesh``: shard the rays over an 8-device (batch) mesh (run on the
    virtual CPU mesh: XLA_FLAGS=--xla_force_host_platform_device_count=8
    HPSDF_PLATFORM=cpu python bench.py --inverse-mesh); writes
    INVERSE_1080P_MESH.json and, when INVERSE_1080P.json exists, records
    the loss-curve deviation from the single-chip run."""
    from hpsdf_tpu import inverse

    W, H = 1920, 1080
    tgt_tree, _ = build_tree(radius=0.3)
    init_tree, _ = build_tree(radius=0.27)
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=W, height=H)
    t_star, hit_star = inverse.render_targets(tgt_tree, o, d, t_max=T_MAX)
    mesh = None
    if use_mesh:
        from hpsdf_tpu import parallel
        assert len(jax.devices()) >= 8, "needs the 8-virtual-device mesh"
        mesh = parallel.make_mesh(jax.devices()[:8], node_parallel=1)

    def depth_rmse(tree):
        res = hp.trace(tree, o, d, t_max=T_MAX, step_cap=0.02)
        m = np.asarray(res.hit & hit_star)
        dt_ = np.asarray(res.t) - np.asarray(t_star)
        return float(np.sqrt(np.mean(dt_[m] ** 2))), float(m.mean())

    rmse0, hit0 = depth_rmse(init_tree)
    t0 = time.perf_counter()
    out = inverse.fit_to_depth(init_tree, o, d, t_star, hit_star,
                               n_steps=n_steps, t_max=T_MAX, mesh=mesh)
    jax.block_until_ready(out.tree.coeffs)
    wall = time.perf_counter() - t0
    if use_mesh:
        wall_warm = wall        # CPU-mesh parity run: warm timing skipped
    else:
        # steady-state step time: rerun the COMPILED program on a jittered
        # target (identical args would hit the tunnel's result cache; a
        # fresh target forces real execution through the warm program)
        t0 = time.perf_counter()
        out2 = inverse.fit_to_depth(init_tree, o, d, t_star + 1e-6,
                                    hit_star, n_steps=n_steps, t_max=T_MAX,
                                    mesh=mesh)
        jax.block_until_ready(out2.tree.coeffs)
        wall_warm = time.perf_counter() - t0
    rmse1, hit1 = depth_rmse(out.tree)
    losses = [round(float(x), 6) for x in np.asarray(out.losses)]
    detail = {
        "rays": W * H, "steps": n_steps,
        "wall_s": round(wall, 1),
        "wall_warm_s": round(wall_warm, 1),
        "seconds_per_step_warm": round(wall_warm / n_steps, 2),
        "rmse_before": round(rmse0, 6), "rmse_after": round(rmse1, 6),
        "hit_overlap_before": round(hit0, 4),
        "hit_overlap_after": round(hit1, 4),
        # the ceiling for hit_overlap: rays that hit the TARGET at all
        # (at 16:9 the sphere covers ~10% of pixels, so ~0.095 overlap is
        # ~full coverage -- the round-4 verdict read the raw 9.5% as low)
        "target_hit_fraction": round(
            float(np.mean(np.asarray(hit_star))), 4),
        "step_note": "per-step wall is dominated by the step_cap-limited "
                     "forward march (cap 0.02 disables over-relaxation "
                     "and the cone prepass -- both assume a metric field, "
                     "which a half-optimized one is not) plus the 5-band "
                     "field/eikonal evaluations per chunk",
        "loss_curve": losses,
    }
    fname = "INVERSE_1080P_MESH.json" if use_mesh else "INVERSE_1080P.json"
    if use_mesh:
        detail["mesh"] = "8-device batch axis (rays sharded, tree "\
            "replicated, coefficient grad psum)"
        try:
            with open("INVERSE_1080P.json") as fh:
                single = json.load(fh)["detail"]["loss_curve"]
            n = min(len(single), len(losses))
            rel = [abs(a - b) / max(abs(a), 1e-9)
                   for a, b in zip(single[:n], losses[:n])]
            detail["vs_single_chip_loss_max_rel_diff"] = round(max(rel), 4)
        except Exception:
            pass
    result = {
        "metric": "inverse_render_1080p_depth_rmse_reduction",
        "value": round(rmse0 / max(rmse1, 1e-9), 2),
        "unit": "x",
        "device": (f"{_dev().platform} x8 mesh" if use_mesh
                   else str(_dev().platform)),
        "detail": detail,
    }
    print(json.dumps(result))
    with open(fname, "w") as fh:
        json.dump(result, fh, indent=1)
    return result


def main():
    from hpsdf_tpu.build import program_counts

    # warm the fit programs, then time a jittered warm build (see protocol)
    _, cold_s = build_tree(radius=0.3)
    progs = program_counts()
    tree, fit_s = build_tree(radius=0.301)
    packed = accel.pack_tree(tree)

    accel_dev = _dev()
    mrays, hit_frac = time_trace(packed, accel_dev, WIDTH, HEIGHT, REPS)
    packed_dev = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), accel_dev), packed)
    roof = trace_roofline(packed_dev, accel_dev, WIDTH, HEIGHT,
                          (WIDTH * HEIGHT) / (mrays * 1e6))

    cpu = jax.devices("cpu")[0]
    if accel_dev.platform == "cpu":
        cpu_mrays = mrays
    else:
        cpu_mrays, _ = time_trace(packed, cpu, CPU_WIDTH, CPU_HEIGHT, 3)

    print(json.dumps({
        "metric": "sphere_trace_mrays_per_s_per_chip",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / max(cpu_mrays, 1e-12), 3),
        "device": str(accel_dev.platform),
        "detail": {
            "rays": WIDTH * HEIGHT,
            "hit_fraction": round(hit_frac, 4),
            "fit_time_s": round(fit_s, 3),
            "fit_time_cold_s": round(cold_s, 3),
            "fit_programs_compiled": progs["programs"],
            "fit_programs_speculative": progs["speculative"],
            "fit_device": str(accel_dev.platform),
            "fit_dtype": "compensated" if accel_dev.platform != "cpu"
                         else "float64",
            "cpu_baseline_mrays_per_s": round(cpu_mrays, 4),
            "baseline_definition": "identical f32 trace on host XLA CPU",
            "roofline": roof,
        },
    }))


if __name__ == "__main__":
    import sys

    if "--suite" in sys.argv:
        run_suite()
    elif "--inverse-mesh" in sys.argv:
        # 10 steps: enough to compare the loss curve (incl. the warmup
        # region) against the single-chip artifact at CPU-mesh cost
        run_inverse_1080p(use_mesh=True, n_steps=10)
    elif "--inverse" in sys.argv:
        run_inverse_1080p()
    elif "--nodeshard" in sys.argv:
        run_nodeshard()
    elif "--contscale" in sys.argv:
        run_contscale()
    else:
        main()
