"""Cumulative-prefix time budget of the default march schedule (round 5).

Times P0..P4 where Pk jits the pipeline UP TO stage k (consuming a reduced
output); marginal costs P(k) - P(k-1) then sum to the full frame BY
CONSTRUCTION -- unlike standalone per-stage timing, which pays each
stage's dispatch/launch overhead separately and overcounts (the first
budget summed to 106-130% of the frame).

Stages (compact schedule): sort/order -> capped pass 1 -> recompact ->
tail -> unsort. For no-LOD trees the cone prepass is stage C0.

Usage: python experiments/stage_budget.py [--refdefault]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import accel, df64, render
from hpsdf_tpu.render import (CONE_TILE, MARCH_CHUNK, SORT_BLOCK, _STATE_F,
                              _lo_of, _march, _march_block, _pack_state,
                              _sorted_blocks, _unpack_state, camera_rays,
                              cone_start, intersect_aabb)
from bench import build_tree, _fit_cfg

dev = jax.devices()[0]
T_MAX = 5.0
W = H = 1024

refd = "--refdefault" in sys.argv
if refd:
    cfgr = _fit_cfg(target_error=1e-10,
                    nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                    nearness_strength=3.0, max_degree=12, max_depth=10,
                    node_capacity=600000)
    tree = hp.build_octree(cfgr, df64.Sphere(0.4993, centre=(0.25, 0.0, 0.0)))
else:
    tree, _ = build_tree(radius=0.301)
pt = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                  accel.pack_tree(tree))
lo = _lo_of(pt)
use_cone = lo is None
o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=W, height=H)
o = jax.device_put(np.asarray(o), dev)
d = jax.device_put(np.asarray(d), dev)
B = o.shape[0]
S = SORT_BLOCK
nb = B // S
chunk_nb = MARCH_CHUNK // S
cap_v = (render.PASS1_CAP_DEEP if (lo is not None and pt.extra_rounds > 0)
         else render.PASS1_CAP)
cap = (cap_v, cap_v)
print(f"tree: nodes={tree.n_nodes} deg={tree.deg_used} width={pt.width} "
      f"gd={pt.grid_depth} extra={pt.extra_rounds} "
      f"lod={'on' if lo is not None else 'off'} cone={use_cone} "
      f"cap={cap_v}", flush=True)

half = 0.5 * jnp.asarray(np.asarray(pt.root_sizes), jnp.float32)
rcn = jnp.asarray(np.asarray(pt.root_centre), jnp.float32)


def pipeline(oo, dd_, upto):
    """The default schedule, cut after stage `upto` (1..5); mirrors
    render._march's compact path."""
    t_start = None
    if use_cone:
        t_start = cone_start(pt, oo, dd_, T_MAX, 1e-4, (H, W, CONE_TILE),
                             lo=lo)
    if upto == 0:                      # cone only
        return jnp.sum(t_start)
    # stage 1: order blocks
    if t_start is None:
        os_, ds_, ts_, perm1 = _sorted_blocks(pt, oo, dd_)
    else:
        t_near, t_far, hits_box = intersect_aabb(oo, dd_, rcn - half,
                                                 rcn + half)
        alive = hits_box & (jnp.maximum(jnp.maximum(t_near, 0.0), t_start)
                            <= jnp.minimum(t_far, T_MAX))
        blk = jnp.any(alive.reshape(nb, S), axis=1)
        key1 = jnp.where(blk, jnp.uint16(0), jnp.uint16(1))
        perm1 = jax.lax.sort_key_val(
            key1, jnp.arange(nb, dtype=jnp.int32))[1]
        rows1 = jnp.concatenate(
            [oo.reshape(nb, 3 * S), dd_.reshape(nb, 3 * S),
             t_start.reshape(nb, S)], axis=1)
        rows1 = jax.lax.optimization_barrier(rows1[perm1])
        os_ = rows1[:, :3 * S].reshape(-1, 3)
        ds_ = rows1[:, 3 * S:6 * S].reshape(-1, 3)
        ts_ = rows1[:, 6 * S:].reshape(-1)
    if upto == 1:
        return jnp.sum(os_) + jnp.sum(perm1.astype(jnp.float32))

    def run1(od):
        ts = None if ts_ is None else od[2]
        return _march_block(pt, od[0], od[1], jnp.float32(T_MAX), 1e-4,
                            200, lo=lo, outer_cap=cap, return_state=True,
                            t_start=ts)

    args1 = (os_.reshape(-1, MARCH_CHUNK, 3),
             ds_.reshape(-1, MARCH_CHUNK, 3))
    if ts_ is not None:
        args1 = args1 + (ts_.reshape(-1, MARCH_CHUNK),)
    _, _, kk1, st = jax.lax.map(run1, args1)
    t, hit, p1, p2, nsteps, relax, adv, vp = (x.reshape(-1) for x in st)
    if upto == 2:
        return jnp.sum(t) + jnp.sum(nsteps)
    active = p1 | p2
    blk_active = jnp.any(active.reshape(nb, S), axis=1)
    t_near, _, _ = intersect_aabb(os_, ds_, rcn - half, rcn + half)
    t0 = jnp.maximum(t_near, 0.0)
    if ts_ is not None:
        t0 = jnp.maximum(t0, ts_)
    rate = (t - t0) / jnp.maximum(nsteps.astype(jnp.float32), 1.0)
    blk_rate = jnp.where(active, rate, jnp.inf).reshape(nb, S).min(axis=1)
    key = jnp.where(blk_active,
                    jnp.clip(blk_rate * 16384.0, 0.0,
                             65533.0).astype(jnp.uint16),
                    jnp.uint16(65535))
    perm2 = jax.lax.sort_key_val(key, jnp.arange(nb, dtype=jnp.int32))[1]
    rows = _pack_state(os_, ds_, t, hit, p1, p2, nsteps, relax, adv, vp,
                       nb)
    rows = jax.lax.optimization_barrier(rows[perm2])
    if upto == 3:
        return jnp.sum(rows[:, 6 * S:8 * S])

    def run2(r):
        oc, dc, init = _unpack_state(r)
        return _march_block(pt, oc, dc, jnp.float32(T_MAX), 1e-4, 200,
                            lo=lo, init=init)

    t2, hit2, kk2 = jax.lax.map(run2, rows.reshape(-1, chunk_nb,
                                                   _STATE_F * S))
    if upto == 4:
        return jnp.sum(t2)
    inv = jnp.argsort(perm1[perm2])
    out_rows = jnp.concatenate(
        [t2.reshape(nb, S), hit2.reshape(nb, S).astype(jnp.float32)],
        axis=1)
    out = jax.lax.optimization_barrier(out_rows[inv])
    return jnp.sum(out[:, :S])


def timed(upto, reps=8):
    fn = jax.jit(lambda oo, dd_: pipeline(oo, dd_, upto))
    float(fn(o, d))
    best = np.inf
    for t_ in range(3):
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(o + np.float32((t_ * reps + i + 1) * 1e-6), d)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


names = (["cone"] if use_cone else []) + [
    "order", "pass1", "recompact", "tail", "unsort"]
start = 0 if use_cone else 1
prev = 0.0
total = None
for k in range(start, 6):
    w = timed(k)
    stage = names[k - start]
    print(f"P{k} (+{stage:<9s}) {w*1e3:8.2f} ms  (marginal "
          f"{(w-prev)*1e3:+8.2f} ms)", flush=True)
    prev = w
    total = w
full = timed(5)
mref = B / total / 1e6
print(f"FULL = last prefix  {total*1e3:8.2f} ms ({mref:.2f} Mrays/s); "
      f"marginals sum to the frame by construction", flush=True)
