"""Stage-level time budget of the compact march schedule (round 5).

Times each stage of _march_compacted standalone at 1024^2 on the given
tree -- liveness/cost sort, capped pass 1, recompaction, tail, unsort --
so the budget sums against the full frame (the VERDICT round-4 item-1
fallback: every phase measured, sum explains >= 95%).

Usage: python experiments/refdefault_budget.py [--refdefault|--headline]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import accel, df64
from hpsdf_tpu.render import (MARCH_CHUNK, PASS1_CAP, SORT_BLOCK, _STATE_F,
                              _lo_of, _march, _march_block, _pack_state,
                              _sorted_blocks, _unpack_state, camera_rays,
                              intersect_aabb)
from bench import build_tree, _fit_cfg

dev = jax.devices()[0]
T_MAX = 5.0
W = H = 1024

if "--refdefault" in sys.argv:
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
o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=W, height=H)
o = jax.device_put(np.asarray(o), dev)
d = jax.device_put(np.asarray(d), dev)
B = o.shape[0]
S = SORT_BLOCK
nb = B // S
chunk_nb = MARCH_CHUNK // S
print(f"tree: nodes={tree.n_nodes} deg={tree.deg_used} width={pt.width} "
      f"gd={pt.grid_depth} extra={pt.extra_rounds} "
      f"lod={'on' if lo is not None else 'off'}", flush=True)


def timed(fn, args, reps=8):
    jl = jax.jit(fn)
    jax.block_until_ready(jl(*args))
    best = np.inf
    for t_ in range(3):
        b = (args[0] + np.float32((t_ + 1) * 1e-6),) + args[1:]
        t0 = time.perf_counter()
        for i in range(reps):
            out = jl(*((b[0] + np.float32(i * 1e-6),) + b[1:]))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


# full frame (default schedule)
full = timed(lambda oo, dd_: _march(pt, oo, dd_, jnp.float32(T_MAX), 1e-4,
                                    200)[0], (o, d))
print(f"FULL frame          {full*1e3:8.2f} ms "
      f"({B/full/1e6:.2f} Mrays/s)", flush=True)

# stage A: cost sort (t_start None => legacy key eval path inside compact)
stageA = timed(lambda oo, dd_: _sorted_blocks(pt, oo, dd_)[0], (o, d))
print(f"A sort+permute      {stageA*1e3:8.2f} ms", flush=True)

os_, ds_, _, perm1 = jax.jit(lambda oo, dd_: _sorted_blocks(pt, oo, dd_))(
    o, d)
os_ = jax.device_put(np.asarray(os_), dev)
ds_ = jax.device_put(np.asarray(ds_), dev)

cap = (PASS1_CAP, PASS1_CAP)


def pass1(oo, dd_):
    return jax.lax.map(
        lambda od: _march_block(pt, od[0], od[1], jnp.float32(T_MAX), 1e-4,
                                200, lo=lo, outer_cap=cap,
                                return_state=True),
        (oo.reshape(-1, MARCH_CHUNK, 3), dd_.reshape(-1, MARCH_CHUNK, 3)))


stageB = timed(lambda oo, dd_: pass1(oo, dd_)[2], (os_, ds_))
print(f"B pass1 (cap {PASS1_CAP:3d})  {stageB*1e3:8.2f} ms", flush=True)

_, _, kk1, st = jax.jit(pass1)(os_, ds_)
st = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev), st)
kk1 = np.asarray(kk1)


def recompact(oo, dd_, stt):
    t, hit, p1, p2, nsteps, relax, adv, vp = (x.reshape(-1) for x in stt)
    active = p1 | p2
    blk_active = jnp.any(active.reshape(nb, S), axis=1)
    half = 0.5 * jnp.asarray(pt.root_sizes, jnp.float32)
    rc = jnp.asarray(pt.root_centre, jnp.float32)
    t_near, _, _ = intersect_aabb(oo, dd_, rc - half, rc + half)
    rate = ((t - jnp.maximum(t_near, 0.0))
            / jnp.maximum(nsteps.astype(jnp.float32), 1.0))
    blk_rate = jnp.where(active, rate, jnp.inf).reshape(nb, S).min(axis=1)
    key = jnp.where(blk_active,
                    jnp.clip(blk_rate * 16384.0, 0.0,
                             65533.0).astype(jnp.uint16),
                    jnp.uint16(65535))
    perm2 = jax.lax.sort_key_val(key, jnp.arange(nb, dtype=jnp.int32))[1]
    rows = _pack_state(oo, dd_, t, hit, p1, p2, nsteps, relax, adv, vp, nb)
    return jax.lax.optimization_barrier(rows[perm2]), perm2, blk_active


stageC = timed(lambda oo, dd_, stt: recompact(oo, dd_, stt)[0],
               (os_, ds_, st))
print(f"C recompact         {stageC*1e3:8.2f} ms", flush=True)

rows_p, perm2, blk_active = jax.jit(recompact)(os_, ds_, st)
rows_p = jax.device_put(np.asarray(rows_p), dev)


def tail(r):
    return jax.lax.map(
        lambda rr: _march_block(
            pt, *_unpack_state(rr)[:2], jnp.float32(T_MAX), 1e-4, 200,
            lo=lo, init=_unpack_state(rr)[2]),
        r.reshape(-1, chunk_nb, _STATE_F * S))


stageD = timed(lambda r: tail(r)[0], (rows_p,))
print(f"D tail              {stageD*1e3:8.2f} ms", flush=True)

_, _, kk2 = jax.jit(tail)(rows_p)
kk2 = np.asarray(kk2)


def unsort(r):
    inv = jnp.argsort(perm1[perm2])
    out = jax.lax.optimization_barrier(r[:, :2 * S][inv])
    return out.reshape(-1)


stageE = timed(unsort, (rows_p,))
print(f"E unsort            {stageE*1e3:8.2f} ms", flush=True)

tot = stageA + stageB + stageC + stageD + stageE
print(f"SUM stages          {tot*1e3:8.2f} ms = {tot/full*100:.1f}% of "
      f"frame", flush=True)
print(f"rounds: pass1 lod={kk1[:,0].sum()} full={kk1[:,1].sum()}  "
      f"tail lod={kk2[:,0].sum()} full={kk2[:,1].sum()}  "
      f"active blocks after pass1: {np.asarray(blk_active).mean():.3f}",
      flush=True)
