"""Decompose the cone-prepass slowdown: cone pass alone, fine march given
t_start, round distributions."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hpsdf_tpu import accel, render
from hpsdf_tpu.render import (MARCH_CHUNK, _lo_of, _march, _march_block,
                              _sorted_blocks, camera_rays, cone_start)
from bench import build_tree

dev = jax.devices()[0]
T_MAX = 5.0
W = H = 1024
TILE = 8

tree, _ = build_tree(radius=0.301)
pt = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                  accel.pack_tree(tree))
lo = _lo_of(pt)
o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=W, height=H)
o = jax.device_put(np.asarray(o), dev)
d = jax.device_put(np.asarray(d), dev)


def timed(fn, args, reps=8):
    jl = jax.jit(fn)
    float(jnp.sum(jax.tree.leaves(jl(*args))[0].astype(jnp.float32)))
    best = np.inf
    for t_ in range(3):
        bumped = (args[0] + np.float32((t_ + 1) * 1e-6),) + args[1:]
        t0 = time.perf_counter()
        for i in range(reps):
            out = jl(*((bumped[0] + np.float32(i * 1e-6),) + bumped[1:]))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


# cone pass alone
cs = timed(lambda oo, dd_: cone_start(pt, oo, dd_, T_MAX, 1e-4,
                                      (H, W, TILE), lo=lo), (o, d))
print(f"cone_start tile {TILE}: {cs*1e3:8.2f} ms", flush=True)

# t_start stats
t0v = np.asarray(jax.jit(
    lambda oo, dd_: cone_start(pt, oo, dd_, T_MAX, 1e-4, (H, W, TILE),
                               lo=lo))(o, d))
esc = t0v > T_MAX
print(f"t_start: escaped {esc.mean():.3f}, contact t "
      f"p50={np.percentile(t0v[~esc], 50):.3f} "
      f"p90={np.percentile(t0v[~esc], 90):.3f}", flush=True)

# fine march given t_start (sorted path)
t0j = jax.device_put(t0v, dev)


def fine(oo, dd_, ts):
    t, hit, _ = _march(pt, oo, dd_, jnp.float32(T_MAX), 1e-4, 200)
    return t


def fine_cone_arg(oo, dd_, ts):
    # replicate _march's sorted path but with an explicit t_start argument
    os_, ds_, ts_, perm = _sorted_blocks(pt, oo, dd_, ts)
    tt, hh, kk = jax.lax.map(
        lambda od: _march_block(pt, od[0], od[1], jnp.float32(T_MAX), 1e-4,
                                200, lo=lo, t_start=od[2]),
        (os_.reshape(-1, MARCH_CHUNK, 3), ds_.reshape(-1, MARCH_CHUNK, 3),
         ts_.reshape(-1, MARCH_CHUNK)))
    return tt, kk


fm = timed(fine, (o, d, t0j))
print(f"fine march no-cone : {fm*1e3:8.2f} ms", flush=True)
fc = timed(lambda oo, dd_, ts: fine_cone_arg(oo, dd_, ts)[0],
           (o, d, t0j))
print(f"fine march cone-t0 : {fc*1e3:8.2f} ms", flush=True)

# round distribution with cone t_start
_, kk = jax.jit(fine_cone_arg)(o, d, t0j)
kk = np.asarray(kk).sum(axis=-1)
print(f"chunk rounds with cone: mean={kk.mean():.1f} "
      f"p50={np.percentile(kk, 50):.0f} p90={np.percentile(kk, 90):.0f} "
      f"max={kk.max()}", flush=True)
