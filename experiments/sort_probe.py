"""Component costs of the march's ray-sort pipeline (round 5).

march_budget.py measured the sort pipeline at 28 ms of a 67 ms headline
frame. This probe times its components at the real shapes -- key eval
(values_at on block heads), argsort at several block sizes, the wide-row
permutation gathers -- and the candidate replacements (larger SORT_BLOCK,
16-bit sort keys).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hpsdf_tpu import accel
from hpsdf_tpu.render import _march_key, camera_rays
from bench import build_tree

dev = jax.devices()[0]
B = 1024 * 1024


def timed(fn, *args, reps=20):
    jl = jax.jit(fn)
    float(jnp.sum(jax.tree.leaves(jl(*args))[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(reps):
            out = jl(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def timed_loop(fn, args, reps=10):
    """fori_loop-amortized (defeats result caching for arg-jittered fns)."""
    def loop(*a):
        def body(i, acc):
            out = fn(*((a[0] + i.astype(a[0].dtype)) + a[1:]
                       if False else (a[0] + i.astype(a[0].dtype),) + a[1:]))
            return acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    jl = jax.jit(loop)
    float(jl(*args))
    best = np.inf
    for t in range(3):
        bumped = (args[0] + np.float32(t + 1),) + args[1:]
        t0 = time.perf_counter()
        float(jl(*bumped))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


tree, _ = build_tree(radius=0.301)
pt = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                  accel.pack_tree(tree))
o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=1024,
                   height=1024)
o = jax.device_put(np.asarray(o), dev)
d = jax.device_put(np.asarray(d), dev)

rng = np.random.default_rng(0)

# argsort scaling
for n in (131072, 32768, 16384, 8192):
    keys = jax.device_put(rng.uniform(0, 1, n).astype(np.float32), dev)
    dt = timed_loop(lambda k: jnp.argsort(k), (keys,))
    print(f"argsort f32 n={n:7d}: {dt*1e3:7.2f} ms", flush=True)

# 16-bit keys: sort_key_val on u16 quantized keys
keys = jax.device_put(rng.uniform(0, 1, 131072).astype(np.float32), dev)
idx = jnp.arange(131072, dtype=jnp.int32)


def sort16(k):
    q = jnp.clip(k * 65535.0, 0, 65535).astype(jnp.uint16)
    _, perm = jax.lax.sort_key_val(q, idx)
    return perm


dt = timed_loop(sort16, (keys,))
print(f"sort_key_val u16 n=131072: {dt*1e3:7.2f} ms", flush=True)

# key eval at block heads
for sb in (8, 32, 64):
    nb = B // sb
    dt = timed_loop(lambda oo: _march_key(pt, oo[::sb], d[::sb]), (o,))
    print(f"key eval n={nb:7d} (block {sb:2d}): {dt*1e3:7.2f} ms",
          flush=True)

# permutation gathers at block granularity
for sb, w in ((8, 48), (32, 192), (64, 384)):
    nb = B // sb
    rows = jax.device_put(rng.uniform(0, 1, (nb, w)).astype(np.float32), dev)
    perm = jax.device_put(rng.permutation(nb).astype(np.int32), dev)
    dt = timed_loop(
        lambda r, p: jax.lax.optimization_barrier(r[p]), (rows, perm))
    print(f"permute ({nb}, {w}): {dt*1e3:7.2f} ms", flush=True)
