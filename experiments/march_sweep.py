"""Sweep march knobs (inner steps, jumps) on TPU for headline+refdefault.

STANDALONE SCRIPT ONLY -- ``run`` mutates render-module globals
(INNER_STEPS*) to re-trace the march at each setting and never restores
them. Do not import anything from this file; run it as a script and let
the process exit (round-4 verdict, minor #8)."""
import dataclasses
import time
import numpy as np
import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import accel, df64, render
from bench import build_tree, time_trace, _fit_cfg

dev = jax.devices()[0]


def run(name, packed, lo, deep, inner, jumps=True, reps=5):
    # NOTE: the round-4 leaf-exit-jump experiment this script swept was
    # removed from render.py after measuring a no-op (see _march_block's
    # negative-result note); `jumps` is kept for the historical record of
    # the sweep output and is ignored.
    render.INNER_STEPS_LO = lo
    render.INNER_STEPS_DEEP = deep
    render.INNER_STEPS = inner
    mrays, _ = time_trace(packed, dev, 1024, 1024, reps)
    print(f"{name}: lo={lo} deep={deep} inner={inner} -> "
          f"{mrays:.2f} Mrays/s", flush=True)
    return mrays


t0 = time.perf_counter()
tree, fit_s = build_tree(radius=0.301)
print(f"headline fit {fit_s:.1f}s (total warm+build {time.perf_counter()-t0:.1f}s)",
      flush=True)
packed = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                      accel.pack_tree(tree))
print(f"headline pack: W={packed.width} gd={packed.grid_depth} "
      f"extra={packed.extra_rounds}", flush=True)

run("h_jmp1", packed, 1, 2, 1, True, reps=10)
run("h_off1", packed, 1, 2, 1, False, reps=10)
run("h_jmp2", packed, 1, 2, 2, True, reps=10)

cfgr = _fit_cfg(target_error=1e-10,
                nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                nearness_strength=3.0, max_degree=12, max_depth=10,
                node_capacity=600000)
t0 = time.perf_counter()
tree_r = hp.build_octree(cfgr, df64.Sphere(0.4993, centre=(0.25, 0.0, 0.0)))
print(f"refdefault fit {time.perf_counter()-t0:.1f}s nodes={tree_r.n_nodes}",
      flush=True)
packed_r = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                        accel.pack_tree(tree_r))
print(f"refdefault pack: W={packed_r.width} gd={packed_r.grid_depth} "
      f"extra={packed_r.extra_rounds}", flush=True)

run("r_jmp_1_2", packed_r, 1, 2, 1, True)
run("r_jmp_1_3", packed_r, 1, 3, 1, True)
run("r_jmp_2_3", packed_r, 2, 3, 1, True)
run("r_jmp_3_3", packed_r, 3, 3, 1, True)
run("r_off_3_3", packed_r, 3, 3, 1, False)
run("r_jmp_1_1", packed_r, 1, 1, 1, True)
