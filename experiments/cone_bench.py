"""Cone-prepass march throughput on TPU: headline + refdefault trees.

Measures time_trace with and without the cone prepass, and a CONE_TILE
sweep. Usage: python experiments/cone_bench.py [--refdefault]
"""
import sys

import numpy as np
import jax

import hpsdf_tpu as hp
from hpsdf_tpu import accel, df64, render
from bench import build_tree, time_trace, _fit_cfg

dev = jax.devices()[0]

if "--refdefault" in sys.argv:
    cfgr = _fit_cfg(target_error=1e-10,
                    nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                    nearness_strength=3.0, max_degree=12, max_depth=10,
                    node_capacity=600000)
    tree = hp.build_octree(cfgr, df64.Sphere(0.4993, centre=(0.25, 0.0, 0.0)))
    label = "refdefault [r4: 4.48]"
else:
    tree, _ = build_tree(radius=0.301)
    label = "headline [r4: 15.09, sort-fix: 18.88]"
packed = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                      accel.pack_tree(tree))
print(f"{label}: nodes={tree.n_nodes} width={packed.width} "
      f"gd={packed.grid_depth} extra={packed.extra_rounds}", flush=True)

mrays, hf = time_trace(packed, dev, 1024, 1024, 8, cone=False)
print(f"no cone      : {mrays:6.2f} Mrays/s (hit {hf:.3f})", flush=True)
for tile in (4, 8, 16):
    render.CONE_TILE = tile
    mrays, hf = time_trace(packed, dev, 1024, 1024, 8, cone=True)
    print(f"cone tile {tile:2d} : {mrays:6.2f} Mrays/s (hit {hf:.3f})",
          flush=True)
