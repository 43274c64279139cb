"""Second-order knob sweep for the cone+compaction march (round 5):
PASS1_CAP x CONE_CAP at tile 8, headline or refdefault tree.

STANDALONE SCRIPT ONLY -- mutates render module constants.
Usage: python experiments/cone_sweep2.py [--refdefault]
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
    combos = [(16, 24), (32, 24), (16, 48), (32, 48)]
else:
    tree, _ = build_tree(radius=0.301)
    label = "headline [cone8: 22.16]"
    combos = [(8, 24), (16, 16), (16, 32), (24, 24), (32, 24)]
packed = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                      accel.pack_tree(tree))
print(f"{label}: nodes={tree.n_nodes} width={packed.width} "
      f"gd={packed.grid_depth} extra={packed.extra_rounds}", flush=True)

for p1, cc in combos:
    render.PASS1_CAP = p1
    render.CONE_CAP = cc
    mrays, _ = time_trace(packed, dev, 1024, 1024, 8)
    print(f"PASS1_CAP={p1:3d} CONE_CAP={cc:3d}: {mrays:6.2f} Mrays/s",
          flush=True)
