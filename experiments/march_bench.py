"""Quick march throughput check: headline + refdefault trees on TPU."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import accel, df64
from bench import build_tree, time_trace, _fit_cfg

dev = jax.devices()[0]

tree, fit_s = build_tree(radius=0.301)
packed = accel.pack_tree(tree)
print(f"headline fit: {fit_s:.2f}s nodes={tree.n_nodes} "
      f"width={packed.width} gd={packed.grid_depth} "
      f"extra={packed.extra_rounds}", flush=True)
mrays, hit_frac = time_trace(packed, dev, 1024, 1024, 10)
print(f"headline 1024^2: {mrays:.2f} Mrays/s (hit {hit_frac:.3f})  "
      f"[r3: 15.37]", flush=True)

if "--refdefault" in sys.argv:
    cfgr = _fit_cfg(target_error=1e-10,
                    nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                    nearness_strength=3.0, max_degree=12, max_depth=10,
                    node_capacity=600000)
    t0 = time.perf_counter()
    tree_r = hp.build_octree(cfgr, df64.Sphere(0.4993,
                                               centre=(0.25, 0.0, 0.0)))
    print(f"refdefault fit: {time.perf_counter()-t0:.1f}s "
          f"nodes={tree_r.n_nodes} deg={tree_r.deg_used} "
          f"depth={tree_r.depth_used}", flush=True)
    packed_r = accel.pack_tree(tree_r)
    print(f"refdefault pack: width={packed_r.width} gd={packed_r.grid_depth} "
          f"extra={packed_r.extra_rounds}", flush=True)
    packed_r = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                            packed_r)
    mrays_r, hf = time_trace(packed_r, dev, 1024, 1024, 5)
    print(f"refdefault 1024^2: {mrays_r:.2f} Mrays/s (hit {hf:.3f})  "
          f"[r3: 4.45]", flush=True)
