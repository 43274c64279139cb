"""Refdefault inner-steps x PASS1_CAP sweep under the compact schedule.

The round-5 stage budget put 82% of the refdefault frame in pass 1 (907
LOD + 510 full chunk-rounds at inner=3: three evals per gather). The
round-4 inner sweep that chose deep=3/lo=3 ran under the LEGACY schedule;
this re-sweeps under compact.

STANDALONE SCRIPT ONLY -- mutates render module constants.
"""
import numpy as np
import jax

import hpsdf_tpu as hp
from hpsdf_tpu import accel, df64, render
from bench import time_trace, _fit_cfg

dev = jax.devices()[0]
cfgr = _fit_cfg(target_error=1e-10,
                nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                nearness_strength=3.0, max_degree=12, max_depth=10,
                node_capacity=600000)
tree = hp.build_octree(cfgr, df64.Sphere(0.4993, centre=(0.25, 0.0, 0.0)))
packed = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                      accel.pack_tree(tree))
print(f"refdefault [compact, r5 base: 5.37]: nodes={tree.n_nodes}",
      flush=True)

for deep, lo_i, cap in [(3, 3, 16), (2, 2, 16), (2, 3, 16), (3, 2, 16),
                        (3, 3, 8), (3, 3, 24), (2, 2, 8)]:
    render.INNER_STEPS_DEEP = deep
    render.INNER_STEPS_LO = lo_i
    render.PASS1_CAP = cap
    mrays, _ = time_trace(packed, dev, 1024, 1024, 6)
    print(f"deep={deep} lo={lo_i} cap={cap:3d}: {mrays:6.2f} Mrays/s",
          flush=True)
