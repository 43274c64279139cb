"""SORT_BLOCK sweep after the scatter->argsort unsort fix (round 5).

STANDALONE SCRIPT ONLY -- mutates render.SORT_BLOCK per setting (the march
re-traces each time) and never restores it.
"""
import numpy as np
import jax

import hpsdf_tpu as hp  # noqa: F401  (platform setup)
from hpsdf_tpu import accel, render
from bench import build_tree, time_trace

dev = jax.devices()[0]
tree, fit_s = build_tree(radius=0.301)
packed = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                      accel.pack_tree(tree))
print(f"fit {fit_s:.1f}s nodes={tree.n_nodes} width={packed.width}",
      flush=True)

for sb in (8, 16, 32, 64):
    render.SORT_BLOCK = sb
    mrays, _ = time_trace(packed, dev, 1024, 1024, 10)
    print(f"SORT_BLOCK={sb:3d}: {mrays:6.2f} Mrays/s", flush=True)
