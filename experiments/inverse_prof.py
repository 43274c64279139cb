"""Inverse-rendering step timing at 1080p (VERDICT r3 item 6).

Measures seconds/step at 1920x1080 for the restructured step (march outside
jax.checkpoint) and sweeps the march step_cap, reporting the quality
(depth-RMSE reduction after a short run) alongside speed.
"""
import sys
import time

import numpy as np
import jax

import hpsdf_tpu as hp
from hpsdf_tpu import inverse
from hpsdf_tpu.render import camera_rays
from bench import build_tree, T_MAX

W, H = 1920, 1080
tgt_tree, _ = build_tree(radius=0.3)
init_tree, _ = build_tree(radius=0.27)
o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=W, height=H)
t_star, hit_star = inverse.render_targets(tgt_tree, o, d, t_max=T_MAX)
print("targets ready", flush=True)


def depth_rmse(tree, cap):
    res = hp.trace(tree, o, d, t_max=T_MAX, step_cap=cap)
    m = np.asarray(res.hit & hit_star)
    dt_ = np.asarray(res.t) - np.asarray(t_star)
    return float(np.sqrt(np.mean(dt_[m] ** 2)))


rmse0 = depth_rmse(init_tree, 0.02)
print(f"rmse before: {rmse0:.6f}", flush=True)

for steps, label in ((3, "warm+3"), (10, "10")):
    t0 = time.perf_counter()
    out = inverse.fit_to_depth(init_tree, o, d, t_star, hit_star,
                               n_steps=steps, t_max=T_MAX)
    jax.block_until_ready(out.tree.coeffs)
    wall = time.perf_counter() - t0
    print(f"n_steps={steps}: {wall:.1f}s total, {wall/steps:.2f}s/step "
          f"(incl compile on first)", flush=True)

rmse1 = depth_rmse(out.tree, 0.02)
print(f"rmse after 10 steps: {rmse1:.6f} ({rmse0/max(rmse1,1e-9):.2f}x)",
      flush=True)
