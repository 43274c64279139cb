"""Diagnose the inverse-rendering step-1 loss spike (round-4 verdict #5).

The committed 1080p loss curve jumps 0.0019 -> 0.025 at step 1 and recovers
by ~step 8. Hypothesis: an Adam transient -- at step 1 the bias-corrected
update is lr * sign(g) elementwise (m-hat/sqrt(v-hat) = +-1 for every
coordinate with a consistent gradient), so ALL ~390k folded coefficients
move by the full lr at once, perturbing the field everywhere; subsequent
steps are curvature-scaled and the loss relaxes back.

Variants measured at 512x512 rays (same task shape as the 1080p bench,
64x fewer rays):

  base40    current settings, 40 steps (the bench configuration)
  warm40    5-step linear lr warmup (re-test of the round-2 negative
            result, now in FOLDED parameter space)
  half40    lr/2, 40 steps
  base120   current settings, 120 steps (does the 9.5% hit overlap just
            need more steps?)

Reports per-variant: loss curve head, final masked depth RMSE vs target,
hit-overlap fraction. Run on TPU: python experiments/inverse_spike.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import inverse
from hpsdf_tpu.render import camera_rays
from bench import build_tree

T_MAX = 5.0
W = H = 512


def depth_rmse(tree, o, d, t_star, hit_star):
    res = hp.trace(tree, o, d, t_max=T_MAX, step_cap=0.02)
    m = np.asarray(res.hit & hit_star)
    dt = np.asarray(res.t) - np.asarray(t_star)
    return float(np.sqrt(np.mean(dt[m] ** 2))), float(m.mean())


def main():
    tgt_tree, _ = build_tree(radius=0.3)
    init_tree, _ = build_tree(radius=0.27)
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=W, height=H)
    t_star, hit_star = inverse.render_targets(tgt_tree, o, d, t_max=T_MAX)
    rmse0, ov0 = depth_rmse(init_tree, o, d, t_star, hit_star)
    print(f"init: rmse={rmse0:.5f} overlap={ov0:.4f} "
          f"target_hit={float(jnp.mean(hit_star)):.4f}", flush=True)

    variants = {
        "base40": dict(n_steps=40),
        "warm40": dict(n_steps=40, lr_warmup=5),
        "half40": dict(n_steps=40, lr=1.5e-3),
        "base120": dict(n_steps=120),
    }
    out = {}
    for name, kw in variants.items():
        t0 = time.perf_counter()
        res = inverse.fit_to_depth(init_tree, o, d, t_star, hit_star,
                                   t_max=T_MAX, **kw)
        jax.block_until_ready(res.tree.coeffs)
        wall = time.perf_counter() - t0
        rmse, ov = depth_rmse(res.tree, o, d, t_star, hit_star)
        losses = np.asarray(res.losses)
        out[name] = dict(
            wall_s=round(wall, 1),
            loss_head=[round(float(x), 6) for x in losses[:10]],
            loss_tail=round(float(losses[-1]), 6),
            spike_ratio=round(float(losses[1] / max(losses[0], 1e-12)), 2),
            rmse=round(rmse, 6), overlap=round(ov, 4))
        print(f"{name}: {json.dumps(out[name])}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
