"""Fit-path phase breakdown (VERDICT r3 item 5): where does the warm
refdefault build's wall clock go?

Phases measured:
  * per-dispatch device wall (block_until_ready around each fused fit call)
  * host/topology time = build wall - sum of device dispatch walls
  * standalone F-evaluation vs projection programs at the build's dominant
    (degree, block) shapes, to split the fused dispatch cost
"""
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import basis, build as B, df64
from bench import _fit_cfg

dev = jax.devices()[0]
print("device:", dev, flush=True)

cfgr = _fit_cfg(target_error=1e-10,
                nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                nearness_strength=3.0, max_degree=12, max_depth=10,
                node_capacity=600000)
F = df64.Sphere(0.5, centre=(0.25, 0.0, 0.0))
hp.build_octree(cfgr, F)                       # warm all programs

# --- timed warm build with per-dispatch accounting ------------------------
calls = []
orig_call = B._FitCache.__call__


def timed_call(self, degree, centres, depths, prev=None):
    t0 = time.perf_counter()
    out = orig_call(self, degree, centres, depths, prev)
    # orig_call converts outputs to numpy => device work is complete here
    calls.append((degree, centres.shape[0], time.perf_counter() - t0))
    return out


B._FitCache.__call__ = timed_call
F2 = df64.Sphere(0.4993, centre=(0.25, 0.0, 0.0))
t0 = time.perf_counter()
tree = hp.build_octree(cfgr, F2)
wall = time.perf_counter() - t0
B._FitCache.__call__ = orig_call

fit_wall = sum(c[2] for c in calls)
per_deg = defaultdict(lambda: [0, 0.0, 0])
for d, m, dt in calls:
    per_deg[d][0] += 1
    per_deg[d][1] += dt
    per_deg[d][2] += m
print(f"\nwarm build wall {wall:.2f}s; fit calls {len(calls)} "
      f"({fit_wall:.2f}s device+convert), host/topology {wall-fit_wall:.2f}s")
for d in sorted(per_deg):
    n, t, m = per_deg[d]
    print(f"  deg {d}: {n} calls, {m} cells, {t:.3f}s", flush=True)

# --- split fused dispatch: F-eval vs projection ---------------------------
print("\nstandalone phase timing at dominant shapes:")


def time_fn(fn, *args, reps=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) \
        else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


rng = np.random.default_rng(0)
for degree in sorted(per_deg):
    Q = basis.fit_rule_size(degree)
    cc = max(256, (1 << 22) // Q ** 3)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (cc * Q ** 3, 3)),
                      jnp.float32)

    @jax.jit
    def f_only(caps, pts):
        vh, vl = F.eval_df_caps(caps, pts, jnp.zeros_like(pts))
        return jnp.sum(vh), jnp.sum(vl)

    tf = time_fn(f_only, F.captures, pts)

    Fh = jnp.asarray(rng.standard_normal((cc, Q, Q, Q)), jnp.float32)
    Fl = Fh * 1e-8
    depths = jnp.zeros(cc, jnp.int32)
    cnh, cnl = B._coeff_norms_df(degree)
    cnh_s = jnp.asarray(cnh[np.zeros(cc, np.int64)])
    cnl_s = jnp.asarray(cnl[np.zeros(cc, np.int64)])
    pz = jnp.zeros((cc, 0), jnp.float32)

    @jax.jit
    def proj_only(Fh, Fl, depths, cnh_s, cnl_s, pz):
        return B._fit_impl_df64(hp.NearnessWeighting.EXPONENTIAL, 3.0,
                                degree, 0, Fh, Fl, depths, cnh_s, cnl_s,
                                pz, pz)

    tp = time_fn(proj_only, Fh, Fl, depths, cnh_s, cnl_s, pz)
    npts = cc * Q ** 3
    print(f"  deg {degree} (Q={Q}, cc={cc}, {npts/1e6:.1f}M pts): "
          f"F-eval {tf*1e3:.1f} ms ({npts/tf/1e6:.0f} Mpts/s), "
          f"projection {tp*1e3:.1f} ms", flush=True)
