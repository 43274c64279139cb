"""Fit roofline, take 2: tunnel-safe amortized phase timings + bigger blocks.

Protocol: REPS invocations inside ONE jitted fori_loop with per-iteration
input jitter (the axon tunnel caches results by (executable, args), so
repeated same-arg calls measure the cache, not the chip -- bench.py
_amortized).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import basis, build as B, df64
from bench import _fit_cfg

F = df64.Sphere(0.5, centre=(0.25, 0.0, 0.0))
rng = np.random.default_rng(0)


def amortized(fn, args, reps=10):
    def loop(*a):
        def body(i, acc):
            out = fn(*((a[0] + i.astype(a[0].dtype) * 1e-7,) + a[1:]))
            return acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    jl = jax.jit(loop)
    float(jl(*args))
    bumped = (args[0] + 0.5e-7,) + args[1:]
    t0 = time.perf_counter()
    float(jl(*bumped))
    return (time.perf_counter() - t0) / reps


print("amortized standalone phases:", flush=True)
for degree in (2, 3, 4, 5):
    Q = basis.fit_rule_size(degree)
    cc = max(256, (1 << 22) // Q ** 3)
    npts = cc * Q ** 3
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (npts, 3)), jnp.float32)

    # device arrays MUST travel as arguments: closing over an axon-device
    # array hangs lowering in the constant handler's device->host fetch
    # (same root cause as build.py's numpy-constants rule)
    def f_only(pts, caps):
        vh, vl = F.eval_df_caps(caps, pts, jnp.zeros_like(pts))
        return vh + vl

    tf = amortized(f_only, (pts, F.captures))

    Fh = jnp.asarray(rng.standard_normal((cc, Q, Q, Q)), jnp.float32)
    Fl = Fh * 1e-8
    depths = jnp.zeros(cc, jnp.int32)
    cnh, cnl = B._coeff_norms_df(degree)
    cnh_s = jnp.asarray(cnh[np.zeros(cc, np.int64)])
    cnl_s = jnp.asarray(cnl[np.zeros(cc, np.int64)])
    pz = jnp.zeros((cc, 0), jnp.float32)

    def proj_only(Fh, Fl, depths, cnh_s, cnl_s, pz):
        return B._fit_impl_df64(hp.NearnessWeighting.EXPONENTIAL, 3.0,
                                degree, 0, Fh, Fl, depths, cnh_s, cnl_s,
                                pz, pz)

    tp = amortized(proj_only, (Fh, Fl, depths, cnh_s, cnl_s, pz))
    print(f"  deg {degree} (Q={Q}, cc={cc}, {npts/1e6:.1f}M pts): "
          f"F {tf*1e3:.1f} ms ({npts/tf/1e6:.0f} Mpts/s), "
          f"proj {tp*1e3:.1f} ms ({npts/tp/1e6:.0f} Mpts/s)", flush=True)

# --- refdefault warm build at default vs 4x block size --------------------
cfgr = _fit_cfg(target_error=1e-10,
                nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                nearness_strength=3.0, max_degree=12, max_depth=10,
                node_capacity=600000)
for blk in (1 << 22, 1 << 24):
    B._FitCache.block_pts_override = blk
    orig_init = B._FitCache.__init__

    def patched_init(self, *a, _blk=blk, **k):
        orig_init(self, *a, **k)
        self.block_pts = _blk
    B._FitCache.__init__ = patched_init
    hp.build_octree(cfgr, df64.Sphere(0.5, centre=(0.25, 0.0, 0.0)))
    t0 = time.perf_counter()
    tree = hp.build_octree(cfgr, df64.Sphere(0.4993, centre=(0.25, 0., 0.)))
    print(f"refdefault warm build, block_pts={blk >> 20}M: "
          f"{time.perf_counter()-t0:.2f}s nodes={tree.n_nodes}", flush=True)
    B._FitCache.__init__ = orig_init
