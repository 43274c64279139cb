"""Per-phase time budget of the sphere-trace march (round-5, VERDICT item 1).

The round-4 roofline left 44% of headline frame time unexplained by the
measured gather floor. This experiment measures every remaining phase on the
real chip so the budget sums to the frame:

  A  full timed march, sorted            (the bench number)
  B  sort pipeline alone                 (_march_key + argsort + permutes)
  C  march on pre-sorted rays            (lax.map of _march_block)
  D  per-chunk outer rounds + per-lane step counts -> frozen-lane occupancy
     and the chunk-tail distribution
  E  per-round unit costs at chunk shape: gather+eval+step via fori (dense)
     and via while (the march's real loop), isolating while-loop overhead
  F  chunk-size sweep (re-chunked lax.map of the unmodified _march_block)

Usage: python experiments/march_budget.py [--refdefault]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import accel, df64
from hpsdf_tpu.render import (MARCH_CHUNK, _eval_local, _lo_of, _march,
                              _march_block, _sorted_blocks, _unsort_blocks,
                              camera_rays)
from bench import build_tree, _fit_cfg

dev = jax.devices()[0]
T_MAX = 5.0
W = H = 1024


def timed(fn, args, reps=10, inner=1):
    """Seconds per call: `reps` calls inside one jitted fori_loop with input
    jitter (defeats the tunnel's (executable, args) result cache)."""
    def loop(*a):
        def body(i, acc):
            out = fn(*((a[0] + i.astype(jnp.float32) * 1e-6,) + a[1:]))
            return acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    jl = jax.jit(loop)
    float(jl(*args))                       # compile + warm
    best = np.inf
    for trial in range(3):
        bumped = (args[0] + np.float32((trial + 1) * 0.5e-6),) + args[1:]
        t0 = time.perf_counter()
        float(jl(*bumped))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best / inner


def pad_rays(pt, o, d, chunk):
    B = o.shape[0]
    pad = (-B) % chunk
    if pad:
        far = np.asarray(pt.root_centre, np.float32) + np.asarray(
            pt.root_sizes, np.float32) * 10.0
        o = np.concatenate([np.asarray(o), np.broadcast_to(far, (pad, 3))])
        d = np.concatenate([np.asarray(d),
                            np.broadcast_to(np.asarray([0, 0, 1], np.float32),
                                            (pad, 3))])
    return jnp.asarray(o), jnp.asarray(d)


def main(refdefault=False):
    if refdefault:
        cfg = _fit_cfg(target_error=1e-10,
                       nearness_weighting=hp.NearnessWeighting.EXPONENTIAL,
                       nearness_strength=3.0, max_degree=12, max_depth=10,
                       node_capacity=600000)
        tree = hp.build_octree(cfg, df64.Sphere(0.4993,
                                                centre=(0.25, 0.0, 0.0)))
    else:
        tree, _ = build_tree(radius=0.301)
    pt = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                      accel.pack_tree(tree))
    lo = _lo_of(pt)
    print(f"tree: nodes={tree.n_nodes} deg={tree.deg_used} "
          f"depth={tree.depth_used} width={pt.width} gd={pt.grid_depth} "
          f"extra={pt.extra_rounds} lod={'on' if lo is not None else 'off'}",
          flush=True)

    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0), width=W, height=H)
    o = jax.device_put(np.asarray(o), dev)
    d = jax.device_put(np.asarray(d), dev)
    B = o.shape[0]

    # ---- A: full march (bench protocol) ----------------------------------
    def full(o, d):
        t, hit, _ = _march(pt, o, d, jnp.float32(T_MAX), 1e-4, 200)
        return t
    a = timed(full, (o, d))
    print(f"A full march        {a*1e3:8.2f} ms  "
          f"({B/a/1e6:.2f} Mrays/s)", flush=True)

    # ---- B: sort pipeline alone ------------------------------------------
    op, dp = pad_rays(pt, o, d, MARCH_CHUNK)

    def sort_only(o2, d2):
        os_, ds_, _, perm = _sorted_blocks(pt, o2, d2)
        t, hit = _unsort_blocks(perm, os_[:, 0], ds_[:, 0] > 0)
        return t
    b = timed(sort_only, (op, dp))
    print(f"B sort pipeline     {b*1e3:8.2f} ms", flush=True)

    # ---- C: march on pre-sorted rays (no sort in the timed path) ---------
    os_np, ds_np, _, _ = jax.jit(lambda o2, d2: _sorted_blocks(pt, o2, d2))(
        op, dp)
    os_np = jax.device_put(np.asarray(os_np), dev)
    ds_np = jax.device_put(np.asarray(ds_np), dev)

    def march_presorted(o2, d2):
        t, hit, kk = jax.lax.map(
            lambda od: _march_block(pt, od[0], od[1], jnp.float32(T_MAX),
                                    1e-4, 200, lo=lo),
            (o2.reshape(-1, MARCH_CHUNK, 3), d2.reshape(-1, MARCH_CHUNK, 3)))
        return t.reshape(-1)
    c = timed(march_presorted, (os_np, ds_np))
    print(f"C march presorted   {c*1e3:8.2f} ms   (A-B-C residual "
          f"{(a-b-c)*1e3:+.2f} ms)", flush=True)

    # ---- D: round counts, occupancy, tail --------------------------------
    @jax.jit
    def stats(o2, d2):
        return jax.lax.map(
            lambda od: _march_block(pt, od[0], od[1], jnp.float32(T_MAX),
                                    1e-4, 200, lo=lo, with_stats=True),
            (o2.reshape(-1, MARCH_CHUNK, 3), d2.reshape(-1, MARCH_CHUNK, 3)))
    t_, hit_, kk, nst = stats(os_np, ds_np)
    kk = np.asarray(kk)            # (chunks, 2) [lod, full] outer rounds
    nst = np.asarray(nst)          # (chunks, MARCH_CHUNK) per-lane steps
    from hpsdf_tpu.render import INNER_STEPS_LO, _inner_steps_for
    inner = _inner_steps_for(pt)
    slots = kk[:, 0].sum() * INNER_STEPS_LO + kk[:, 1].sum() * inner
    occ = nst.sum() / (slots * MARCH_CHUNK)
    ks = kk.sum(axis=1)
    print(f"D rounds: lod={kk[:,0].sum()} full={kk[:,1].sum()} "
          f"(chunks={kk.shape[0]}, mean k={ks.mean():.1f}, "
          f"p50={np.percentile(ks,50):.0f} p90={np.percentile(ks,90):.0f} "
          f"max={ks.max()})", flush=True)
    print(f"D occupancy: {occ:.3f} active-lane fraction over "
          f"{int(slots)} chunk-rounds x {MARCH_CHUNK} lanes "
          f"(inner={inner}/lo={INNER_STEPS_LO})", flush=True)

    # ---- E: per-round unit costs at chunk shape --------------------------
    oc = os_np.reshape(-1, MARCH_CHUNK, 3)[kk.shape[0] // 2]
    dc = ds_np.reshape(-1, MARCH_CHUNK, 3)[kk.shape[0] // 2]
    uo = accel.to_unit(pt, oc)
    udir = dc * jnp.asarray(1.0 / np.asarray(pt.root_sizes), jnp.float32)
    R = 64

    def round_body(t, mode):
        unit = jnp.clip(uo + t[..., None] * udir, -0.5, 0.5)
        if mode in ("full", "gather"):
            row = accel.locate(pt, unit)
        else:
            row = jnp.broadcast_to(pt.rows[1], (MARCH_CHUNK, pt.width))
        if mode in ("full", "eval"):
            local = (unit - row[..., 2:5]) * row[..., 1:2]
            v = _eval_local(pt, row, local)
        else:
            v = jnp.sum(row, axis=-1) * jnp.float32(1e-8)
        return t + jnp.float32(1e-4) * v + jnp.float32(1e-6)

    def fori_rounds(mode):
        def fn(t0):
            return jax.lax.fori_loop(
                0, R, lambda i, t: round_body(t, mode), t0)
        return timed(fn, (jnp.zeros(MARCH_CHUNK),), reps=4, inner=R)

    def while_rounds(mode):
        def fn(t0):
            def cond(s):
                t, k = s
                return jnp.logical_and(k < R, jnp.any(t < 1e9))
            def body(s):
                t, k = s
                return round_body(t, mode), k + 1
            t, _ = jax.lax.while_loop(cond, body, (t0, jnp.int32(0)))
            return t
        return timed(fn, (jnp.zeros(MARCH_CHUNK),), reps=4, inner=R)

    e_full = fori_rounds("full")
    e_gather = fori_rounds("gather")
    e_eval = fori_rounds("eval")
    e_while = while_rounds("full")
    print(f"E per-round @ {MARCH_CHUNK} lanes (fori): "
          f"full {e_full*1e6:7.2f} us  gather-only {e_gather*1e6:7.2f} us  "
          f"eval-only {e_eval*1e6:7.2f} us", flush=True)
    print(f"E per-round while vs fori: {e_while*1e6:7.2f} vs "
          f"{e_full*1e6:7.2f} us  (while overhead "
          f"{(e_while-e_full)*1e6:+.2f} us/round)", flush=True)
    pred = float(ks.sum()) * e_while
    print(f"E predicted march from units: {pred*1e3:8.2f} ms vs measured "
          f"C {c*1e3:.2f} ms ({pred/c:.2f}x)", flush=True)

    # ---- F: chunk-size sweep ---------------------------------------------
    for chunk in (8192, 16384, 32768, 65536, 131072):
        o2, d2 = pad_rays(pt, np.asarray(os_np), np.asarray(ds_np), chunk)

        def marchc(o3, d3, chunk=chunk):
            t, hit, kk = jax.lax.map(
                lambda od: _march_block(pt, od[0], od[1], jnp.float32(T_MAX),
                                        1e-4, 200, lo=lo),
                (o3.reshape(-1, chunk, 3), d3.reshape(-1, chunk, 3)))
            return t.reshape(-1)
        fc = timed(marchc, (o2, d2), reps=6)
        print(f"F chunk {chunk:6d}:  {fc*1e3:8.2f} ms  "
              f"({B/fc/1e6:.2f} Mrays/s presorted)", flush=True)


if __name__ == "__main__":
    main("--refdefault" in sys.argv)
