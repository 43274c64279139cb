"""Headline benchmark: sphere-traced Mrays/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Protocol
--------
* Fit a sphere octree on the host CPU backend (the f64 fit path; TPU f64 is
  emulated and fitting is a one-off, not the serving path), then derive the
  gather-optimized packed layout (accel.pack_tree).
* Sphere-trace a 1024x1024 pinhole-camera ray grid on the default
  accelerator (f32 march, MAX_STEPS=200 cap -- the batched equivalent of
  Octree::QueryRay, Source/HP/Octree.cpp:705-746).
* Timing: REPS full traces run inside ONE jitted fori_loop with
  per-iteration camera jitter, ending in a scalar readback. This defeats
  the axon tunnel's per-(executable, args) result caching and amortizes the
  dispatch round trip, so the number reflects on-device work.
* ``vs_baseline``: the reference is a CPU-only C++ library with no published
  machine-readable numbers (BASELINE.md) and cannot be built here (vendored
  Eigen is fetched by Build.sh; this environment has no egress). The
  baseline denominator is the SAME traced workload on the multithreaded XLA
  CPU backend of this host -- a stand-in for reference-style CPU execution
  of the identical algorithm. vs_baseline = accel Mrays/s / CPU Mrays/s.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu import accel
from hpsdf_tpu.render import camera_rays, _march

WIDTH = HEIGHT = 1024
CPU_WIDTH = CPU_HEIGHT = 256
T_MAX = 5.0
REPS = 10


def build_tree():
    def sphere(p):
        return jnp.linalg.norm(p, axis=-1) - 0.3

    cfg = hp.Config(target_error=1e-7, continuity=False, max_depth=5,
                    max_degree=6)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t0 = time.perf_counter()
        tree = hp.build_octree(cfg, sphere)
        fit_s = time.perf_counter() - t0
    return tree, fit_s


def time_trace(packed, device, width, height, reps):
    packed = jax.tree.map(lambda x: jax.device_put(np.asarray(x), device),
                          packed)
    o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                       width=width, height=height)
    o = jax.device_put(np.asarray(o), device)
    d = jax.device_put(np.asarray(d), device)

    def traced(o, d):
        def body(i, acc):
            # per-iteration origin jitter: distinct work every rep, same leaf
            # structure; magnitude well below a pixel footprint
            oj = o + (i.astype(jnp.float32) * 1e-6)
            t, hit, _ = _march(packed, oj, d, jnp.float32(T_MAX),
                               1e-4, 200)
            return acc + jnp.sum(t) + jnp.sum(hit)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    fn = jax.jit(traced)
    # compile + warm (first execution; excluded from timing)
    float(fn(o, d))
    # fresh args => fresh execution (tunnel caches by (executable, args))
    o2 = o + 0.5e-6
    t0 = time.perf_counter()
    val = float(fn(o2, d))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(val)
    # hit fraction via one plain trace
    t, hit, _ = jax.jit(lambda o, d: _march(packed, o, d, jnp.float32(T_MAX),
                                            1e-4, 200))(o, d)
    n_hit = float(jnp.mean(hit))
    return (width * height) / dt / 1e6, n_hit


def main():
    tree, fit_s = build_tree()
    packed = accel.pack_tree(tree)

    accel_dev = jax.devices()[0]
    mrays, hit_frac = time_trace(packed, accel_dev, WIDTH, HEIGHT, REPS)

    cpu = jax.devices("cpu")[0]
    if accel_dev.platform == "cpu":
        cpu_mrays = mrays
    else:
        cpu_mrays, _ = time_trace(packed, cpu, CPU_WIDTH, CPU_HEIGHT, 3)

    print(json.dumps({
        "metric": "sphere_trace_mrays_per_s_per_chip",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / max(cpu_mrays, 1e-12), 3),
        "device": str(accel_dev.platform),
        "detail": {
            "rays": WIDTH * HEIGHT,
            "hit_fraction": round(hit_frac, 4),
            "fit_time_s": round(fit_s, 3),
            "cpu_baseline_mrays_per_s": round(cpu_mrays, 4),
            "baseline_definition": "identical f32 trace on host XLA CPU",
        },
    }))


if __name__ == "__main__":
    main()
