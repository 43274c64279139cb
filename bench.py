"""Headline benchmark: sphere-traced Mrays/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Protocol
--------
* Fit a sphere octree on the host CPU backend (the f64 fit path; TPU f64 is
  emulated and the fit is a one-off, not the serving path).
* Sphere-trace a 1024x1024 pinhole-camera ray grid against the fitted tree
  on the default accelerator (f32 march, MAX_STEPS=200 cap -- the batched
  equivalent of Octree::QueryRay, Source/HP/Octree.cpp:705-746).
* ``vs_baseline``: the reference is a CPU-only C++ library with no published
  machine-readable numbers (BASELINE.md) and cannot be built here (vendored
  Eigen is fetched by Build.sh; this environment has no egress). The baseline
  denominator is therefore the SAME traced workload on the multithreaded XLA
  CPU backend of this host -- a faithful stand-in for "reference-style CPU
  execution" of the identical algorithm. vs_baseline = accel Mrays/s / CPU
  Mrays/s.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import hpsdf_tpu as hp
from hpsdf_tpu.render import camera_rays

WIDTH = HEIGHT = 1024
CPU_WIDTH = CPU_HEIGHT = 256
T_MAX = 5.0
REPS = 5


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


def time_trace(tree, device, width, height, reps):
    import dataclasses

    with jax.default_device(device):
        tree = jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), device), tree)
        o, d = camera_rays((0.0, 0.0, -1.8), (0.0, 0.0, 0.0),
                           width=width, height=height)
        o = jax.device_put(np.asarray(o), device)
        d = jax.device_put(np.asarray(d), device)
        res = hp.trace(tree, o, d, t_max=T_MAX)       # warmup + compile
        jax.block_until_ready(res.t)
        n_hit = float(jnp.mean(res.hit))
        t0 = time.perf_counter()
        for _ in range(reps):
            res = hp.trace(tree, o, d, t_max=T_MAX)
            jax.block_until_ready(res.t)
        dt = (time.perf_counter() - t0) / reps
    return (width * height) / dt / 1e6, n_hit


def main():
    tree, fit_s = build_tree()

    accel = jax.devices()[0]
    mrays, hit_frac = time_trace(tree, accel, WIDTH, HEIGHT, REPS)

    cpu = jax.devices("cpu")[0]
    if accel.platform == "cpu":
        cpu_mrays = mrays
    else:
        cpu_mrays, _ = time_trace(tree, cpu, CPU_WIDTH, CPU_HEIGHT, 2)

    print(json.dumps({
        "metric": "sphere_trace_mrays_per_s_per_chip",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / max(cpu_mrays, 1e-12), 3),
        "device": str(accel.platform),
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
