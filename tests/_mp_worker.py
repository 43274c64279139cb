"""Worker for the 2-process distributed smoke test (test_multiprocess.py).

Run as:  python tests/_mp_worker.py <process_id> <coordinator_port>

Each process brings up jax.distributed over 2 CPU processes x 4 virtual
devices (8 global devices), builds an identical small octree, and checks
the multi-host paths the round-3 verdict flagged as never executed
(SURVEY.md section 5.8):

  * parallel.init_distributed / global mesh construction
  * shard_query over the global batch axis vs local single-process query
  * shard_trace vs local trace
  * enforce_continuity's row-sharded CG over the global mesh vs the local
    f64 CG

Prints MP-OK on success; any assertion kills the process (nonzero exit).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np                                     # noqa: E402
import jax                                             # noqa: E402

# multi-process CPU needs a cross-process collectives backend; gloo ships
# with jaxlib
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from hpsdf_tpu import parallel                         # noqa: E402

parallel.init_distributed(f"localhost:{port}", num_processes=2,
                          process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

import jax.numpy as jnp                                # noqa: E402
from jax.experimental import multihost_utils as mh     # noqa: E402

import hpsdf_tpu as hp                                 # noqa: E402
from hpsdf_tpu.continuity import enforce_continuity    # noqa: E402

# identical deterministic build on both processes (continuity applied
# explicitly below so both CG paths start from the same fitted tree)
cfg = hp.Config(target_error=1e-5, continuity=False,
                continuity_strength=8.0, max_depth=4, max_degree=3,
                fit_dtype="float64",
                nearness_weighting=hp.NearnessWeighting.NONE)
tree = hp.build_octree(cfg, lambda p: jnp.linalg.norm(p, axis=-1) - 0.3)

mesh = parallel.make_mesh()          # (8, 1) global mesh over both hosts
assert mesh.devices.size == 8

# --- sharded query vs local query -----------------------------------------
rng = np.random.default_rng(0)
pts = rng.uniform(-0.5, 0.5, (4096, 3))
got = parallel.shard_query(tree, pts, mesh)
got_full = np.asarray(mh.process_allgather(got, tiled=True))
want = np.asarray(hp.query(tree, jnp.asarray(pts)))
assert np.allclose(got_full, want, atol=1e-12), np.abs(got_full - want).max()

# --- sharded trace vs local trace -----------------------------------------
o, d = hp.camera_rays((0.0, 0.0, -1.6), (0.0, 0.0, 0.0), width=32,
                      height=32)
res = parallel.shard_trace(tree, o, d, mesh, t_max=4.0)
t_full = np.asarray(mh.process_allgather(res.t, tiled=True))
hit_full = np.asarray(mh.process_allgather(res.hit, tiled=True))
ref = hp.trace(tree, np.asarray(o), np.asarray(d), t_max=4.0)
assert np.array_equal(hit_full, np.asarray(ref.hit))
m = hit_full
assert np.allclose(t_full[m], np.asarray(ref.t)[m], atol=1e-5)

# --- sharded continuity CG vs local f64 CG --------------------------------
cont = enforce_continuity(tree, mesh=mesh)
ref_c = enforce_continuity(tree, cg="f64")
ca = np.asarray(cont.coeffs)
cb = np.asarray(ref_c.coeffs)
assert np.allclose(ca, cb, atol=1e-5), np.abs(ca - cb).max()

print(f"MP-OK process={pid}", flush=True)
