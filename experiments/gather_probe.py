"""Probe: can ANY TPU path beat XLA's dynamic-gather row cost (~3.7 ns/row)?

Strategies measured on the real chip (VERDICT r3 item 1: 'Pallas march
kernel ... or a written, measured demonstration that the dynamic-gather
floor is hardware'):

  A. xla_gather      : table[idx] under jit (the repo's current read path).
  B. pallas_loop     : Pallas kernel, table in VMEM, fori_loop of per-row
                       dynamic slices (measures Mosaic's dynamic-address cost).
  C. pallas_take     : Pallas kernel, jnp.take(table, idx, axis=0) -- does
                       Mosaic vectorize a sublane gather at all?
  D. onehot_mxu      : gather as onehot(B,N) @ table(N,W) on the MXU
                       (bf16); only viable for tiny tables.
  E. xla_gather_sorted: A but with sorted indices (tests whether locality
                       changes the per-row cost; it shouldn't if op-bound).

Run:  python experiments/gather_probe.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_amortized(fn, idx, reps=30):
    """Run fn(idx) reps times inside one jitted loop, vary idx per rep."""
    @jax.jit
    def loop(idx):
        def body(i, acc):
            out = fn((idx + i) % N)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    float(loop(idx))
    i2 = (idx + 7) % N
    t0 = time.perf_counter()
    float(loop(i2))
    return (time.perf_counter() - t0) / reps


N = 4681          # headline tree row count
B = 1 << 20       # rays
W = 32

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)

print(f"devices: {jax.devices()}  N={N} B={B} W={W}")

# --- A: XLA gather ---------------------------------------------------------
dt = bench_amortized(lambda i: table[i], idx)
print(f"A xla_gather        : {dt*1e9/B:8.2f} ns/row   ({B/dt/1e6:.0f} Mrows/s)")

# --- E: sorted indices -----------------------------------------------------
idx_s = jnp.sort(idx)
dt = bench_amortized(lambda i: table[i], idx_s)
print(f"E xla_gather_sorted : {dt*1e9/B:8.2f} ns/row")

# --- B: pallas per-row loop (table + idx blocks in VMEM) -------------------
BB = 8192   # rows per kernel block

def loop_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
        return 0
    jax.lax.fori_loop(0, BB, body, 0)

@jax.jit
def pallas_loop(i):
    return pl.pallas_call(
        loop_kernel,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec((N, W), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
    )(i, table)

try:
    dt = bench_amortized(pallas_loop, idx)
    print(f"B pallas_loop       : {dt*1e9/B:8.2f} ns/row")
except Exception as e:
    print(f"B pallas_loop       : FAILED {type(e).__name__}: {str(e)[:200]}")

# --- C: pallas jnp.take ----------------------------------------------------
def take_kernel(idx_ref, table_ref, out_ref):
    out_ref[:, :] = jnp.take(table_ref[:, :], idx_ref[:], axis=0,
                             fill_value=0.0)

@jax.jit
def pallas_take(i):
    return pl.pallas_call(
        take_kernel,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB,), lambda g: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, W), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
    )(i, table)

try:
    dt = bench_amortized(pallas_take, idx)
    print(f"C pallas_take       : {dt*1e9/B:8.2f} ns/row")
except Exception as e:
    print(f"C pallas_take       : FAILED {type(e).__name__}: {str(e)[:300]}")

# --- C2: pallas take_along_axis on transposed table (lane gather) ----------
# table_T: (W, N) with N on lanes; gather per-lane indices
def tal_kernel(idx_ref, table_ref, out_ref):
    # idx: (BB,) -> broadcast to (W, BB); take_along_axis over lanes
    i2 = jnp.broadcast_to(idx_ref[:].reshape(1, BB), (W, BB))
    out_ref[:, :] = jnp.take_along_axis(table_ref[:, :], i2, axis=1)

tableT = jnp.asarray(np.asarray(table).T.copy())

@jax.jit
def pallas_tal(i):
    return pl.pallas_call(
        tal_kernel,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB,), lambda g: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, N), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, BB), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, B), jnp.float32),
    )(i, tableT)

try:
    dt = bench_amortized(pallas_tal, idx)
    print(f"C2 pallas_take_along: {dt*1e9/B:8.2f} ns/row")
except Exception as e:
    print(f"C2 pallas_take_along: FAILED {type(e).__name__}: {str(e)[:300]}")

# --- D: one-hot MXU (bf16) -------------------------------------------------
Nt = 512   # only viable for small tables; measure at 512 to extrapolate
table_s = table[:Nt].astype(jnp.bfloat16)
idx_small = idx % Nt

@jax.jit
def onehot_g(i):
    oh = jax.nn.one_hot(i, Nt, dtype=jnp.bfloat16)
    return jnp.dot(oh, table_s, preferred_element_type=jnp.float32)

dt = bench_amortized(onehot_g, idx_small)
print(f"D onehot_mxu (N=512): {dt*1e9/B:8.2f} ns/row")

# --- A at W=64, 96, 128 for the width curve --------------------------------
for Wx in (64, 96, 128, 256, 512):
    tw = jnp.asarray(rng.standard_normal((N, Wx)), jnp.float32)
    dt = bench_amortized(lambda i: tw[i], idx)
    print(f"A xla_gather  W={Wx:4d}: {dt*1e9/B:8.2f} ns/row")
