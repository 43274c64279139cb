"""Probe 2: gather cost vs (width, locality, alignment, batch).

Checks the surprising probe-1 result that W=64..128 rows gather as fast as
W=32 (the repo's round-3 model assumed 3.7 ns @ <=32 lanes rising to 9.9 ns
@ 96). Controls: random vs block-coherent vs sorted indices, repeated
measurements, chunked (8192-row) gathers matching the march's lax.map
structure.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 4681
B = 1 << 20
rng = np.random.default_rng(0)

idx_rand = jnp.asarray(rng.integers(0, N, B), jnp.int32)
idx_sort = jnp.sort(idx_rand)
# block-coherent: camera-like -- runs of 64 rays sharing ~the same leaf
base = rng.integers(0, N, B // 64)
idx_coh = jnp.asarray(np.repeat(base, 64) % N, jnp.int32)


def bench(table, idx, reps=30):
    @jax.jit
    def loop(idx):
        def body(i, acc):
            out = table[(idx + i) % N]
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    float(loop(idx))
    t0 = time.perf_counter()
    float(loop((idx + 7) % N))
    return (time.perf_counter() - t0) / reps / B * 1e9


print("width |  random  coherent  sorted   (ns/row)")
for W in (8, 16, 32, 64, 96, 128, 160, 256, 464, 512):
    t = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    r = bench(t, idx_rand)
    c = bench(t, idx_coh)
    s = bench(t, idx_sort)
    print(f"{W:5d} | {r:7.2f} {c:8.2f} {s:7.2f}")

# repeat W=32 at the end (drift check)
t = jnp.asarray(rng.standard_normal((N, 32)), jnp.float32)
print(f"repeat W=32 random: {bench(t, idx_rand):.2f} ns/row")

# grid-sized table (32768 rows) -- the march's first gather each round
N2 = 32768
t = jnp.asarray(rng.standard_normal((N2, 32)), jnp.float32)
idx2 = jnp.asarray(rng.integers(0, N2, B), jnp.int32)
base2 = rng.integers(0, N2, B // 64)
idx2c = jnp.asarray(np.repeat(base2, 64), jnp.int32)


def bench2(table, idx, reps=30):
    @jax.jit
    def loop(idx):
        def body(i, acc):
            out = table[(idx + i) % N2]
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    float(loop(idx))
    t0 = time.perf_counter()
    float(loop((idx + 7) % N2))
    return (time.perf_counter() - t0) / reps / B * 1e9


print(f"grid 32768x32 random: {bench2(t, idx2):.2f}  coherent: "
      f"{bench2(t, idx2c):.2f} ns/row")
for W in (64, 128):
    t = jnp.asarray(rng.standard_normal((N2, W)), jnp.float32)
    print(f"grid 32768x{W} random: {bench2(t, idx2):.2f}  coherent: "
          f"{bench2(t, idx2c):.2f} ns/row")

# chunked gathers at the march's 8192 shape (inside lax.map)
t = jnp.asarray(rng.standard_normal((N, 32)), jnp.float32)


def bench_chunked(idx, reps=10):
    @jax.jit
    def loop(idx):
        def body(i, acc):
            ic = ((idx + i) % N).reshape(-1, 8192)
            s = jax.lax.map(lambda ii: jnp.sum(t[ii]), ic)
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    float(loop(idx))
    t0 = time.perf_counter()
    float(loop((idx + 7) % N))
    return (time.perf_counter() - t0) / reps / B * 1e9


print(f"chunked(8192) W=32 random: {bench_chunked(idx_rand):.2f}  "
      f"coherent: {bench_chunked(idx_coh):.2f} ns/row")
