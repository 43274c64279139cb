"""Phase timers and profiler bridge (the reference's chrono-around-phases
benchmarking, Source/Tests/HPBenchmarks.cpp:27-47, made device-aware)."""

import jax.numpy as jnp

from hpsdf_tpu import profiling


def test_phase_timer_accumulates():
    pt = profiling.PhaseTimer()
    with pt.phase("a") as out:
        out.append(jnp.arange(8) * 2)
    with pt.phase("a") as out:
        out.append(jnp.arange(8) + 1)
    with pt.phase("b"):
        pass
    assert pt.counts["a"] == 2 and pt.counts["b"] == 1
    assert pt.times["a"] > 0.0
    rep = pt.report()
    assert "a:" in rep and "b:" in rep


def test_timed_blocks_on_result():
    x = jnp.ones((256, 256))
    out, dt = profiling.timed(lambda v: v @ v, x)
    assert out.shape == (256, 256) and dt > 0.0


def test_device_trace_writes(tmp_path):
    with profiling.device_trace(str(tmp_path)):
        jnp.sum(jnp.arange(16)).block_until_ready()
    # the profiler writes a plugins/profile/<ts>/ directory
    assert any(tmp_path.rglob("*")), "no profile output written"
