"""Test harness config: force the CPU backend with 8 virtual devices so
sharding tests run without real multi-chip hardware (SURVEY.md section 7 /
task environment contract). Must run before jax initializes a backend."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
