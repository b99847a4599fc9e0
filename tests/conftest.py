"""Test environment: force CPU with an 8-device virtual mesh.

Multi-chip sharding tests run against
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4's
recommendation); real-TPU benchmarking happens in bench.py, not tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
