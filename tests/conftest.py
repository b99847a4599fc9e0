"""Test environment: force CPU with an 8-device virtual mesh.

Multi-chip sharding tests run against
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4's
recommendation); real-TPU benchmarking happens in bench.py, not tests.
"""

import os
import sys

# This environment's TPU-pool relay overrides JAX_PLATFORMS entirely:
# with PALLAS_AXON_POOL_IPS in the env at interpreter startup,
# jax.default_backend() comes up "tpu" even under JAX_PLATFORMS=cpu, and
# the plugin snapshots the env at process start, so in-process edits
# (os.environ.pop) cannot undo it. Re-exec pytest ONCE with the pool
# disabled so the suite really runs on the virtual 8-CPU mesh; the
# on-TPU subprocess tests (test_tpu_kernels.py) restore the stashed
# value for their children.
#
# The re-exec cannot happen at conftest import: pytest's fd-level global
# capture is already active there, so the child inherits fd 1/2 pointing
# at a capture tempfile nobody will ever read. Instead re-exec from
# pytest_cmdline_main, where the capture manager can restore the real
# fds first.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    import pytest

    @pytest.hookimpl(tryfirst=True)
    def pytest_cmdline_main(config):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        env["SLAM_TEST_STASHED_POOL_IPS"] = env.pop("PALLAS_AXON_POOL_IPS")
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest"]
                  + list(config.invocation_params.args),
                  env)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
