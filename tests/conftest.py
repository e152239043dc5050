"""Test harness: force an 8-virtual-device CPU backend.

This is the standard JAX substitute for a multi-chip fixture
(SURVEY.md §4): sharding/pjit paths run against 8 fake CPU devices, and
everything compiles locally (no TPU tunnel) so the suite stays fast.
"""
import os

_flag = "--xla_force_host_platform_device_count=8"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " "
                               + _flag).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules dominated by XLA compiles / e2e trainer runs / subprocesses
# (measured with --durations on the 1-core host).  `-m "not slow"` runs
# the remaining unit/parity suite in a few minutes; the full suite is
# unchanged.  New e2e-style modules should be added here (or use
# ``pytestmark = pytest.mark.slow`` in the file).
_SLOW_MODULES = {
    "test_train_e2e", "test_train_video_e2e", "test_precompile",
    "test_sharding", "test_pconv", "test_pfuse", "test_wpack",
    "test_device_cache", "test_svfid_cli", "test_sifid_cli", "test_remat",
    "test_serve",
    "test_fast_grads", "test_learning", "test_fused_forwards",
    "test_watchdog", "test_distributed", "test_oom_fallback",
    "test_bench_guard", "test_save_interval", "test_multihost",
    "test_pconv_spmd", "test_hoist",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
