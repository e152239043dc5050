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


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
