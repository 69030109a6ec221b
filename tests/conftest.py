"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

All tests run on CPU (fast, deterministic); multi-chip sharding tests use the
8 virtual devices. The real-TPU path is exercised by bench.py / the driver.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
