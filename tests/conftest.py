"""Test harness: force a virtual 8-device CPU mesh before JAX loads.

Tests never touch the real TPU: they run on an 8-device CPU fake so
sharding/collective code paths are exercised exactly as they would be on an
8-chip slice.  This must happen before ``import jax`` anywhere in the test
process, which is why it lives at the top of conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Keep test numerics deterministic and fast.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
