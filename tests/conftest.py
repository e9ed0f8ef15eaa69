"""Test harness: force a virtual 8-device CPU mesh before JAX loads.

Tests never touch the real TPU: they run on an 8-device CPU fake so
sharding/collective code paths are exercised exactly as they would be on an
8-chip slice.  This must happen before ``import jax`` anywhere in the test
process, which is why it lives at the top of conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Keep test numerics deterministic and fast.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# The environment's TPU plugin ("axon") prepends itself to jax_platforms
# regardless of the env var, so the env var alone is not enough — pin the
# config before any test touches a device.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, (
    "expected the 8-device virtual CPU mesh; got "
    f"{jax.device_count()} devices")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped so every test sees the same stream regardless of
    # which other tests ran first — mismatch budgets stay deterministic.
    return np.random.default_rng(0)
