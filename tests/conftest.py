"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates real multi-chip separately via
__graft_entry__.dryrun_multichip)."""

import os

# The container's sitecustomize pre-imports jax and registers the TPU
# plugin before any user code runs, so env-var platform selection is too
# late — but backends are not yet *initialized*, so jax.config still wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
