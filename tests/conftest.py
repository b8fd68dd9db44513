"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so that multi-chip sharding
(jax.sharding.Mesh + shard_map) is exercised without TPU hardware, mirroring
how the driver dry-runs the multi-chip path.  The env vars must be set before
jax is imported anywhere in the test process.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC71)
