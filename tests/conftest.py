"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so that multi-chip sharding
(jax.sharding.Mesh + shard_map) is exercised without TPU hardware, mirroring
how the driver dry-runs the multi-chip path.

Note: this environment pre-imports jax at interpreter startup (PYTHONPATH
site hook) with JAX_PLATFORMS=axon, so setting env vars alone is not enough —
we must also override via jax.config after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC71)
