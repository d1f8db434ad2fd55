"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY §4 test strategy)."""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the dev box tunnels to a
# real TPU via the experimental "axon" platform — far too slow for unit tests).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
