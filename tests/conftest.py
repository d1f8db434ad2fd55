"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY §4 test strategy).

NOTE: in this environment jax is preloaded by a sitecustomize that registers
a remote TPU ("axon") backend and latches ``JAX_PLATFORMS=axon`` — env vars
set here are too late.  ``jax.config.update`` still works because backends
are created lazily; ``XLA_FLAGS`` is read at CPU-client creation, which also
hasn't happened yet at conftest import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
