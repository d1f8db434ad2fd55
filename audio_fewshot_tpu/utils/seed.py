"""Seeding (reference libfewshot_core/utils/utils.py:268-287 ``init_seed``).

JAX is functionally seeded — there is no global RNG to pin, and XLA:TPU is
deterministic by default, so the cudnn.deterministic toggle has no analogue.
We seed python/numpy (host-side episodic sampling) and hand back a root
``jax.random.PRNGKey`` that all device-side randomness descends from.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def init_seed(seed: int = 0, deterministic: bool = True) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)
