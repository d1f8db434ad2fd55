"""Weight re-initialization keyed by ``init_type``.

Reference: libfewshot_core/model/init.py (:53 ``init_weights``) — appliers
for normal / xavier / kaiming / orthogonal re-initialization of conv and
linear weights after model construction.  Here it maps over an already-built
``params`` tree: every leaf named ``kernel`` whose rank ≥ 2 is redrawn with
the requested initializer (biases and norm scales untouched, matching the
reference's Conv/Linear-weight-only behavior).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

_INITIALIZERS = {
    "normal": nn.initializers.normal(stddev=0.02),
    "xavier": nn.initializers.xavier_normal(),
    "kaiming": nn.initializers.he_normal(),
    "orthogonal": nn.initializers.orthogonal(),
}


def init_weights(params: Dict[str, Any], init_type: str, rng: jax.Array) -> Dict[str, Any]:
    """Redraw all rank-≥2 ``kernel`` leaves with the named initializer."""
    if init_type not in _INITIALIZERS:
        raise ValueError(
            f"unknown init_type {init_type!r}; choose from {sorted(_INITIALIZERS)}"
        )
    init_fn = _INITIALIZERS[init_type]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, max(len(flat), 1))

    counter = iter(range(len(flat)))

    def redraw(path, leaf):
        i = next(counter)
        last = path[-1]
        name = getattr(last, "key", None)
        if name == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return init_fn(keys[i], leaf.shape, leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(redraw, params)
