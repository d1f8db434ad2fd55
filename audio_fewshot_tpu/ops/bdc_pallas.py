"""Pallas TPU kernel for BDC pooling — fused gram + epilogue.

The XLA path (ops/bdc.py) lowers to a batched matmul plus separate fused
elementwise/reduction kernels, each bouncing the [B, d, d] intermediate
through HBM.  For the flagship ``reduce_dim: 64`` geometry those tensors are
tiny (16 KB), so kernel-launch overhead and HBM round-trips dominate — this
kernel computes the whole op (gram → distance → sqrt-scale → double
centering) for one batch element per grid step, entirely in VMEM.

Numerics match ``ops/bdc.py`` (same formula; see the parity test).  Use
``bdc_pool_fused`` with ``triuvec`` from ops/bdc.py; the XLA path stays the
default on non-TPU backends and under ``interpret=True`` for CPU tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bdc_kernel(x_ref, log_t_ref, out_ref):
    # x_ref: [1, d, M] one batch element in VMEM; out_ref: [1, d, d]
    x = x_ref[0].astype(jnp.float32)
    gram = jnp.dot(x, x.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    d = gram.shape[0]
    # diagonal via mask-reduce (same rounding path as the XLA reference —
    # a separate sum(x*x) diverges by ~1e-3 through the sqrt cancellation)
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    diag = jnp.sum(jnp.where(rows == cols, gram, 0.0), axis=1)
    dist2 = jnp.maximum(diag[:, None] + diag[None, :] - 2.0 * gram, 0.0)
    dcov = jnp.sqrt(jnp.exp(log_t_ref[0, 0]) * dist2 + 1e-5)
    row = jnp.mean(dcov, axis=1, keepdims=True)
    col = jnp.mean(dcov, axis=0, keepdims=True)
    grand = jnp.mean(dcov)
    out_ref[0] = dcov - row - col + grand


def bdc_pool_fused(x: jnp.ndarray, log_t: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """[B, d, M] → [B, d, d] double-centered BDC matrices (fused kernel)."""
    b, d, m = x.shape
    log_t_arr = jnp.full((1, 1), log_t, jnp.float32)
    return pl.pallas_call(
        _bdc_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, d, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, d, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, d), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), log_t_arr)
