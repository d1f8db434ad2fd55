"""Shared backbone building blocks (flax.linen).

Conventions:
- Public backbone interface takes spectrograms as ``[N, C, F, T]`` (the
  reference's NCHW layout, so config parity is trivial) and internally
  computes in NHWC, XLA's preferred conv layout on TPU.
- Feature-map outputs are returned as ``[N, C, H, W]``; flattened outputs as
  ``[N, D]``.
- ``use_running_statistics`` mirrors torch ``track_running_stats``: when
  False, batch statistics are used in train *and* eval (reference
  conv_four.py:63).
- Compute dtype is configurable (bf16 default) while parameters stay fp32 —
  the MXU-native mixed-precision recipe.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 3, 1, 2))


class BatchNorm(nn.Module):
    """BatchNorm with torch ``track_running_stats`` semantics."""

    use_running_statistics: bool = True
    momentum: float = 0.9  # torch momentum 0.1 == flax momentum 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``mask`` (broadcastable to ``x``, True = contributes) restricts
        the BATCH statistics to valid rows — used by heads whose
        batch-stat-only BNs run over bucket-padded eval batches, so the
        padding rows don't perturb real rows' normalization (the torch
        reference never pads; dense inputs make this a no-op)."""
        use_running_average = (not train) and self.use_running_statistics
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
        )(x, mask=mask)


def activation_fn(leaky_relu: bool, negative_slope: float) -> Callable:
    if leaky_relu:
        return lambda x: nn.leaky_relu(x, negative_slope=negative_slope)
    return nn.relu


def max_pool_floor(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """Max pool with torch's default floor (VALID) semantics on NHWC."""
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="VALID")


class ConvBnAct(nn.Module):
    """Conv3x3(SAME) → BN → activation, the four-conv-block unit
    (reference conv_four.py:61-85)."""

    features: int
    use_running_statistics: bool = True
    leaky_relu: bool = False
    negative_slope: float = 0.2
    kernel: Tuple[int, int] = (3, 3)
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # sample_mask: [N] bool — rows contributing to batch statistics
        # (bucket-padded batches under batch-stat-only BN; see BatchNorm)
        x = nn.Conv(
            self.features,
            self.kernel,
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        mask = None if sample_mask is None else sample_mask[:, None, None, None]
        x = BatchNorm(
            use_running_statistics=self.use_running_statistics, dtype=self.dtype
        )(x, train, mask=mask)
        return activation_fn(self.leaky_relu, self.negative_slope)(x)


class DropBlock(nn.Module):
    """DropBlock regularization (reference model/backbone/utils/dropblock.py):
    drops contiguous ``block_size`` spatial squares of a feature map.  Seed
    centers are Bernoulli(gamma) in the valid interior; the dropped mask is a
    max-pool dilation of the seeds — pure elementwise/pool ops, fuses cleanly.
    Operates on NHWC."""

    block_size: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, gamma, train: bool) -> jnp.ndarray:
        # gamma may be a traced scalar (batch-counter keep-rate schedule) —
        # no python branching on its value; gamma == 0 naturally drops nothing.
        if not train:
            return x
        rng = self.make_rng("dropblock")
        n, h, w, c = x.shape
        bs = min(self.block_size, h, w)
        import jax

        seeds = jax.random.bernoulli(rng, gamma, (n, h - bs + 1, w - bs + 1, c)).astype(
            x.dtype
        )
        pad_lo = bs // 2
        pad_hi = bs - 1 - pad_lo
        seeds = jnp.pad(
            seeds, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0))
        )
        block_mask = 1.0 - nn.max_pool(
            seeds, (bs, bs), strides=(1, 1), padding="SAME"
        )
        keep = jnp.mean(block_mask)
        return x * block_mask * (1.0 / jnp.maximum(keep, 1e-6))


def floor_power(num: int, divisor: int, power: int) -> int:
    """Recursive floor-divide (reference conv_four.py:11-25).  The reference
    uses it to size Conv64F's Linear input for [128, 157] log-mel inputs;
    flax infers that shape, so this exists only to document/verify the
    reference geometry in tests."""
    for _ in range(power):
        num = num // divisor
    return num


def clean_kwargs(kwargs):
    """Drop None-valued config kwargs (YAML ``~``/null passthrough) before
    constructing a flax dataclass module."""
    return {k: v for k, v in kwargs.items() if v is not None}
