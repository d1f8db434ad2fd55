"""Four-block convolutional backbones: Conv64F, Conv32F, R2D2Embedding.

Reference: libfewshot_core/model/backbone/conv_four.py (audio-modified
CloserLookFewShot nets).  Audio deltas vs upstream LibFewShot:
- 3×3 stride-3 max pools (conv_four.py:65,71,78,85) instead of 2×2 — sized
  for [128 mel × 157 frame] spectrograms,
- ``num_channels`` first-conv parameter (1 for log-mel),
- ``use_running_statistics`` BN switch (conv_four.py:63),
- a ``logits`` projection head Dropout(0.3) → BN1d → Dense(1600) applied when
  ``is_flatten`` (conv_four.py:87-92).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from .layers import BatchNorm, ConvBnAct, max_pool_floor, to_nchw, to_nhwc


class ConvNF(nn.Module):
    """Shared 4-block conv net; Conv64F/Conv32F differ only in width."""

    features: int = 64
    is_flatten: bool = False
    is_feature: bool = False
    leaky_relu: bool = False
    negative_slope: float = 0.2
    last_pool: bool = True
    maxpool_last2: bool = True
    use_running_statistics: bool = True
    num_channels: int = 1
    logits_dim: int = 1600
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = to_nhwc(x).astype(self.dtype)
        blk = dict(
            features=self.features,
            use_running_statistics=self.use_running_statistics,
            leaky_relu=self.leaky_relu,
            negative_slope=self.negative_slope,
            dtype=self.dtype,
        )
        out1 = max_pool_floor(ConvBnAct(**blk, name="layer1")(x, train), 3, 3)
        out2 = max_pool_floor(ConvBnAct(**blk, name="layer2")(out1, train), 3, 3)
        out3 = ConvBnAct(**blk, name="layer3")(out2, train)
        if self.maxpool_last2:
            out3 = max_pool_floor(out3, 3, 3)
        out4 = ConvBnAct(**blk, name="layer4")(out3, train)
        if self.last_pool:
            out4 = max_pool_floor(out4, 3, 3)

        if 0 in out4.shape:
            raise ValueError(
                f"Conv64F pooled the input to an empty tensor {out4.shape}; "
                "input spectrogram too small for the 3x stride-3 pool stack "
                "(disable last_pool/maxpool_last2 or use larger inputs)"
            )
        out4 = out4.astype(jnp.float32)
        if self.is_flatten:
            flat = out4.reshape(out4.shape[0], -1)
            flat = nn.Dropout(0.3, deterministic=not train)(flat)
            flat = BatchNorm(use_running_statistics=True, name="logits_bn")(flat, train)
            out4 = nn.Dense(self.logits_dim, name="logits_dense")(flat)

        if self.is_feature:
            maps = (to_nchw(out1), to_nchw(out2), to_nchw(out3))
            final = out4 if out4.ndim == 2 else to_nchw(out4)
            return maps + (final,)
        return out4 if out4.ndim == 2 else to_nchw(out4)


@BACKBONES.register("Conv64F")
def conv64f(**kwargs) -> ConvNF:
    kwargs.pop("is_bdc", None)
    return ConvNF(features=64, **_clean(kwargs))


@BACKBONES.register("Conv32F")
def conv32f(**kwargs) -> ConvNF:
    return ConvNF(features=32, **_clean(kwargs))


def _clean(kwargs):
    return {k: v for k, v in kwargs.items() if v is not None}


class R2D2Embedding(nn.Module):
    """R2D2's 4-block embedding, widths 96/192/384/512, output =
    concat(flatten(block3), flatten(block4)) (reference conv_four.py:224-262).
    Audio sizing: pools are 2×2 upstream; the audio fork keeps the reference
    block structure with dropout on the last two blocks."""

    num_channels: int = 1
    use_running_statistics: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = to_nhwc(x).astype(self.dtype)
        widths = (96, 192, 384, 512)
        feats = []
        for i, w in enumerate(widths):
            x = ConvBnAct(
                features=w,
                use_running_statistics=self.use_running_statistics,
                leaky_relu=True,
                negative_slope=0.1,
                dtype=self.dtype,
                name=f"block{i + 1}",
            )(x, train)
            x = max_pool_floor(x, 2, 2)
            if i >= 2:
                x = nn.Dropout(0.4, deterministic=not train)(x)
                feats.append(x)
        b3, b4 = feats
        n = x.shape[0]
        out = jnp.concatenate(
            [b3.reshape(n, -1), b4.reshape(n, -1)], axis=-1
        )
        return out.astype(jnp.float32)


@BACKBONES.register("R2D2Embedding")
def r2d2_embedding(**kwargs) -> R2D2Embedding:
    return R2D2Embedding(**_clean(kwargs))


class Conv64FMCL(nn.Module):
    """Dense-map 4-block conv for MCL-style local-descriptor methods
    (reference conv_four_mcl.py): 2×2 pools on the first two blocks only,
    keeping a high-resolution [64, F/4, T/4] map."""

    num_channels: int = 1
    use_running_statistics: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = to_nhwc(x).astype(self.dtype)
        for i in range(4):
            x = ConvBnAct(
                features=64,
                use_running_statistics=self.use_running_statistics,
                dtype=self.dtype,
                name=f"layer{i + 1}",
            )(x, train)
            if i < 2:
                x = max_pool_floor(x, 2, 2)
        return to_nchw(x.astype(jnp.float32))


@BACKBONES.register("Conv64F_MCL")
def conv64f_mcl(**kwargs) -> Conv64FMCL:
    return Conv64FMCL(**_clean(kwargs))
