"""WideResNet (WRN-28-10 style).

Reference: libfewshot_core/model/backbone/wrn.py — pre-activation BasicBlocks
(BN→ReLU→conv), 3 groups of (depth-4)/6 blocks with widths 16/32/64 × widen
factor, strides 1/2/2, final BN+ReLU, adaptive MAX-pool to 1×1 (note:
the reference uses ``adaptive_max_pool2d`` despite the "avg_pool" flag name —
wrn.py:134), flatten.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from .layers import BatchNorm, to_nchw, to_nhwc

Dtype = Any


class WRNBlock(nn.Module):
    planes: int
    stride: int = 1
    drop_rate: float = 0.0
    use_running_statistics: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        equal_in_out = x.shape[-1] == self.planes
        pre = nn.relu(BatchNorm(use_running_statistics=self.use_running_statistics, dtype=self.dtype, name="bn1")(x, train))
        # pre-activation feeds the shortcut only when channels change
        # torch padding=1 semantics (symmetric) — flax SAME pads
        # right/bottom under stride 2, shifting the strided map one pixel
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                      name="conv1")(pre)
        out = nn.relu(BatchNorm(use_running_statistics=self.use_running_statistics, dtype=self.dtype, name="bn2")(out, train))
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        if equal_in_out:
            shortcut = x
        else:
            shortcut = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="shortcut")(pre)
        return out + shortcut


class WideResNet(nn.Module):
    depth: int = 28
    widen_factor: int = 10
    drop_rate: float = 0.0
    is_flatten: bool = True
    avg_pool: bool = True
    num_channels: int = 1
    use_running_statistics: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert (self.depth - 4) % 6 == 0, "depth should be 6n+4"
        n = (self.depth - 4) // 6
        widths = (16 * self.widen_factor, 32 * self.widen_factor, 64 * self.widen_factor)

        x = to_nhwc(x).astype(self.dtype)
        x = nn.Conv(16, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        for g, w in enumerate(widths):
            for b in range(n):
                x = WRNBlock(
                    w, stride=(1 if g == 0 else 2) if b == 0 else 1,
                    drop_rate=self.drop_rate,
                    use_running_statistics=self.use_running_statistics,
                    dtype=self.dtype, name=f"block{g + 1}_{b}",
                )(x, train)
        x = nn.relu(BatchNorm(use_running_statistics=self.use_running_statistics, dtype=self.dtype, name="bn1")(x, train))
        x = x.astype(jnp.float32)
        if self.avg_pool:
            x = jnp.max(x, axis=(1, 2), keepdims=not self.is_flatten)
        if self.is_flatten:
            return x.reshape(x.shape[0], -1)
        return to_nchw(x)


@BACKBONES.register("WRN")
def wrn(**kwargs):
    return WideResNet(**{k: v for k, v in kwargs.items() if v is not None})
