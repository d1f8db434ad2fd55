"""ResNet-18 (few-shot variant) + resnet18Bdc.

Reference: libfewshot_core/model/backbone/resnet_18.py — torchvision-style
BasicBlocks but with a 3×3 stride-1 stem (no 7×7, no stem maxpool: inputs
are 84×84-scale, here 128×157 spectrograms), ``last_block_stride``
configurable, adaptive 1×1 avg-pool head, and manifold-mixup hooks (a
randomly chosen layer mixes hidden states — used by S2M2,
resnet_18.py:152-180).  resnet18Bdc (resnet_bdc.py:144-190) uses the
ImageNet stem (7×7/2 + 3×3/2 maxpool) and a BDC head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from .layers import BatchNorm, to_nchw, to_nhwc
from .resnet import BdcHead

Dtype = Any


class BasicBlock2(nn.Module):
    """Standard 2-conv residual block (stride on conv1)."""

    planes: int
    stride: int = 1
    use_running_statistics: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # torch Conv2d(padding=1) semantics: explicit symmetric pad — flax
        # "SAME" pads asymmetrically (right/bottom) under stride 2, which
        # shifts every strided feature map one pixel vs the reference
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = BatchNorm(use_running_statistics=self.use_running_statistics, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(use_running_statistics=self.use_running_statistics, dtype=self.dtype, name="bn2")(out, train)
        residual = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = BatchNorm(use_running_statistics=self.use_running_statistics, dtype=self.dtype, name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


class ResNet18(nn.Module):
    layers: Sequence[int] = (2, 2, 2, 2)
    is_flatten: bool = True
    avg_pool: bool = True
    is_feature: bool = False
    last_block_stride: int = 2
    num_channels: int = 1
    use_running_statistics: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        mixup_lam: Optional[jnp.ndarray] = None,
        mixup_index: Optional[jnp.ndarray] = None,
        mixup_layer: int = -1,
    ):
        """``mixup_*``: manifold-mixup hook — when ``mixup_layer == k``, the
        hidden state after stage k is mixed as ``lam*h + (1-lam)*h[index]``
        (reference resnet_18.py:152-180; S2M2 picks k at random on the
        host, so it is a static arg here)."""

        def maybe_mix(h, k):
            if mixup_layer == k and mixup_lam is not None:
                return mixup_lam * h + (1.0 - mixup_lam) * h[mixup_index]
            return h

        x = to_nhwc(x).astype(self.dtype)
        x = maybe_mix(x, 0)
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(BatchNorm(use_running_statistics=self.use_running_statistics, dtype=self.dtype, name="bn1")(x, train))

        feats = []
        strides = (1, 2, 2, self.last_block_stride)
        for stage, (n_blocks, planes) in enumerate(
            zip(self.layers, (64, 128, 256, 512))
        ):
            for b in range(n_blocks):
                x = BasicBlock2(
                    planes, stride=strides[stage] if b == 0 else 1,
                    use_running_statistics=self.use_running_statistics,
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                )(x, train)
            x = maybe_mix(x, stage + 1)
            feats.append(x)

        x = x.astype(jnp.float32)
        if self.avg_pool:
            x = jnp.mean(x, axis=(1, 2), keepdims=not self.is_flatten)
        if self.is_flatten:
            x = x.reshape(x.shape[0], -1)
        elif x.ndim == 4:
            x = to_nchw(x)
        if self.is_feature:
            return tuple(to_nchw(f.astype(jnp.float32)) for f in feats[:-1]) + (x,)
        return x


@BACKBONES.register("resnet18")
def resnet18(**kwargs):
    return ResNet18(**{k: v for k, v in kwargs.items() if v is not None})


class ResNet18BDC(nn.Module):
    """resnet18Bdc: ImageNet stem + [2,2,2,2] blocks + BDC head
    (reference resnet_bdc.py:144-190; last two stages stride 1 to keep
    spatial resolution for the covariance)."""

    reduce_dim: int = 64
    fused_bdc: bool = False
    num_channels: int = 1
    use_running_statistics: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = to_nhwc(x).astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(BatchNorm(use_running_statistics=self.use_running_statistics, dtype=self.dtype, name="bn1")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        # stages 2 AND 3 downsample; the last stage is stride-1 to keep
        # resolution for the covariance (reference resnet_bdc.py:165
        # half_res = i >= 1 and j == 0 and i != 3)
        strides = (1, 2, 2, 1)
        for stage, planes in enumerate((64, 128, 256, 512)):
            for b in range(2):
                x = BasicBlock2(
                    planes, stride=strides[stage] if b == 0 else 1,
                    use_running_statistics=self.use_running_statistics,
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                )(x, train)
        x = x.astype(jnp.float32)
        return BdcHead(reduce_dim=self.reduce_dim, fused_bdc=self.fused_bdc, name="bdc_pool")(x, train)


@BACKBONES.register("resnet18Bdc")
def resnet18bdc(**kwargs):
    return ResNet18BDC(**{k: v for k, v in kwargs.items() if v is not None})
