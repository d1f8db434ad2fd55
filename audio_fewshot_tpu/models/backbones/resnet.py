"""ResNet-12 family — TADAM-style few-shot ResNets.

Reference: libfewshot_core/model/backbone/resnet_12.py (resnet12 /
resnet12woLSC: 4 stages × one 3-conv BasicBlock, planes 64/160/320/640,
LeakyReLU(0.1), 2×2 maxpool per stage, DropBlock on stages 3-4 with a
linear ramp over tracked batches, 5×5 stride-1 avg-pool head),
resnet_12_mcl.py (dense-map variants resnet12_mcl / resnet12_r2d2 that keep
spatial maps), and resnet_bdc.py (resnet12Bdc: stage-4 stride 1 + BdcPool
head with 1×1 reduction conv and learnable log-temperature).

TPU design: NHWC convs in bf16 (MXU layout), fp32 BN/params; the DropBlock
batch counter lives in the ``batch_stats`` collection so it rides the same
mutable-update path as BN running stats; the BDC head is the fused op in
``ops/bdc.py``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import bdc_pool, triuvec
from ...registry import BACKBONES
from .layers import BatchNorm, DropBlock, to_nchw, to_nhwc

Dtype = Any


class MtlConv(nn.Module):
    """Meta-transfer conv: frozen base kernel with learnable scale per
    (in, out) channel pair and per-output shift (reference
    backbone/utils/mtl_module.py ``Conv2dMtl`` — ``mtl_weight`` has shape
    (out, in, 1, 1); scale/shift are the only trainable parts in
    meta-train)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (kh, kw, cin, self.features)
        )
        scale = self.param(
            "mtl_scale", nn.initializers.ones, (1, 1, cin, self.features)
        )
        shift = self.param("mtl_bias", nn.initializers.zeros, (self.features,))
        k = (jax.lax.stop_gradient(kernel) * scale).astype(self.dtype or x.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(k.dtype), k, window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + shift.astype(y.dtype)


class BasicBlock3(nn.Module):
    """Three conv3x3+BN with residual (reference resnet_12.py BasicBlock).
    Downsample is a 1×1 stride-1 conv+BN (spatial shrink comes from the
    stage maxpool).  ``use_residual=False`` gives BasicBlockWithoutResidual
    (resnet12woLSC stage 4)."""

    planes: int
    use_pool: bool = True
    pool_stride: int = 2
    use_residual: bool = True
    drop_rate: float = 0.0
    drop_block: bool = False
    block_size: int = 5
    drop_schedule_steps: int = 40000  # reference ramp: 20 * 2000 batches
    use_running_statistics: bool = True
    mtl: bool = False  # Conv2dMtl scale/shift convs (resnet12MTLofficial)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        act = lambda v: nn.leaky_relu(v, negative_slope=0.1)
        if self.mtl:
            conv = lambda v, name: MtlConv(
                self.planes, (3, 3), dtype=self.dtype, name=name
            )(v)
        else:
            conv = lambda v, name: nn.Conv(
                self.planes, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name=name,
            )(v)
        bn = lambda v, name: BatchNorm(
            use_running_statistics=self.use_running_statistics,
            dtype=self.dtype, name=name,
        )(v, train)

        out = act(bn(conv(x, "conv1"), "bn1"))
        out = act(bn(conv(out, "conv2"), "bn2"))
        out = bn(conv(out, "conv3"), "bn3")

        if self.use_residual:
            residual = x
            if x.shape[-1] != self.planes:
                residual = bn(
                    nn.Conv(self.planes, (1, 1), use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x),
                    "downsample_bn",
                )
            out = out + residual
        out = act(out)

        if self.use_pool and self.pool_stride > 1:
            out = nn.max_pool(
                out, (self.pool_stride, self.pool_stride),
                strides=(self.pool_stride, self.pool_stride), padding="VALID",
            )

        if self.drop_rate > 0 and train:
            if self.drop_block:
                # linear keep-rate ramp over tracked batches
                # (reference resnet_12.py:83-97)
                counter = self.variable(
                    "batch_stats", "num_batches_tracked",
                    lambda: jnp.zeros((), jnp.int32),
                )
                if not self.is_initializing():
                    counter.value = counter.value + 1
                steps = counter.value.astype(jnp.float32)
                keep = jnp.maximum(
                    1.0 - self.drop_rate / self.drop_schedule_steps * steps,
                    1.0 - self.drop_rate,
                )
                feat = out.shape[1]
                bs = min(self.block_size, feat)
                gamma = (
                    (1.0 - keep) / (bs**2) * (feat**2)
                    / max((feat - bs + 1) ** 2, 1)
                )
                out = DropBlock(block_size=bs)(out, gamma, train)
            else:
                out = nn.Dropout(self.drop_rate, deterministic=False)(out)
        return out


class ResNet12(nn.Module):
    """4-stage few-shot ResNet-12 over [N, C, F, T] spectrograms."""

    planes: Sequence[int] = (64, 160, 320, 640)
    last_residual: bool = True  # False = resnet12woLSC stage 4
    avg_pool: bool = True
    is_flatten: bool = True
    maxpool_last2: bool = True
    last_stage_pool: bool = True  # False for the BDC variant (stride-1 stage 4)
    drop_rate: float = 0.1
    dropblock_size: int = 5
    keep_prob: float = 1.0
    num_channels: int = 1
    use_running_statistics: bool = True
    mtl: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = to_nhwc(x).astype(self.dtype)
        common = dict(
            drop_rate=self.drop_rate,
            block_size=self.dropblock_size,
            use_running_statistics=self.use_running_statistics,
            mtl=self.mtl,
            dtype=self.dtype,
        )
        x = BasicBlock3(self.planes[0], name="layer1", **common)(x, train)
        x = BasicBlock3(self.planes[1], name="layer2", **common)(x, train)
        x = BasicBlock3(
            self.planes[2], drop_block=True, use_pool=self.maxpool_last2,
            name="layer3", **common,
        )(x, train)
        x = BasicBlock3(
            self.planes[3], drop_block=True,
            use_pool=self.maxpool_last2 and self.last_stage_pool,
            use_residual=self.last_residual, name="layer4", **common,
        )(x, train)

        x = x.astype(jnp.float32)
        if self.avg_pool:
            k = (min(5, x.shape[1]), min(5, x.shape[2]))
            x = nn.avg_pool(x, k, strides=(1, 1), padding="VALID")
        if self.is_flatten:
            return x.reshape(x.shape[0], -1)
        return to_nchw(x)


@BACKBONES.register("resnet12")
def resnet12(**kwargs):
    return ResNet12(**_clean(kwargs))


class MtlBasicBlock(nn.Module):
    """Two-conv residual block with MtlConv convs (reference
    resnet_12_mtl_offcial.py BasicBlockMTL :160-209; stride on conv1,
    1×1-conv downsample when shape changes)."""

    planes: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        # torch padding=1 semantics under stride (see resnet18.py note)
        out = MtlConv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), dtype=self.dtype,
                      name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = MtlConv(self.planes, (3, 3), dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train)
        residual = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = MtlConv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(dtype=self.dtype, name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


class ResNetMTLOfficial(nn.Module):
    """MTL-official ResNet-12 (reference resnet_12_mtl_offcial.py:212-270):
    3×3 Conv2dMtl stem to 80 channels, THREE stages of FOUR two-conv
    MtlBasicBlocks at planes 160/320/640 (stride 2 on each stage's first
    block), 10×10 stride-1 avg pool, flatten."""

    num_channels: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = to_nhwc(x).astype(self.dtype)
        x = MtlConv(80, (3, 3), dtype=self.dtype, name="conv1")(x)
        x = nn.relu(BatchNorm(dtype=self.dtype, name="bn1")(x, train))
        for stage, planes in enumerate((160, 320, 640)):
            for b in range(4):
                x = MtlBasicBlock(
                    planes, stride=2 if b == 0 else 1, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
        x = x.astype(jnp.float32)
        k = (min(10, x.shape[1]), min(10, x.shape[2]))
        x = nn.avg_pool(x, k, strides=(1, 1), padding="VALID")
        # flatten in torch CHW order (reference x.view(n, -1) on NCHW)
        return x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)


@BACKBONES.register("resnet12MTLofficial")
def resnet12mtl(**kwargs):
    kwargs.pop("use_MTL", None)
    kwargs.pop("MTL", None)
    return ResNetMTLOfficial(**_clean(kwargs))


@BACKBONES.register("resnet12woLSC")
def resnet12wolsc(**kwargs):
    return ResNet12(
        planes=(64, 128, 256, 512), last_residual=False, **_clean(kwargs)
    )


class ResNet12Dense(nn.Module):
    """Dense-map ResNet-12 keeping [N, C, H, W] spatial output (reference
    resnet_12_mcl.py — used by MCL / R2D2 local-descriptor heads;
    dropblock_size 3, all four stages pooled)."""

    planes: Sequence[int] = (64, 160, 320, 640)
    drop_rate: float = 0.0
    dropblock_size: int = 3
    num_channels: int = 1
    use_running_statistics: bool = True
    #: reference resnet12_r2d2 adaptive-avg-pools to [N, C]
    #: (resnet_12_mcl.py:167-179); resnet12_mcl keeps the dense map
    global_avg_pool: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = to_nhwc(x).astype(self.dtype)
        common = dict(
            drop_rate=self.drop_rate, block_size=self.dropblock_size,
            use_running_statistics=self.use_running_statistics,
            dtype=self.dtype,
        )
        x = BasicBlock3(self.planes[0], name="layer1", **common)(x, train)
        x = BasicBlock3(self.planes[1], name="layer2", **common)(x, train)
        x = BasicBlock3(self.planes[2], drop_block=True, name="layer3", **common)(x, train)
        x = BasicBlock3(self.planes[3], drop_block=True, name="layer4", **common)(x, train)
        if self.global_avg_pool:
            return x.astype(jnp.float32).mean(axis=(1, 2))
        return to_nchw(x.astype(jnp.float32))


@BACKBONES.register("resnet12_mcl")
def resnet12_mcl(**kwargs):
    return ResNet12Dense(**_clean(kwargs))


@BACKBONES.register("resnet12_r2d2")
def resnet12_r2d2(**kwargs):
    kwargs.setdefault("global_avg_pool", True)
    return ResNet12Dense(**_clean(kwargs))


class BdcHead(nn.Module):
    """1×1 reduction conv + BDC pooling + triangular vectorization
    (reference bdc_pool.py BdcPool: reduce to ``reduce_dim`` channels, BDC
    matrix with learnable log-temperature, output d(d+1)/2).

    ``fused_bdc`` selects the Pallas kernel (ops/bdc_pallas.py — whole op in
    VMEM per batch element) over the XLA path; both are numerically
    equivalent and equally fast at reduce_dim 64, so XLA stays default."""

    reduce_dim: int = 64
    activate: str = "relu"
    fused_bdc: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # x: NHWC feature map
        n, h, w, c = x.shape
        if self.reduce_dim and self.reduce_dim != c:
            x = nn.Conv(self.reduce_dim, (1, 1), use_bias=False,
                        dtype=self.dtype, name="reduce_conv")(x)
            x = BatchNorm(dtype=self.dtype, name="reduce_bn")(x, train)
            x = (nn.leaky_relu(x, 0.1) if self.activate == "leaky_relu"
                 else nn.relu(x))
        log_t = self.param(
            "log_temperature",
            lambda rng: jnp.log(jnp.full((1, 1), 1.0 / (2.0 * h * w))),
        )
        d = x.shape[-1]
        flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, d, h * w)
        if self.fused_bdc:
            from ...ops.bdc_pallas import bdc_pool_fused

            return triuvec(bdc_pool_fused(flat, log_t[0, 0]))
        return triuvec(bdc_pool(flat, log_t[0, 0]))


class ResNet12BDC(nn.Module):
    """resnet12Bdc (reference resnet_bdc.py:283-359): ResNet-12 with
    stride-1 stage 4 (10×10 maps upstream) and a BDC pooling head."""

    reduce_dim: int = 64
    fused_bdc: bool = False
    drop_rate: float = 0.0
    dropblock_size: int = 5
    num_channels: int = 1
    use_running_statistics: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = to_nhwc(x).astype(self.dtype)
        common = dict(
            drop_rate=self.drop_rate, block_size=self.dropblock_size,
            use_running_statistics=self.use_running_statistics,
            dtype=self.dtype,
        )
        x = BasicBlock3(64, name="layer1", **common)(x, train)
        x = BasicBlock3(160, name="layer2", **common)(x, train)
        x = BasicBlock3(320, drop_block=True, name="layer3", **common)(x, train)
        x = BasicBlock3(640, drop_block=True, use_pool=False, name="layer4", **common)(x, train)
        x = x.astype(jnp.float32)
        return BdcHead(reduce_dim=self.reduce_dim, fused_bdc=self.fused_bdc, name="bdc_pool")(x, train)


@BACKBONES.register("resnet12Bdc")
def resnet12bdc(**kwargs):
    kwargs.pop("avg_pool", None)
    kwargs.pop("keep_prob", None)
    return ResNet12BDC(**_clean(kwargs))


from .layers import clean_kwargs as _clean  # noqa: E402  (shared helper)
