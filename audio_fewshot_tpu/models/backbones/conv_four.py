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
    #: the logits-head BN1d may follow DIFFERENT semantics from the conv
    #: BN2ds: the reference's convert_maml_module wraps ONLY BatchNorm2d in
    #: the always-batch-stat fw variant (maml_module.py:138-141), so a
    #: maml-converted model in eval() mode runs batch-stat conv BNs but a
    #: standard running-stat logits BN1d (DMatchingNet; matchingnet_ifsl.py:
    #: 241).  None = follow use_running_statistics.
    logits_bn_running_statistics: Optional[bool] = None
    num_channels: int = 1
    logits_dim: int = 1600
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 sample_mask: Optional[jnp.ndarray] = None):
        # sample_mask: [N] bool — rows contributing to BN batch statistics.
        # Only meaningful under batch-stat-only BN (the MAML family forces
        # use_running_statistics=False): bucket-padded query rows must not
        # perturb real rows' normalization — the torch reference computes
        # its per-episode stats over real segments only (maml.py:79
        # forward_output on the episode's packed query set).
        x = to_nhwc(x).astype(self.dtype)
        blk = dict(
            features=self.features,
            use_running_statistics=self.use_running_statistics,
            leaky_relu=self.leaky_relu,
            negative_slope=self.negative_slope,
            dtype=self.dtype,
        )
        m = sample_mask
        out1 = max_pool_floor(ConvBnAct(**blk, name="layer1")(x, train, m), 3, 3)
        out2 = max_pool_floor(ConvBnAct(**blk, name="layer2")(out1, train, m), 3, 3)
        out3 = ConvBnAct(**blk, name="layer3")(out2, train, m)
        if self.maxpool_last2:
            out3 = max_pool_floor(out3, 3, 3)
        out4 = ConvBnAct(**blk, name="layer4")(out3, train, m)
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
            # the reference builds this BN1d with default
            # track_running_stats=True (conv_four.py:90) — standard
            # semantics — but honoring the module flag matters for the
            # MAML family, whose inner loop keeps every BN in batch-stat
            # mode (set_forward_adaptation calls .train(); build_method
            # forces use_running_statistics=False there — torch oracle:
            # tests/test_maml_oracle.py)
            logits_bn_running = (
                self.use_running_statistics
                if self.logits_bn_running_statistics is None
                else self.logits_bn_running_statistics
            )
            flat = BatchNorm(
                use_running_statistics=logits_bn_running,
                name="logits_bn",
            )(flat, train,
              mask=None if sample_mask is None else sample_mask[:, None])
            out4 = nn.Dense(self.logits_dim, name="logits_dense")(flat)

        if self.is_feature:
            maps = (to_nchw(out1), to_nchw(out2), to_nchw(out3))
            final = out4 if out4.ndim == 2 else to_nchw(out4)
            return maps + (final,)
        return out4 if out4.ndim == 2 else to_nchw(out4)


@BACKBONES.register("Conv64F")
def conv64f(**kwargs) -> ConvNF:
    kwargs.pop("is_bdc", None)
    # several shipped reference leaf configs (baseline++/skd/maml/... via a
    # stale backbones/resnet12.yaml include) carry resnet-only kwargs that
    # the reference's own Conv64F would crash on (conv_four.py:38-49 has no
    # **kwargs; get_backbone passes them through) — broken as snapshotted;
    # the intended behavior is that Conv64F ignores them
    kwargs.pop("keep_prob", None)
    kwargs.pop("avg_pool", None)
    return ConvNF(features=64, **_clean(kwargs))


class Conv32F(nn.Module):
    """Conv32F (reference conv_four.py:161-200): four 3×3 conv blocks at
    width 32, 2×2 stride-2 max pools after layers 1-3 (layer 4 unpooled),
    raw flatten when ``is_flatten`` — NO logits projection head (that head
    is Conv64F-only)."""

    is_flatten: bool = False
    is_feature: bool = False
    leaky_relu: bool = False
    negative_slope: float = 0.2
    num_channels: int = 1
    use_running_statistics: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = to_nhwc(x).astype(self.dtype)
        maps = []
        for i in range(4):
            x = ConvBnAct(
                features=32,
                use_running_statistics=self.use_running_statistics,
                leaky_relu=self.leaky_relu,
                negative_slope=self.negative_slope,
                dtype=self.dtype,
                name=f"layer{i + 1}",
            )(x, train)
            if i < 3:
                x = max_pool_floor(x, 2, 2)
            maps.append(x)
        out = x.astype(jnp.float32)
        if self.is_flatten:
            out = out.reshape(out.shape[0], -1)
        else:
            out = to_nchw(out)
        if self.is_feature:
            return tuple(to_nchw(m.astype(jnp.float32)) for m in maps[:-1]) + (out,)
        return out


@BACKBONES.register("Conv32F")
def conv32f(**kwargs) -> Conv32F:
    kwargs.pop("last_pool", None)
    kwargs.pop("maxpool_last2", None)
    return Conv32F(**_clean(kwargs))


from .layers import clean_kwargs as _clean  # noqa: E402  (shared helper)


class R2D2Embedding(nn.Module):
    """R2D2's 4-block embedding (reference conv_four.py:203-262 /
    MetaOptNet): conv3×3 → BN → MaxPool2d(2, stride) → [LeakyReLU 0.1] →
    [Dropout 0.1]; widths 96/192/384/512; block 3 keeps prob 0.9; block 4
    has NO activation (the Gidaris accuracy trick, explicitly disabled in
    the reference), keep-prob 0.9 and a stride-1 pool; output =
    concat(flatten(block3), flatten(block4))."""

    num_channels: int = 1
    use_running_statistics: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = to_nhwc(x).astype(self.dtype)

        def block(x, width, name, retain_activation=True, keep_prob=1.0,
                  pool_stride=2):
            x = nn.Conv(width, (3, 3), padding="SAME", use_bias=True,
                        dtype=self.dtype, name=f"{name}_conv")(x)
            x = BatchNorm(
                use_running_statistics=self.use_running_statistics,
                dtype=self.dtype, name=f"{name}_bn",
            )(x, train)
            x = nn.max_pool(x, (2, 2), strides=(pool_stride, pool_stride),
                            padding="VALID")
            if retain_activation:
                x = nn.leaky_relu(x, negative_slope=0.1)
            if keep_prob < 1.0:
                x = nn.Dropout(1.0 - keep_prob, deterministic=not train)(x)
            return x

        b1 = block(x, 96, "block1")
        b2 = block(b1, 192, "block2")
        b3 = block(b2, 384, "block3", keep_prob=0.9)
        b4 = block(b3, 512, "block4", retain_activation=False, keep_prob=0.9,
                   pool_stride=1)
        n = x.shape[0]
        # flatten in torch CHW order (reference b.view(n, -1) on NCHW) so
        # converted checkpoints and cross-framework features align
        out = jnp.concatenate(
            [
                b3.transpose(0, 3, 1, 2).reshape(n, -1),
                b4.transpose(0, 3, 1, 2).reshape(n, -1),
            ],
            axis=-1,
        )
        return out.astype(jnp.float32)


@BACKBONES.register("R2D2Embedding")
def r2d2_embedding(**kwargs) -> R2D2Embedding:
    return R2D2Embedding(**_clean(kwargs))


class Conv64FMCL(nn.Module):
    """Dense-map 4-block conv for MCL-style local-descriptor methods
    (reference conv_four_mcl.py): bias-free conv → BN → LeakyReLU(0.2) →
    2×2 pool in EVERY block, yielding a [64, F/16, T/16] map."""

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
                leaky_relu=True,
                use_bias=False,
                dtype=self.dtype,
                name=f"layer{i + 1}",
            )(x, train)
            x = max_pool_floor(x, 2, 2)
        return to_nchw(x.astype(jnp.float32))


@BACKBONES.register("Conv64F_MCL")
def conv64f_mcl(**kwargs) -> Conv64FMCL:
    return Conv64FMCL(**_clean(kwargs))
