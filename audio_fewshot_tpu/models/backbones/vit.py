"""Vision Transformers over spectrograms.

Reference: libfewshot_core/model/backbone/vit.py (standard einops ViT,
returns the cls feature) and vit_class_aware.py (DINO-style
``VisionTransformer`` returning the full token sequence — cls + patch
tokens — for CPEA; ``vit_tiny``/``vit_small`` factories :368-391).

Audio sizing: patch embedding is a strided conv, so any [F, T] divisible by
the patch size works; non-divisible inputs are right/bottom-cropped (the
audio shapes [128, 157] give 8×9 patches at patch 16).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from .layers import to_nhwc

Dtype = Any


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    #: reference vit.py (standard ViT) uses torch-default LN eps 1e-5;
    #: vit_class_aware.py pins eps=1e-6 (:230)
    ln_eps: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        # dropout placement per the reference (vit_class_aware.py Attention/
        # Mlp): proj_drop on the attention OUTPUT and drop after BOTH MLP
        # linears — not on the attention probabilities (attn_drop_rate
        # defaults to 0 there)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=0.0, deterministic=True, name="attn",
        )(y, y)
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        x = x + y
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        return x + y


class VisionTransformer(nn.Module):
    """Class-aware ViT: returns [N, 1+L, dim] token sequence when
    ``return_tokens`` else the cls feature [N, dim]."""

    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    return_tokens: bool = False
    num_channels: int = 1
    ln_eps: float = 1e-6  # class-aware reference default (vit_class_aware.py:230)
    #: "cls" (ours, with final norm) or "mean" — the standard-ViT reference
    #: mean-pools tokens (vit.py:166); combine with final_norm=False for
    #: exact reference-output semantics (converted-checkpoint parity)
    pool: str = "cls"
    final_norm: bool = True
    #: per-block ``jax.checkpoint`` (flax ``nn.remat``): store only block
    #: boundaries on the fwd pass and recompute internals during bwd —
    #: trades ~1 extra fwd of FLOPs for O(depth) less activation HBM.
    #: Parameter names are unchanged, so converted checkpoints still load.
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = to_nhwc(x).astype(self.dtype)
        p = self.patch_size
        n, h, w, _ = x.shape
        x = x[:, : (h // p) * p, : (w // p) * p, :]
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.embed_dim)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + gh * gw, self.embed_dim),
        ).astype(self.dtype)
        x = x + pos
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        # static_argnums counts the bound module as arg 0, so ``train``
        # (a python bool steering Dropout determinism) is arg 2
        block_cls = (
            nn.remat(TransformerBlock, static_argnums=(2,))
            if self.remat else TransformerBlock
        )
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                ln_eps=self.ln_eps, dtype=self.dtype, name=f"block{i}",
            )(x, train)
        if self.final_norm:
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        x = x.astype(jnp.float32)
        if self.return_tokens:
            return x
        if self.pool == "mean":
            return x.mean(axis=1)
        return x[:, 0]


from .layers import clean_kwargs as _clean  # noqa: E402


@BACKBONES.register("ViT")
def vit(**kwargs):
    """Standard ViT under the reference's name.  Documented delta: the
    reference (vit.py:118-151) mean-pools all tokens with no final norm;
    ours returns the final-norm'd cls feature (the stronger few-shot
    convention, and the only shipped ViT.yaml is an all-zeros FIXME
    placeholder — no runnable reference config pins the pooling)."""
    kwargs.pop("image_size", None)
    # accept the reference's standard-ViT kwarg names (vit.py /
    # config/backbones/ViT.yaml: dim/heads/mlp_dim/dim_head/dropout/
    # emb_dropout/channels) alongside ours
    renames = {
        "dim": "embed_dim", "heads": "num_heads", "channels": "num_channels",
        "dropout": "drop_rate",
    }
    for src, dst in renames.items():
        if src in kwargs:
            kwargs.setdefault(dst, kwargs.pop(src))
    mlp_dim = kwargs.pop("mlp_dim", None)
    if mlp_dim and kwargs.get("embed_dim"):
        kwargs.setdefault("mlp_ratio", float(mlp_dim) / kwargs["embed_dim"])
    kwargs.pop("dim_head", None)  # ours derives head_dim = dim / heads
    kwargs.pop("emb_dropout", None)  # folded into drop_rate (pos_drop)
    kwargs.pop("num_classes", None)  # reference head is identity at 0
    # ``pool: mean`` + ``final_norm: false`` restore the exact reference
    # output semantics (vit.py:166 mean-pools with no final norm) — used
    # by converted reference checkpoints; the default stays ours (cls +
    # final norm, documented delta)
    kwargs = _clean(kwargs)
    # the standard-ViT reference (vit.py) uses torch-default LN eps —
    # after _clean so an explicit null can't resurrect the 1e-6 default
    kwargs.setdefault("ln_eps", 1e-5)
    return VisionTransformer(**kwargs)


@BACKBONES.register("vit_tiny")
def vit_tiny(patch_size: int = 16, **kwargs):
    defaults = dict(embed_dim=192, depth=12, num_heads=3, return_tokens=True)
    defaults.update(_clean(kwargs))
    return VisionTransformer(patch_size=patch_size, **defaults)


@BACKBONES.register("vit_small")
def vit_small(patch_size: int = 16, **kwargs):
    defaults = dict(embed_dim=384, depth=12, num_heads=6, return_tokens=True)
    defaults.update(_clean(kwargs))
    return VisionTransformer(patch_size=patch_size, **defaults)


@BACKBONES.register("VisionTransformer")
def vision_transformer(**kwargs):
    """The reference's class-aware ViT under its registry name
    (vit_class_aware.py:213, used by CPEA.yaml with explicit depth/
    embed_dim/mlp_ratio/num_heads/patch_size/qkv_bias kwargs).  Returns
    token sequences (the CPEA contract).  ``qkv_bias`` is accepted for
    config parity (our attention always carries biases, the reference
    default)."""
    kwargs.pop("qkv_bias", None)
    defaults = dict(return_tokens=True)
    defaults.update(_clean(kwargs))
    return VisionTransformer(**defaults)
