"""Swin Transformer (windowed attention) over spectrograms.

Reference: libfewshot_core/model/backbone/swin_transformer.py (424 LoC) —
standard Swin with ``swin_{mini,t,s,b,l}`` factories.  This is a TPU-compact
re-expression: window partition is a reshape (static shapes), shifted
windows use ``jnp.roll``, and the attention mask for shifted windows is
precomputed per stage.  Relative position bias included.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import BACKBONES
from .layers import to_nchw, to_nhwc

Dtype = Any


def window_partition(x, ws):
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(win, ws, h, w):
    c = win.shape[-1]
    x = win.reshape(-1, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


def shift_attn_mask(h, w, ws, shift):
    """Attention mask for shifted windows (−100 on cross-region pairs)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = window_partition(img[None, :, :, None].astype(np.float32), ws)[..., 0]
    diff = win[:, None, :] - win[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0))  # [nW, ws², ws²]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    head_dim: int = 32  # fixed per reference (inner dim = heads * 32)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [B_, N=ws², C]
        b, nt, c = x.shape
        head_dim = self.head_dim
        inner = self.num_heads * head_dim
        qkv = nn.Dense(inner * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, nt, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, jnp.float32)
        ).astype(q.dtype)

        ws = self.window_size
        rpb_table = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
        coords = coords.reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = (rel[0] + ws - 1) * (2 * ws - 1) + (rel[1] + ws - 1)
        bias = rpb_table[jnp.asarray(rel.reshape(-1))].reshape(
            nt, nt, self.num_heads
        ).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, self.num_heads, nt, nt)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b, self.num_heads, nt, nt)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nt, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int = 0
    head_dim: int = 32
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        # x: [N, H, W, C]
        n, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        # shift whenever ANY axis spans multiple windows (the reference
        # always shifts; a 7×14 map must mix along the long/time axis) —
        # only a single-window map (both dims ≤ ws) degenerates
        shift = self.shift if (h > ws or w > ws) else 0
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        # pad FIRST, then roll (official Swin order): the shift mask assumes
        # wrapped content sits in the last `shift` rows/cols of the padded
        # canvas — rolling the unpadded map misaligns it
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        hp, wp = y.shape[1], y.shape[2]
        mask = shift_attn_mask(hp, wp, ws, shift) if shift else None
        win = window_partition(y, ws)
        win = WindowAttention(
            dim=c, num_heads=self.num_heads, window_size=ws,
            head_dim=self.head_dim, dtype=self.dtype, name="attn",
        )(win, mask)
        y = window_reverse(win, ws, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w]
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class SwinTransformer(nn.Module):
    """Stages of shifted-window blocks; each stage s starts with an
    fs×fs patch-merge to ``embed_dim · 2^s`` channels (reference
    ``downscaling_factors``, swin_transformer.py:374-390; stage-0 merge is
    the patch embedding)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    downscaling_factors: Sequence[int] = (4, 2, 2, 2)
    window_size: int = 7
    head_dim: int = 32
    is_flatten: bool = True
    #: the reference ships NO final norm (its mlp_head is commented out,
    #: swin_transformer.py:355-359) — kept on by default here (it
    #: stabilizes few-shot cosine/euclid features); final_norm=False gives
    #: exact reference output (tests/test_torch_parity7.py)
    final_norm: bool = True
    num_channels: int = 1
    #: per-block ``jax.checkpoint`` (flax ``nn.remat``) — see
    #: VisionTransformer.remat; raises the practical episodes/batch on HBM
    #: (a [1,96,144] swin_mini train step OOMs at 8 eps/chip without it,
    #: BASELINE.md round-5 addendum)
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = to_nhwc(x).astype(self.dtype)
        for s, (depth, heads, f) in enumerate(
            zip(self.depths, self.num_heads, self.downscaling_factors)
        ):
            dim = self.embed_dim * (2 ** s)
            # f×f patch merge (f=1 keeps resolution, linear only)
            n_, h_, w_, c_ = x.shape
            hf, wf = (h_ // f) * f, (w_ // f) * f
            x = x[:, :hf, :wf]
            x = x.reshape(n_, hf // f, f, wf // f, f, c_)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                n_, hf // f, wf // f, f * f * c_
            )
            x = nn.Dense(dim, dtype=self.dtype, name=f"merge{s}")(x)
            # static_argnums: bound module is arg 0, ``train`` is arg 2
            block_cls = (
                nn.remat(SwinBlock, static_argnums=(2,))
                if self.remat else SwinBlock
            )
            for b in range(depth):
                x = block_cls(
                    dim=dim, num_heads=heads, window_size=self.window_size,
                    head_dim=self.head_dim,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{s}_block{b}",
                )(x, train)

        if self.final_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = x.astype(jnp.float32)
        if not self.is_flatten:
            return to_nchw(x)
        return jnp.mean(x, axis=(1, 2))


from .layers import clean_kwargs as _clean  # noqa: E402


@BACKBONES.register("swin_mini")
def swin_mini(**kwargs):
    # reference swin_mini: 4 stages, hidden 48, downscaling (3, 2, 2, 1)
    return SwinTransformer(embed_dim=48, depths=(2, 2, 2, 2),
                           num_heads=(3, 6, 12, 24),
                           downscaling_factors=(3, 2, 2, 1), **_clean(kwargs))


@BACKBONES.register("swin_t")
def swin_t(**kwargs):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24), **_clean(kwargs))


@BACKBONES.register("swin_s")
def swin_s(**kwargs):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 18, 2),
                           num_heads=(3, 6, 12, 24), **_clean(kwargs))


@BACKBONES.register("swin_b")
def swin_b(**kwargs):
    return SwinTransformer(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32), **_clean(kwargs))


@BACKBONES.register("swin_l")
def swin_l(**kwargs):
    return SwinTransformer(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), **_clean(kwargs))
