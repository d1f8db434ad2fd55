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
from .layers import to_nhwc

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
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [B_, N=ws², C]
        b, nt, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
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
        out = out.transpose(0, 2, 1, 3).reshape(b, nt, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        # x: [N, H, W, C]
        n, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
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
            dtype=self.dtype, name="attn",
        )(win, mask)
        y = window_reverse(win, ws, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w]
        x = shortcut + y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class SwinTransformer(nn.Module):
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    is_flatten: bool = True
    num_channels: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = to_nhwc(x).astype(self.dtype)
        p = self.patch_size
        n, h, w, _ = x.shape
        x = x[:, : (h // p) * p, : (w // p) * p, :]
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        dim = self.embed_dim
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for b in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=heads, window_size=self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{s}_block{b}",
                )(x, train)
            if s < len(self.depths) - 1:
                # patch merging: 2×2 concat + linear to 2·dim
                n_, h_, w_, c_ = x.shape
                h2, w2 = (h_ // 2) * 2, (w_ // 2) * 2
                x = x[:, :h2, :w2]
                x = x.reshape(n_, h2 // 2, 2, w2 // 2, 2, c_)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n_, h2 // 2, w2 // 2, 4 * c_)
                x = nn.LayerNorm(dtype=self.dtype, name=f"merge_norm{s}")(x)
                x = nn.Dense(2 * dim, use_bias=False, dtype=self.dtype,
                             name=f"merge{s}")(x)
                dim *= 2

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x).astype(jnp.float32)
        x = jnp.mean(x, axis=(1, 2))
        return x


def _clean(kwargs):
    return {k: v for k, v in kwargs.items() if v is not None}


@BACKBONES.register("swin_mini")
def swin_mini(**kwargs):
    return SwinTransformer(embed_dim=48, depths=(2, 2, 2), num_heads=(3, 6, 12),
                           **_clean(kwargs))


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
