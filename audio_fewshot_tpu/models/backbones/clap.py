"""CLAP backbones.

Reference: libfewshot_core/model/backbone/clap.py — a LAION-CLAP wrapper
with a lazy import workaround (:31-63), waveform-path embedding extraction
(:255-336, called from the trainer when ``is_clap``), and an identity
pass-through for PRE-EXTRACTED 512-d embeddings (:351-386).

Here: ``CLAPEmbeddingBackbone`` is the fully-supported path — datasets of
pre-extracted CLAP embeddings flow through unchanged (optionally with a
projection head).  ``CLAPBackbone`` (the live waveform encoder) requires the
external ``laion_clap`` package, which is not part of this environment; it
raises a clear error at construction unless available (the reference has the
same soft dependency).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES


class CLAPEmbeddingBackbone(nn.Module):
    """Identity (or projected) pass-through for pre-extracted CLAP
    embeddings [N, 512] (reference clap.py:351-386)."""

    embed_dim: int = 512
    project_dim: int = 0  # 0 = identity

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        if self.project_dim:
            x = nn.Dense(self.project_dim, name="proj")(x)
        return x


@BACKBONES.register("CLAPEmbeddingBackbone")
def clap_embedding_backbone(**kwargs):
    kwargs.pop("num_channels", None)
    kwargs.pop("dtype", None)  # embeddings pass through in fp32
    return CLAPEmbeddingBackbone(
        **{k: v for k, v in kwargs.items() if v is not None}
    )


@BACKBONES.register("CLAPBackbone")
def clap_backbone(**kwargs):
    """The live waveform encoder (reference clap.py:66-336), TPU-native.

    Returns a flax ``CLAPAudioEncoder`` (HTSAT-tiny + CLAP projection —
    see clap_encoder.py for the full waveform→512-d contract).  Pretrained
    CLAP weights are NOT bundled (the reference downloads them through
    ``laion_clap``; this environment has no network), so construction
    requires an explicit opt-in:

    - ``checkpoint_path``: a converted flat-npz param file (see
      tools/convert_clap_checkpoint.py) — loaded through the trainer's
      ``pretrain_path``/part mechanism or tools/extract_clap_embeddings.py;
    - or ``allow_random_init: true`` for from-scratch training / tests.

    Anything else raises, so nobody silently trains "CLAP" from noise.
    """
    from .clap_encoder import CLAPAudioEncoder

    kwargs.pop("num_channels", None)
    kwargs.pop("dtype", None)  # encoder manages its own precision
    kwargs.pop("enable_fusion", None)  # reference kwarg; fusion variant not built
    checkpoint_path = kwargs.pop("checkpoint_path", None)
    allow_random = bool(kwargs.pop("allow_random_init", False))
    if not checkpoint_path and not allow_random:
        raise ValueError(
            "CLAPBackbone has no bundled pretrained weights: pass "
            "backbone.kwargs.checkpoint_path (a converted flat-npz from "
            "tools/convert_clap_checkpoint.py, loaded via pretrain_path) or "
            "set allow_random_init: true; for pre-extracted embeddings use "
            "CLAPEmbeddingBackbone (reference clap.py:351-386)."
        )
    return CLAPAudioEncoder(
        **{k: v for k, v in kwargs.items() if v is not None}
    )
