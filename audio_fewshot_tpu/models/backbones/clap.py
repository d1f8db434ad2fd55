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
    return CLAPEmbeddingBackbone(
        **{k: v for k, v in kwargs.items() if v is not None}
    )


@BACKBONES.register("CLAPBackbone")
def clap_backbone(**kwargs):
    try:
        import laion_clap  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "CLAPBackbone needs the external `laion_clap` package (the "
            "reference has the same soft dependency, clap.py:31-63). Use "
            "CLAPEmbeddingBackbone with pre-extracted embeddings instead."
        ) from e
    raise NotImplementedError(
        "live CLAP waveform encoding is not wired for TPU; pre-extract "
        "embeddings and use CLAPEmbeddingBackbone"
    )
