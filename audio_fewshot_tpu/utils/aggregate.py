"""Clip-level aggregation of per-segment logits, as dense XLA ops.

The reference aggregates variable-length clips with Python loops over a
``repeats`` vector: ``majority_vote`` (mode of per-segment argmaxes,
reference libfewshot_core/utils/utils.py:436-446), ``average_logits``
(per-clip mean logits, utils.py:449-470) and clip-level accuracy
``vote_catagorical_acc`` (utils.py:432-433).  Here the ragged structure is a
clip-id vector + mask, so aggregation is a one-hot contraction (einsum → MXU)
with no host round-trip.

Tie-breaking parity: ``torch.mode`` returns the smallest value among ties;
``jnp.argmax`` over vote counts returns the first (= smallest class) index —
identical semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def clip_scatter_matrix(clip_id: jnp.ndarray, mask: jnp.ndarray, num_clips: int) -> jnp.ndarray:
    """One-hot segment→clip scatter matrix ``[..., G, Wq]`` (masked)."""
    onehot = jax.nn.one_hot(clip_id, num_clips, dtype=jnp.float32)
    return onehot * mask[..., None]


def clip_vote_counts(
    seg_logits: jnp.ndarray,
    clip_id: jnp.ndarray,
    mask: jnp.ndarray,
    num_clips: int,
) -> jnp.ndarray:
    """Per-clip vote counts ``[..., Wq, W]``: each valid segment votes its
    argmax class."""
    way = seg_logits.shape[-1]
    seg_pred = jnp.argmax(seg_logits, axis=-1)
    pred_onehot = jax.nn.one_hot(seg_pred, way, dtype=jnp.float32)
    scatter = clip_scatter_matrix(clip_id, mask, num_clips)
    return jnp.einsum("...gc,...gw->...cw", scatter, pred_onehot)


def majority_vote(
    seg_logits: jnp.ndarray,
    clip_id: jnp.ndarray,
    mask: jnp.ndarray,
    num_clips: int,
) -> jnp.ndarray:
    """Per-clip prediction by mode of per-segment argmaxes.

    Args:
        seg_logits: ``[..., G, W]`` per-segment logits (softmax not needed —
          argmax is invariant; the reference softmaxes first, proto_net.py:115).
        clip_id / mask: ``[..., G]``.
    Returns: ``[..., Wq]`` int32 clip predictions.
    """
    votes = clip_vote_counts(seg_logits, clip_id, mask, num_clips)
    return jnp.argmax(votes, axis=-1).astype(jnp.int32)


def average_logits(
    seg_logits: jnp.ndarray,
    clip_id: jnp.ndarray,
    mask: jnp.ndarray,
    num_clips: int,
) -> jnp.ndarray:
    """Per-clip mean of segment logits ``[..., Wq, W]`` (zero for empty clips,
    matching reference utils.py:464-466)."""
    scatter = clip_scatter_matrix(clip_id, mask, num_clips)
    sums = jnp.einsum("...gc,...gw->...cw", scatter, seg_logits)
    counts = jnp.sum(scatter, axis=-2)[..., None]
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)


def vote_categorical_acc(targets: jnp.ndarray, predictions: jnp.ndarray) -> jnp.ndarray:
    """Clip-level accuracy in percent (reference utils.py:432-433)."""
    return jnp.mean((predictions == targets).astype(jnp.float32)) * 100.0


def segment_accuracy(seg_logits: jnp.ndarray, seg_target: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Top-1 per-segment accuracy in percent (reference ``accuracy``,
    utils.py:84-121; the DDP all-reduce there is implicit here — under pjit
    the mean over a sharded batch axis lowers to a cross-chip collective)."""
    correct = (jnp.argmax(seg_logits, axis=-1) == seg_target).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct) * 100.0
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(correct * mask) / denom * 100.0


def mean_confidence_interval(values, confidence: float = 0.95):
    """95 % t-interval over per-episode accuracies (reference
    utils.py:148-159).  Returns (mean, half-width)."""
    a = np.asarray(values, dtype=np.float64)
    n = a.size
    if n <= 1:
        return float(a.mean()) if n else 0.0, 0.0
    mean = a.mean()
    se = a.std(ddof=1) / np.sqrt(n)
    try:
        from scipy import stats  # scipy ships with the reference requirements

        h = se * stats.t.ppf((1 + confidence) / 2.0, n - 1)
    except ImportError:
        h = se * 1.959963984540054
    return float(mean), float(h)
