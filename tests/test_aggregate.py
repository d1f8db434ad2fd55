"""Aggregation parity tests: dense one-hot-matmul majority vote / logit
averaging vs a straightforward ragged numpy implementation of the reference
semantics (reference utils/utils.py:436-470)."""

import jax.numpy as jnp
import numpy as np

from audio_fewshot_tpu.utils.aggregate import (
    average_logits,
    majority_vote,
    mean_confidence_interval,
    segment_accuracy,
    vote_categorical_acc,
)


def ragged_majority_vote(seg_logits, repeats):
    """Reference semantics: mode of per-segment argmaxes, smallest on ties."""
    preds = np.argmax(seg_logits, axis=-1)
    out, start = [], 0
    for n in repeats:
        chunk = preds[start : start + n]
        vals, counts = np.unique(chunk, return_counts=True)
        out.append(vals[np.argmax(counts)])  # unique is sorted → smallest tie
        start += n
    return np.array(out)


def ragged_average_logits(seg_logits, repeats):
    out, start = [], 0
    for n in repeats:
        if n == 0:
            out.append(np.zeros(seg_logits.shape[1]))
            continue
        out.append(seg_logits[start : start + n].mean(axis=0))
        start += n
    return np.stack(out)


def pack(seg_logits, repeats, g):
    """Ragged → padded (clip_id, mask) layout."""
    n_total, w = seg_logits.shape
    padded = np.zeros((g, w), dtype=np.float32)
    clip_id = np.zeros(g, dtype=np.int32)
    mask = np.zeros(g, dtype=np.float32)
    padded[:n_total] = seg_logits
    clip_id[:n_total] = np.repeat(np.arange(len(repeats)), repeats)
    mask[:n_total] = 1.0
    return padded, clip_id, mask


def test_majority_vote_matches_ragged_reference(rng):
    for _ in range(10):
        repeats = rng.integers(1, 6, size=15)
        n = int(repeats.sum())
        logits = rng.normal(size=(n, 5)).astype(np.float32)
        padded, clip_id, mask = pack(logits, repeats, n + 7)
        got = majority_vote(jnp.asarray(padded), jnp.asarray(clip_id), jnp.asarray(mask), 15)
        want = ragged_majority_vote(logits, repeats)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_majority_vote_tie_breaks_to_smallest_class():
    # two segments, different argmaxes -> tie -> smallest class wins (torch.mode parity)
    logits = np.array([[0.0, 10.0, 0.0], [0.0, 0.0, 10.0]], dtype=np.float32)
    got = majority_vote(jnp.asarray(logits), jnp.zeros(2, jnp.int32), jnp.ones(2), 1)
    assert int(got[0]) == 1


def test_average_logits_matches_ragged_reference(rng):
    repeats = rng.integers(0, 5, size=10)
    n = int(repeats.sum())
    logits = rng.normal(size=(n, 4)).astype(np.float32)
    padded, clip_id, mask = pack(logits, repeats, n + 3)
    got = average_logits(jnp.asarray(padded), jnp.asarray(clip_id), jnp.asarray(mask), 10)
    want = ragged_average_logits(logits, repeats)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_vote_acc_and_segment_acc():
    t = jnp.array([0, 1, 2, 3])
    p = jnp.array([0, 1, 0, 3])
    assert float(vote_categorical_acc(t, p)) == 75.0
    logits = jnp.eye(4)
    assert float(segment_accuracy(logits, t)) == 100.0
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    assert float(segment_accuracy(logits, jnp.array([0, 0, 9, 9]), mask)) == 50.0


def test_mean_confidence_interval():
    mean, h = mean_confidence_interval([70.0, 72.0, 74.0, 68.0, 71.0])
    assert abs(mean - 71.0) < 1e-9
    assert 1.5 < h < 4.0
