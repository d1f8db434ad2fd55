"""Energy-OOD TTA vote-pool semantics vs a reference-semantics oracle
(VERDICT round 1, item 6).

The reference substitutes every segment of a flagged clip with M augmented
copies, enlarges the batch, re-runs the model, and majority-votes over the
enlarged pool (test.py:107-122, 412-420) — coherent only for single-segment
flagged clips (its ``repeats[idxs] += M-1`` bookkeeping breaks otherwise).
The oracle here rebuilds that enlarged-batch protocol on 1-segment clips,
using the reference's own ``majority_vote``/``vote_catagorical_acc`` (torch)
for the final aggregation, and must agree exactly with ``_tta_eval_step``."""

from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import load_ref  # noqa: E402

from audio_fewshot_tpu.episode import make_dense_episode_batch  # noqa: E402
from audio_fewshot_tpu.eval import Test  # noqa: E402
from audio_fewshot_tpu.models import build_method, train_setting  # noqa: E402
from audio_fewshot_tpu.ops.audio_augmentations import (  # noqa: E402
    batch_augment_spectrogram,
)

WAY, SHOT, QUERY = 3, 1, 2
SPEC = (1, 16, 12)
M = 3  # augmentations per flagged segment
S_CAP = 2  # static per-clip segment cap (> 1 to exercise masking)


def _setup():
    cfg = {
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "modality": "audio", "precision": "fp32",
        "way_num": WAY, "shot_num": SHOT, "query_num": QUERY,
    }
    method = build_method(cfg)
    setting = train_setting(cfg)
    rng = np.random.default_rng(0)
    e = 2
    sup = rng.normal(size=(e, WAY * SHOT) + SPEC).astype(np.float32)
    qry = rng.normal(size=(e, WAY * QUERY) + SPEC).astype(np.float32)
    batch = make_dense_episode_batch(sup, qry, WAY, SHOT, QUERY)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    return method, setting, batch, variables


def test_tta_step_matches_reference_enlarged_batch_oracle():
    utils = load_ref("libfewshot_core.utils.utils")
    method, setting, batch, variables = _setup()

    stub = SimpleNamespace(
        method=method, num_augmentations=M, tta_segments_per_clip=S_CAP,
        tta_mean=0.0, tta_std=1.0,
    )
    step_rng = jax.random.PRNGKey(11)
    step_acc = np.asarray(
        Test._tta_eval_step(stub, variables, batch, None, step_rng, setting)
    )

    # ---- oracle: reference enlarged-batch protocol -------------------------
    sup_f, qry_f, _ = method.embed(variables, batch, train=False)
    seg_logits = np.asarray(method.feature_logits(sup_f, qry_f, setting))
    uncertains, _ = method.clip_uncertainty(jnp.asarray(seg_logits), batch)
    top_idx = np.asarray(method.ood_topk(uncertains))
    wq = batch.num_query_clips
    ep_idx = top_idx // wq
    clip_idx = top_idx % wq
    k = top_idx.shape[0]

    # identical augmented segments to the step (same rng, same flattening)
    is_clip = (np.asarray(batch.query_clip)[ep_idx] == clip_idx[:, None]) & (
        np.asarray(batch.query_mask)[ep_idx] > 0
    )
    order = np.asarray(jnp.argsort(~jnp.asarray(is_clip), axis=1, stable=True))[:, :S_CAP]
    seg_valid = np.take_along_axis(is_clip, order, axis=1)
    segments = np.asarray(batch.query)[ep_idx[:, None], order]
    aug = batch_augment_spectrogram(
        step_rng, jnp.asarray(segments.reshape((k * S_CAP,) + segments.shape[2:])),
        0.0, 1.0, num_augmentations=M, augmentation_type="noise_suppression",
    )
    aug_f = method.embed_segments(variables, aug).reshape(k, S_CAP * M, -1)
    aug_logits = np.asarray(
        method.feature_logits(jnp.asarray(np.asarray(sup_f)[ep_idx]), aug_f, setting)
    ).reshape(k, S_CAP, M, -1)

    flagged = {(int(e_), int(c_)): i for i, (e_, c_) in enumerate(zip(ep_idx, clip_idx))}
    targets = np.asarray(batch.query_target)
    clip_ids = np.asarray(batch.query_clip)
    mask = np.asarray(batch.query_mask)

    oracle_acc = []
    for e_ in range(batch.num_episodes):
        flat, repeats = [], []
        for c_ in range(wq):
            if (e_, c_) in flagged:
                i = flagged[(e_, c_)]
                # every valid segment replaced by its M augmented copies
                rows = aug_logits[i][seg_valid[i]].reshape(-1, WAY)
                flat.append(rows)
                repeats.append(rows.shape[0])
            else:
                rows = seg_logits[e_][(clip_ids[e_] == c_) & (mask[e_] > 0)]
                flat.append(rows)
                repeats.append(rows.shape[0])
        flat = torch.from_numpy(np.concatenate(flat, axis=0))
        with torch.no_grad():
            preds = utils.majority_vote(torch.softmax(flat, dim=1), repeats)
            acc = utils.vote_catagorical_acc(
                torch.from_numpy(targets[e_]).float(), preds
            )
        oracle_acc.append(float(acc))

    np.testing.assert_allclose(step_acc, oracle_acc, atol=1e-4)


def test_tta_flagged_votes_replace_not_add():
    """A flagged clip's final vote must come from the augmented pool alone —
    the original segment's vote is dropped (reference substitution)."""
    method, setting, batch, variables = _setup()
    from audio_fewshot_tpu.utils.aggregate import clip_vote_counts

    sup_f, qry_f, _ = method.embed(variables, batch, train=False)
    seg_logits = method.feature_logits(sup_f, qry_f, setting)
    uncertains, _ = method.clip_uncertainty(seg_logits, batch)
    top_idx = np.asarray(method.ood_topk(uncertains))
    wq = batch.num_query_clips

    stub = SimpleNamespace(
        method=method, num_augmentations=M, tta_segments_per_clip=S_CAP,
        tta_mean=0.0, tta_std=1.0,
    )
    # two different augmentation draws → flagged clips may flip, unflagged
    # clips (which keep their original votes) must contribute identically.
    a1 = np.asarray(Test._tta_eval_step(stub, variables, batch, None, jax.random.PRNGKey(1), setting))
    a2 = np.asarray(Test._tta_eval_step(stub, variables, batch, None, jax.random.PRNGKey(2), setting))
    # per-episode accuracy can differ by at most the flagged-clip fraction
    per_ep_flagged = np.bincount(top_idx // wq, minlength=batch.num_episodes)
    max_delta = per_ep_flagged / wq * 100.0
    assert np.all(np.abs(a1 - a2) <= max_delta + 1e-6)
