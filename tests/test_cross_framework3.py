"""Trained-weight cross-framework e2e parity — MTL + the sklearn-probe
finetuning family.

Extends tests/test_cross_framework{,2}.py (20 methods) with:

- MTL: frozen features + fixed-lr inner SGD on the meta-learned linear
  base learner (reference mtl.py:120-140);
- RFSModel / SKDModel / DeepBDC_Pretrain ('stl'): eval = sklearn
  ``LogisticRegression`` on L2-normalized frozen features
  (rfs_model.py:165-180, skd_model.py:197-211, deepbdc_pretrain.py:214-228)
  vs our converged optax-L-BFGS probe of the identical strictly-convex
  objective (heads/finetuning.py:47-88) — compared on ``predict_proba``
  vs softmax(probe logits).

Their reference ``set_forward``s carry the snapshot's stale 4-value unpack
of the 5-tuple ``split_by_episode``, so the runners drive the intact
adaptation pieces per episode (tools/cross_framework_parity.py).
"""

import numpy as np
import pytest

from test_cross_framework import _cross_check, _train_ours, cfp

BK_KWARGS = {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
             "num_channels": 1}
FEAT_DIM = 1600


def _softmax_np(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


@pytest.mark.slow
def test_e2e_mtl_trained_parity(tmp_path):
    """Trained MTL/Conv64F: the meta-learned linear base learner adapted
    by 3 deterministic full-support SGD steps (lr hard-coded 0.01 in the
    reference, mtl.py:127/137) on frozen features."""
    trainer, config = _train_ours(
        tmp_path, "MTL", "Conv64F", dict(BK_KWARGS),
        {"inner_param": {"iter": 3, "lr": 0.01}, "feat_dim": FEAT_DIM,
         "num_classes": 8},
        epochs=1, train_episode=6,
    )
    row = _cross_check(
        trainer, config, n_batches=10, atol=1e-3,
        head_inverter=cfp.invert_mtl_head_params,
        ref_runner=cfp.run_reference_eval_mtl,
    )
    assert row["episodes"] == 20


@pytest.mark.slow
def test_e2e_rfs_trained_parity(tmp_path):
    """Trained RFSModel/Conv64F (gen-0, no distill): global-CE pretrain
    here, eval via sklearn LR (C=1.0) vs our L-BFGS probe — two
    independent solvers of one strictly convex objective."""
    trainer, config = _train_ours(
        tmp_path, "RFSModel", "Conv64F", dict(BK_KWARGS),
        {"feat_dim": FEAT_DIM, "num_class": 8},
        epochs=2, train_episode=12, batch_size=32,
    )
    _cross_check(
        trainer, config, n_batches=10, atol=5e-3,
        head_inverter=cfp.invert_rfs_head_params,
        ref_runner=cfp.run_reference_eval_sklearn,
        ours_transform=_softmax_np,
        agree_min=0.98, tie_margin=1e-2,
    )


@pytest.mark.slow
def test_e2e_skd_trained_parity(tmp_path):
    """Trained SKDModel/Conv64F (gen-0 rotation self-supervision): same
    sklearn-probe eval contract as RFS (default C=1.0)."""
    trainer, config = _train_ours(
        tmp_path, "SKDModel", "Conv64F", dict(BK_KWARGS),
        {"feat_dim": FEAT_DIM, "num_class": 8},
        epochs=1, train_episode=8, batch_size=32,
    )
    _cross_check(
        trainer, config, n_batches=10, atol=5e-3,
        head_inverter=cfp.invert_skd_head_params,
        ref_runner=cfp.run_reference_eval_sklearn,
        ours_transform=_softmax_np,
        agree_min=0.98, tie_margin=1e-2,
    )


@pytest.mark.slow
def test_e2e_leo_zero_noise_parity(tmp_path, monkeypatch):
    """Trained LEO/Conv64F under ZERO-NOISE sampling: the documented
    parameterization delta (heads/leo.py:15-20 — our exp(½·logvar) scale vs
    the reference's raw-var scale, leo.py:29-33) lives entirely in the
    noise term, so pinning both samplers to the mean makes the FULL
    pipeline — encoder relation net → latent inner GD → decoder → weight
    fine-tune GD → bmm logits — deterministic and comparable.  The
    reference's LEO set_forward is intact (5-value unpack + majority
    vote, leo.py:147-184); episode_size 1 because its per-episode bmm
    loop feeds [1, n, d] against the full [E, d, way] weight batch."""
    import audio_fewshot_tpu.models.heads.leo as leo_mod
    from ref_loader import load_ref

    monkeypatch.setattr(
        leo_mod, "gaussian_sample",
        lambda rng, ml, dim: (ml[..., :dim], ml[..., :dim], ml[..., dim:]),
    )
    monkeypatch.setattr(
        load_ref("libfewshot_core.model.meta.leo"), "sample",
        lambda w, size: w[..., :size],
    )
    trainer, config = _train_ours(
        tmp_path, "LEO", "Conv64F", dict(BK_KWARGS),
        {"inner_para": {"iter": 3, "lr": 0.1, "finetune_iter": 3,
                        "finetune_lr": 0.01},
         "feat_dim": FEAT_DIM, "hid_dim": 16},
        epochs=1, train_episode=6, episode_size=1,
    )
    row = _cross_check(
        trainer, config, n_batches=10, atol=1e-3,
        head_inverter=cfp.invert_leo_head_params,
        ref_runner=cfp.run_reference_eval_inner_loop,
        ours_transform=_softmax_np,
    )
    assert row["episodes"] == 10


@pytest.mark.slow
def test_e2e_versa_zero_noise_parity(tmp_path, monkeypatch):
    """Trained VERSA/Conv64F under ZERO-NOISE sampling: with both
    samplers pinned to the mean, the logsumexp MC average collapses to
    the logits mean exactly in both frameworks (versa.py:60-92 /
    heads/versa.py:101-130), making the full amortized pipeline — h trunk
    → class-mean ψ predictors → logit moments — deterministic and
    comparable.  Dense episodes at episode_size 1 so the batch-stat h-BN
    sees identical row sets (see run_reference_eval_versa)."""
    import jax.numpy as jnp

    from audio_fewshot_tpu.models.heads.versa import VERSA

    monkeypatch.setattr(
        VERSA, "_sample_logits",
        lambda self, mean, logvar, rng: jnp.broadcast_to(
            mean[None], (self.sample_num,) + mean.shape
        ),
    )
    trainer, config = _train_ours(
        tmp_path, "VERSA", "Conv64F", dict(BK_KWARGS),
        {"feat_dim": FEAT_DIM, "sample_num": 5, "d_theta": 32,
         "drop_rate": 0.0},
        epochs=1, train_episode=8,
        episode_size=1, max_segments_per_clip=1,
    )
    row = _cross_check(
        trainer, config, n_batches=10, atol=1e-3,
        head_inverter=cfp.invert_versa_head_params,
        ref_runner=cfp.run_reference_eval_versa,
    )
    assert row["episodes"] == 10


@pytest.mark.slow
def test_e2e_metabaseline_pretrain_trained_parity(tmp_path):
    """Trained MetabaselinePretrain/Conv64F: cosine-prototype meta-val
    (metabaseline_pretrain.py:11-45) over the globally-CE-pretrained
    backbone — the stage-1 half of the two-stage pipeline's eval
    contract."""
    trainer, config = _train_ours(
        tmp_path, "MetabaselinePretrain", "Conv64F", dict(BK_KWARGS),
        {"feat_dim": FEAT_DIM, "num_class": 8},
        epochs=1, train_episode=8, batch_size=32,
    )
    _cross_check(
        trainer, config, n_batches=10, atol=1e-4,
        head_inverter=cfp.invert_rfs_head_params,
        ref_runner=cfp.run_reference_eval_pretrain_proto,
    )


@pytest.mark.slow
def test_e2e_feat_pretrain_trained_parity(tmp_path):
    """Trained FEAT_Pretrain/Conv64F: euclid-prototype meta-val via the
    shared metric ProtoLayer (feat_pretrain.py:36,61-67)."""
    trainer, config = _train_ours(
        tmp_path, "FEAT_Pretrain", "Conv64F", dict(BK_KWARGS),
        {"feat_dim": FEAT_DIM, "num_class": 8, "train_num_class": 8},
        epochs=1, train_episode=8, batch_size=32,
    )
    _cross_check(
        trainer, config, n_batches=10, atol=1e-4,
        head_inverter=cfp.invert_feat_pretrain_head_params,
        ref_runner=cfp.run_reference_eval_pretrain_proto,
    )


@pytest.mark.slow
def test_e2e_kendall_pretrain_trained_parity(tmp_path):
    """Trained MetabaselineKendallPretrain/Conv64F: exact Kendall rank
    correlation against class prototypes at meta-val
    (metabaselinekendall_pretrain.py:47-110)."""
    trainer, config = _train_ours(
        tmp_path, "MetabaselineKendallPretrain", "Conv64F", dict(BK_KWARGS),
        {"feat_dim": FEAT_DIM, "num_class": 8},
        epochs=1, train_episode=8, batch_size=32,
    )
    _cross_check(
        trainer, config, n_batches=10, atol=1e-3,
        head_inverter=cfp.invert_rfs_head_params,
        ref_runner=cfp.run_reference_eval_pretrain_proto,
    )


@pytest.mark.slow
def test_e2e_deepbdc_pretrain_stl_trained_parity(tmp_path):
    """Trained DeepBDC_Pretrain/resnet12Bdc with 'stl' eval: the
    penalty_C-parameterized sklearn probe (deepbdc_pretrain.py:214-228)
    over BDC features — the flagship pretraining stage's eval contract."""
    trainer, config = _train_ours(
        tmp_path, "DeepBDC_Pretrain", "resnet12Bdc",
        {"num_channels": 1, "drop_rate": 0.0, "reduce_dim": 16},
        {"num_class": 8, "val_type": "stl", "penalty_C": 2.0,
         "reduce_dim": 16, "dropout_rate": 0.0},
        epochs=1, train_episode=8, batch_size=32,
    )
    _cross_check(
        trainer, config, n_batches=10, atol=5e-3,
        head_inverter=cfp.invert_rfs_head_params,
        ref_runner=cfp.run_reference_eval_sklearn,
        ours_transform=_softmax_np,
        agree_min=0.98, tie_margin=1e-2,
    )
