"""MeTAL faithful per-step LossAdapters — NON-ZERO-weight parity.

``inner_param.per_step_adapters: true`` selects the reference's exact
architecture (per-step loss-net parameter copies + per-step LossAdapters,
reference metal.py:239-391) instead of the default step-conditioned
re-design.  The zero-knockout e2e (test_cross_framework4.py) compares
only the shared MAML machinery; these tests drive the distinctive
surface — learned losses AND live (non-identity) adapters — at trained,
converted weights in both frameworks.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "repo", "tools")
)

from test_cross_framework import _softmax_np, _train_ours, cfp  # noqa: E402

INNER = {"lr": 0.01, "train_iter": 2, "test_iter": 3,
         "per_step_adapters": True}
BK_KWARGS = {"patch_size": 4, "embed_dim": 64, "depth": 2,
             "num_heads": 4, "num_channels": 1, "return_tokens": False}


def test_per_step_path_differs_from_default():
    """The faithful path must not silently collapse onto the re-design:
    same seed, same episode — different inner objectives → different
    adapted logits (and the per-step param tree carries the adapters)."""
    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.models import build_method, train_setting

    rng = np.random.default_rng(0)
    spec = (1, 24, 30)
    sup = rng.normal(size=(2, 6) + spec).astype(np.float32)
    qry = rng.normal(size=(2, 6) + spec).astype(np.float32)
    batch = make_dense_episode_batch(sup, qry, 3, 2, 2)

    outs = {}
    for psa in (False, True):
        config = {
            "backbone": {"name": "Conv64F",
                         "kwargs": {"is_flatten": True, "last_pool": False,
                                    "maxpool_last2": False,
                                    "num_channels": 1}},
            "classifier": {"name": "MeTAL", "kwargs": {
                "inner_param": dict(INNER, per_step_adapters=psa),
                "way_num": 3}},
            "modality": "audio", "way_num": 3, "shot_num": 2,
            "query_num": 2, "augment_times": 1,
        }
        m = build_method(config)
        s = train_setting(config)
        v = m.init_variables(jax.random.PRNGKey(0), batch, s)
        outs[psa] = np.asarray(m.forward(v, batch, s))
    assert not np.allclose(outs[False], outs[True], atol=1e-5)


def test_e2e_metal_per_step_adapters_nonzero_parity(tmp_path):
    """Trained faithful-path MeTAL vs the torch reference at NON-ZERO
    weights: per-step loss nets live, per-step adapters made non-identity
    by perturbing the multiplier/offset gate biases on OUR side before
    conversion — the reference replays the identical modulated inner
    objective (metal.py:140-192) through its own module tree.  ViT
    backbone: deterministic and mode-independent, so the reference's
    transductive ``.train()`` embeds equal ours."""
    import torch  # noqa: F401  (ref harness import check)

    from audio_fewshot_tpu.data import get_dataloader
    from audio_fewshot_tpu.utils.torch_convert import invert_backbone_params

    trainer, config = _train_ours(
        tmp_path, "MeTAL", "VisionTransformer", dict(BK_KWARGS),
        {"feat_dim": 64, "inner_param": dict(INNER)},
        spec_shape=(1, 24, 24),
        epochs=1, train_episode=6, max_segments_per_clip=1,
    )
    variables = jax.device_get(trainer.variables)

    # force the adapters off identity: the gates are zero-init and one
    # tiny epoch barely moves them — a dead adapter would make this test
    # no stronger than the zero-knockout one
    prng = np.random.default_rng(7)
    for ad in ("meta_loss_adapter", "meta_query_loss_adapter"):
        sub = variables["params"][ad]
        for gate in ("multiplier_bias", "offset_bias"):
            sub[gate] = (
                np.asarray(sub[gate])
                + prng.normal(0.0, 0.5, np.asarray(sub[gate]).shape)
            ).astype(np.float32)
        assert float(np.abs(sub["multiplier_bias"]).max()) > 0.05

    setting = trainer.eval_setting
    state = invert_backbone_params(variables, "VisionTransformer")
    state.update(cfp.invert_maml_head_params(variables))
    state.update(cfp.invert_metal_per_step_params(variables))
    model = cfp.build_reference_model(
        "MeTAL", "VisionTransformer", dict(BK_KWARGS), setting.way,
        setting.shot, setting.query, state,
        cls_kwargs={"feat_dim": 64, "inner_param": dict(INNER)},
    )

    loader = get_dataloader(
        dict(config, device_data_bank=False), "test",
        trainer.method.model_type, False, "audio",
    )[0]
    batches = [b for _, b in zip(range(6), loader.epoch(1))]
    ours_logits, ours_accs = cfp.run_ours_eval(
        trainer.method, variables, batches, setting
    )
    ours_logits = [_softmax_np(l) for l in ours_logits]
    ref_logits, ref_accs = cfp.run_reference_eval_inner_loop(
        model, batches, setting.way, setting.shot, setting.query
    )
    row = cfp.compare(ours_logits, ref_logits, ours_accs, ref_accs,
                      "MeTAL-per-step")
    assert row["rel_logit_diff"] <= 2e-3, row
    assert row["acc_diff"] <= 0.5, row
    assert row["segment_pred_agreement"] >= 0.99, row
