"""Trained-weight cross-framework end-to-end parity (VERDICT r2 item 1).

The literal "within 0.5 pts" target: train a model HERE, map the weights
into the torch reference with ``utils.torch_convert.invert_backbone_params``,
drive the reference's ``set_forward`` (proto_net.py:80-113,
deepbdc.py:272-319) over the SAME episodes, and compare clip accuracy and
per-segment logits.  The full-scale fixture protocol lives in
``tools/cross_framework_parity.py`` (this suite runs a reduced-geometry
version of the identical mechanism).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
import cross_framework_parity as cfp  # noqa: E402

from ref_loader import load_ref  # noqa: E402

from audio_fewshot_tpu.models.backbones import BACKBONES  # noqa: E402
from audio_fewshot_tpu.utils.torch_convert import (  # noqa: E402
    convert_backbone_state_dict,
    invert_backbone_params,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _randomize_bn(torch_mod):
    for m in torch_mod.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.6)


# -- inverse-converter round trips -------------------------------------------


@pytest.mark.parametrize("backbone,ref_mod,ref_name,kwargs,x_shape", [
    ("Conv64F", "libfewshot_core.model.backbone.conv_four", "Conv64F",
     {"num_channels": 1, "maxpool_last2": False, "last_pool": True,
      "is_flatten": False}, (2, 1, 32, 30)),
    ("resnet12Bdc", "libfewshot_core.model.backbone.resnet_bdc",
     "resnet12Bdc", {"num_channels": 1, "drop_rate": 0.0, "reduce_dim": 16},
     (2, 1, 32, 30)),
])
def test_inverse_converter_round_trip(rng, backbone, ref_mod, ref_name,
                                      kwargs, x_shape):
    """torch state → flax tree (forward converter) → torch state (inverse)
    must reproduce every converted tensor bit-exactly."""
    tm = getattr(load_ref(ref_mod), ref_name)(**kwargs).eval()
    _randomize_bn(tm)
    x = rng.normal(size=x_shape).astype(np.float32)

    fkwargs = {k: v for k, v in kwargs.items()}
    fm = BACKBONES.build(backbone, dtype=jnp.float32, **fkwargs)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = convert_backbone_state_dict(state, backbone, template)

    back = invert_backbone_params(converted, backbone, prefix="")
    for k, v in back.items():
        if k.endswith("num_batches_tracked"):
            continue
        assert k in state, f"inverse emitted unknown key {k}"
        np.testing.assert_array_equal(
            v, state[k], err_msg=f"round-trip drift at {k}"
        )
    # every converted parameter must come back (BN bookkeeping aside)
    missing = {
        k for k in state
        if not k.endswith("num_batches_tracked")
        and not k.startswith("logits.")  # unused unless is_flatten
        and not k.startswith("classifier.")  # reference-internal head
        and k not in back
    }
    assert not missing, f"inverse converter dropped {sorted(missing)[:5]}"


# -- episode-layout conversion ------------------------------------------------


def test_episode_batch_to_reference_layout():
    """The flat (image, target, repeats, support_size) conversion reproduces
    the reference's per-(episode, way) [support | query-segments] layout
    (abstract_model.py:231-292)."""
    from audio_fewshot_tpu.episode import pack_ragged_episode_batch

    way, shot, query = 2, 1, 2
    e = 2
    rng = np.random.default_rng(3)
    reps = rng.integers(1, 4, size=(e * way * query,))
    sup = np.arange(e * way * shot * 4, dtype=np.float32).reshape(
        e, way * shot, 1, 2, 2
    )
    segs = np.stack([
        np.full((1, 2, 2), i, np.float32) for i in range(int(reps.sum()))
    ])
    batch = pack_ragged_episode_batch(sup, segs, reps, way, shot, query)

    images, _, repeats, support_size = cfp.episode_batch_to_reference(
        batch, way, shot, query
    )
    assert support_size == e * way * shot
    np.testing.assert_array_equal(repeats, reps)
    assert images.shape[0] == e * way * shot + int(reps.sum())
    # walk the layout: per (episode, way): shot support rows then that way's
    # query segments in clip order
    reps_2d = reps.reshape(e, way * query)
    pos = 0
    seg_counter = 0
    for i in range(e):
        for w in range(way):
            np.testing.assert_array_equal(
                images[pos : pos + shot], sup[i, w * shot : (w + 1) * shot]
            )
            pos += shot
            n_w = int(reps_2d[i, w * query : (w + 1) * query].sum())
            np.testing.assert_array_equal(
                images[pos : pos + n_w].ravel(),
                np.repeat(
                    np.arange(seg_counter, seg_counter + n_w, dtype=np.float32), 4
                ),
            )
            pos += n_w
            seg_counter += n_w


# -- end-to-end trained parity ------------------------------------------------


def _train_ours(tmp_path, classifier, backbone, backbone_kwargs, cls_kwargs,
                way=3, shot=2, query=3, epochs=2, train_episode=12,
                **config_overrides):
    from audio_fewshot_tpu.train import Trainer

    config = {
        "data_root": "synthetic:8:10",
        "spec_shape": (1, 32, 30),
        "modality": "audio",
        "mean_std_file": None,
        "backbone": {"name": backbone, "kwargs": backbone_kwargs},
        "classifier": {"name": classifier, "kwargs": cls_kwargs},
        "optimizer": {"name": "Adam", "kwargs": {"lr": 3e-3}, "other": None},
        "lr_scheduler": {"name": "StepLR", "kwargs": {"gamma": 1.0, "step_size": 10}},
        "way_num": way, "shot_num": shot, "query_num": query,
        "test_way": way, "test_shot": shot, "test_query": query,
        "episode_size": 2, "train_episode": train_episode, "test_episode": 50,
        "epoch": epochs, "test_epoch": 1, "val_per_epoch": 10,
        "save_interval": 100, "save_part": ["emb_func"],
        "log_interval": 1000, "seed": 0, "precision": "fp32",
        "result_root": str(tmp_path), "prefetch": 0,
        "warmup": 0, "augment_times": 1,
        "max_segments_per_clip": 3,
        "device_data_bank": False,
        "n_devices": 1,
    }
    config.update(config_overrides)
    trainer = Trainer(0, config)
    trainer.train_loop(0)
    return trainer, config


def _cross_check(trainer, config, n_batches, atol,
                 head_inverter=None, ref_runner=None, ours_transform=None,
                 ref_patch=None, agree_min=0.999, tie_margin=0.0):
    from audio_fewshot_tpu.data import get_dataloader

    variables = jax.device_get(trainer.variables)
    loader = get_dataloader(
        dict(config, device_data_bank=False), "test",
        trainer.method.model_type, False, "audio",
    )[0]
    batches = [b for _, b in zip(range(n_batches), loader.epoch(1))]
    setting = trainer.eval_setting

    ours_logits, ours_accs = cfp.run_ours_eval(
        trainer.method, variables, batches, setting
    )
    if ours_transform is not None:
        ours_logits = [ours_transform(l) for l in ours_logits]

    state = invert_backbone_params(variables, config["backbone"]["name"])
    if head_inverter is not None:
        state.update(head_inverter(variables))
    model = cfp.build_reference_model(
        config["classifier"]["name"], config["backbone"]["name"],
        dict(config["backbone"]["kwargs"] or {}),
        setting.way, setting.shot, setting.query, state,
        cls_kwargs=dict(config["classifier"].get("kwargs") or {}),
    )
    if ref_patch is not None:
        ref_patch(model)
    ref_logits, ref_accs = (ref_runner or cfp.run_reference_eval)(
        model, batches, setting.way, setting.shot, setting.query
    )
    row = cfp.compare(
        ours_logits, ref_logits, ours_accs, ref_accs,
        config["classifier"]["name"],
    )
    assert row["rel_logit_diff"] <= atol, row
    if tie_margin:
        # sklearn-probe family: BOTH frameworks are approximate convex
        # solvers (the reference runs sklearn lbfgs at tol=1e-4,
        # deepbdc_pretrain.py:215-222) — near-tie queries may flip between
        # the two optima.  Require every flip to BE a near-tie in both
        # frameworks, and bound the accuracy gap by the flip mass.
        assert row["disagree_margin"] <= tie_margin, row
        # accuracy is CLIP-level (majority vote) while flips are counted
        # per segment: one tied segment can flip its whole clip's vote, so
        # the acc bound is the flip count in clip units
        n_clips = row["episodes"] * setting.way * setting.query
        assert row["acc_diff"] <= 0.5 + 100.0 * row["n_flips"] / n_clips, row
        assert row["segment_pred_agreement"] >= agree_min, row
    else:
        assert row["acc_diff"] <= 0.5, row
        assert row["segment_pred_agreement"] >= agree_min, row
    return row


@pytest.mark.slow
def test_e2e_protonet_trained_parity(tmp_path):
    """Trained ProtoNet/Conv64F: our eval vs the reference set_forward on
    identical ragged episodes — accuracy within 0.5 pts (it is ~0: the
    logits agree to float precision)."""
    # is_flatten engages the 1600-d logits projection head; the reference
    # hard-codes its input width to 64·⌊128/3⁴⌋·⌊157/3⁴⌋ = 64
    # (conv_four.py:87-92) — the (1,32,30) spec with maxpool_last2 off
    # reaches the same 64-wide flatten, so the heads align exactly
    trainer, config = _train_ours(
        tmp_path, "ProtoNet", "Conv64F",
        {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
         "num_channels": 1},
        None,
    )
    row = _cross_check(trainer, config, n_batches=25, atol=1e-4)
    assert row["episodes"] == 50


@pytest.mark.slow
def test_e2e_deepbdc_trained_parity(tmp_path):
    """Trained DeepBDC/resnet12Bdc (flagship): same protocol."""
    trainer, config = _train_ours(
        tmp_path, "DeepBDC", "resnet12Bdc",
        {"num_channels": 1, "drop_rate": 0.0, "reduce_dim": 16},
        None,
        epochs=1, train_episode=6,
    )
    _cross_check(trainer, config, n_batches=8, atol=1e-3)


@pytest.mark.slow
def test_e2e_dn4_trained_parity(tmp_path):
    """Trained DN4/Conv64F: local-descriptor top-k metric over feature
    maps, ragged episodes (reference dn4.py:84-120 — intact repeats
    path)."""
    trainer, config = _train_ours(
        tmp_path, "DN4", "Conv64F",
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        {"n_k": 2},
        epochs=1, train_episode=8,
    )
    _cross_check(trainer, config, n_batches=12, atol=1e-4)


@pytest.mark.slow
def test_e2e_metabaseline_trained_parity(tmp_path):
    """Trained MetaBaseline/Conv64F: cosine prototypes × the learned
    temperature scalar, which must also survive the inverse conversion
    (meta_baseline.py:54)."""
    trainer, config = _train_ours(
        tmp_path, "MetaBaseline", "Conv64F",
        {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
         "num_channels": 1},
        None,
        epochs=1, train_episode=8,
    )
    _cross_check(trainer, config, n_batches=12, atol=1e-4,
                 head_inverter=cfp.invert_metabaseline_head_params)


@pytest.mark.slow
def test_e2e_adm_trained_parity(tmp_path):
    """Trained ADM/Conv64F: covariance-KL + top-k cosine blended by the
    learned mixer (BN1d + bias-free Conv1d), inverse-converted.  way=5
    because the reference hardcodes the mixer conv's dilation to 5
    (adm.py:39)."""
    trainer, config = _train_ours(
        tmp_path, "ADM", "Conv64F",
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        {"n_k": 2},
        way=5, shot=1, query=2, epochs=1, train_episode=8,
    )
    _cross_check(trainer, config, n_batches=10, atol=1e-3,
                 head_inverter=cfp.invert_adm_head_params)


@pytest.mark.slow
def test_e2e_feat_trained_parity(tmp_path):
    """Trained FEAT/Conv64F (reference audio recipe 1.0/1.0/0.5): the
    set-to-set attention inverse-converted, the intended eval pipeline
    (class-mean prototypes → self-attention → temperature metric) driven
    per ragged episode — the reference's set_forward has the stale
    4-value unpack (feat.py:158-163)."""
    trainer, config = _train_ours(
        tmp_path, "FEAT", "Conv64F",
        {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
         "num_channels": 1},
        # hdim = the 1600-d Conv64F logits-head output (our SetAttention
        # derives its width from the features; the torch module needs it)
        {"hdim": 1600, "temperature": 1.0, "temperature2": 1.0,
         "balance": 0.5, "mode": "euclidean"},
        epochs=1, train_episode=8,
    )
    _cross_check(trainer, config, n_batches=10, atol=1e-3,
                 head_inverter=cfp.invert_feat_head_params,
                 ref_runner=cfp.run_reference_eval_feat)


@pytest.mark.slow
def test_e2e_kendall_trained_parity(tmp_path):
    """Trained MetaBaselineKendall/Conv64F: exact Kendall rank correlation
    vs prototypes — parameter-free head, intact ragged set_forward
    (meta_baseline_kendall.py:152-188).  episode_size 1 because the
    reference returns only the LAST episode's scores from its loop
    (``return k_score`` instead of ``output``)."""
    trainer, config = _train_ours(
        tmp_path, "MetaBaselineKendall", "Conv64F",
        {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
         "num_channels": 1},
        None,
        epochs=1, train_episode=8, episode_size=1,
    )
    _cross_check(trainer, config, n_batches=10, atol=1e-3)


@pytest.mark.slow
def test_e2e_relationnet_trained_parity(tmp_path):
    """Trained RelationNet/Conv64F: the conv+fc relation scorer
    inverse-converted.  [1,108,96] input → 12×10 maps so the torch scorer
    geometry (conv3→pool2→conv3→pool2 → 1×1) stays valid and the final
    flatten is order-invariant; episode_size 1 so the torch train-mode
    scorer BNs see the same pair batch as our masked batch-stat eval."""
    trainer, config = _train_ours(
        tmp_path, "RelationNet", "Conv64F",
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        {"feat_dim": 64, "feat_height": 1, "feat_width": 1},
        epochs=1, train_episode=6,
        episode_size=1, spec_shape=(1, 108, 96),
    )
    _cross_check(trainer, config, n_batches=8, atol=1e-3,
                 head_inverter=cfp.invert_relationnet_head_params,
                 ref_runner=cfp.run_reference_eval_relationnet)


@pytest.mark.slow
def test_e2e_atlnet_trained_parity(tmp_path):
    """Trained ATLNet/Conv64F: shared W transform + AEA adaptive-threshold
    attention, all learned pieces inverse-converted; the reference's
    ragged set_forward is intact (atl_net.py:193-205)."""
    trainer, config = _train_ours(
        tmp_path, "ATLNet", "Conv64F",
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        {"feat_dim": 64},
        epochs=1, train_episode=8,
    )
    _cross_check(trainer, config, n_batches=10, atol=1e-3,
                 head_inverter=cfp.invert_atlnet_head_params)


@pytest.mark.slow
def test_e2e_convmnet_trained_parity(tmp_path):
    """Trained ConvMNet/Conv64F: covariance-metric diag collapsed by the
    learned Conv1d scorer, inverse-converted (convm_net.py:40-50)."""
    trainer, config = _train_ours(
        tmp_path, "ConvMNet", "Conv64F",
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        {"n_local": 9},
        epochs=1, train_episode=8,
    )
    _cross_check(trainer, config, n_batches=10, atol=1e-3,
                 head_inverter=cfp.invert_convmnet_head_params,
                 ref_runner=cfp.run_reference_eval_convmnet)


@pytest.mark.slow
def test_e2e_adm_kl_trained_parity(tmp_path):
    """Trained ADM_KL/Conv64F: the parameter-free Gaussian-KL metric —
    intact ragged set_forward (adm_kl.py:183-200), generic runner."""
    trainer, config = _train_ours(
        tmp_path, "ADM_KL", "Conv64F",
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        {"n_k": 2, "CMS": False},
        epochs=1, train_episode=8,
    )
    _cross_check(trainer, config, n_batches=10, atol=1e-3)


@pytest.mark.slow
def test_e2e_mcl_trained_parity(tmp_path):
    """Trained MCL/Conv64F: Katz-centrality mutual matching over local
    descriptors — parameter-free head, intact reference set_forward with
    the full ragged repeats path (mcl.py:178-205)."""
    trainer, config = _train_ours(
        tmp_path, "MCL", "Conv64F",
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        {"katz_factor": 0.5, "gamma": 20.0, "gamma2": 10.0},
        epochs=1, train_episode=8,
    )
    # ours returns LOG Katz mass (heads/mcl.py:80 — the reference trains
    # NLLLoss on the log); its set_forward emits the raw mass — exp maps
    # our output onto the reference's
    _cross_check(trainer, config, n_batches=10, atol=1e-3,
                 ours_transform=np.exp)


@pytest.mark.slow
def test_e2e_frn_trained_parity(tmp_path):
    """Trained FRN/Conv64F: ridge feature reconstruction with the two
    learned scalars (scale, r) inverse-converted (frn.py:33-34)."""
    # episode_size 1: the reference's eval loop views each episode's
    # query tensor with the BATCH episode count (frn.py:144), so any
    # multi-episode batch crashes it
    trainer, config = _train_ours(
        tmp_path, "FRN", "Conv64F",
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        None,
        epochs=1, train_episode=8, episode_size=1,
    )
    def fix_resolution(model):
        # the reference hardcodes resolution=72 (frn.py:31 — its audio
        # Conv64F map is 8x9); this test's [1,32,30] input gives 3x3
        model.frn_layer.resolution = 9

    def log_softmax(l):
        # the reference FRNLayer returns log_softmax (frn.py:43-44, it
        # trains NLLLoss); ours returns the raw scaled neg-distance
        s = l - l.max(axis=-1, keepdims=True)
        return s - np.log(np.sum(np.exp(s), axis=-1, keepdims=True))

    _cross_check(trainer, config, n_batches=10, atol=1e-3,
                 head_inverter=cfp.invert_frn_head_params,
                 ref_patch=fix_resolution, ours_transform=log_softmax)


@pytest.mark.slow
def test_e2e_can_trained_parity(tmp_path):
    """Trained CAN/Conv64F: CAM cross-attention metric over ragged
    episodes, head weights (CAM convs+BN, global classifier) inverse-
    converted.  The reference's own set_forward is broken as snapshotted
    (stale 4-value unpack + dense-only one-hot reshape), so the runner
    drives the intended pipeline per episode — see
    run_reference_eval_can."""
    trainer, config = _train_ours(
        tmp_path, "CAN", "Conv64F",
        # [1,32,30] → feature map [64,3,3]: hw=9=HW², CAM mid=3
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        {"scale_cls": 7.0, "num_classes": 8, "nFeat": 64, "HW": 3},
        epochs=1, train_episode=8,
    )
    row = _cross_check(
        trainer, config, n_batches=12, atol=1e-3,
        head_inverter=cfp.invert_can_head_params,
        ref_runner=cfp.run_reference_eval_can,
    )
    assert row["episodes"] == 24  # 12 batches × episode_size 2


@pytest.mark.slow
def test_e2e_renet_trained_parity(tmp_path):
    """Trained RENet/Conv64F: the head-ful method — SCR/CCA/fc weights
    inverse-converted alongside the backbone, the reference set_forward
    (renet.py:378-404) driven per episode.  Dense episodes + episode_size
    1 because the reference's eval supports nothing else (no repeats path;
    CCALayer flattens the episode axis); the reference's scr/cca BNs run
    in train mode to match our batch-stat-only head BNs (see
    run_reference_eval_renet)."""
    trainer, config = _train_ours(
        tmp_path, "RENet", "Conv64F",
        # [1,32,30] → three 3×3/3 pools off → feature map [64,3,3]
        {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
         "num_channels": 1},
        # synthetic:8:10 → 8 train classes for the global fc
        {"feat_dim": 64, "num_class": 8},
        epochs=2, train_episode=12,
        episode_size=1, max_segments_per_clip=1,
    )
    row = _cross_check(
        trainer, config, n_batches=16, atol=1e-3,
        head_inverter=cfp.invert_renet_head_params,
        ref_runner=cfp.run_reference_eval_renet,
    )
    assert row["episodes"] == 16


@pytest.mark.slow
def test_e2e_dsn_trained_parity(tmp_path):
    """Trained DSN/Conv64F: adaptive-subspace metric — per-class SVD
    subspace + projection-residual distance.  The reference set_forward is
    broken as snapshotted (stale 4-value unpack, dsn.py:164-170, and the
    ragged query *list* fed to DSNLayer, dsn.py:173-177), so the intact
    DSNLayer (dsn.py:37-93) is driven per episode directly
    (run_reference_eval_dsn).  shot 3 → a 2-dim subspace exercises the
    SVD path in both frameworks (our fp32 jnp.linalg.svd vs the
    reference's float64-then-cast torch.linalg.svd)."""
    trainer, config = _train_ours(
        tmp_path, "DSN", "Conv64F",
        {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
         "num_channels": 1},
        None,
        shot=3, epochs=1, train_episode=8,
    )
    _cross_check(trainer, config, n_batches=10, atol=1e-3,
                 head_inverter=cfp.invert_dsn_head_params,
                 ref_runner=cfp.run_reference_eval_dsn)


def _softmax_np(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


@pytest.mark.slow
def test_e2e_r2d2_trained_parity(tmp_path):
    """Trained R2D2/Conv64F — the first META-family trained-weight e2e:
    closed-form ridge regression (dual form, r2d2.py:116-126) with the
    three learned scalars inverse-converted.  The reference set_forward's
    ragged repeats path is intact at episode_size 1 (r2d2.py:342-379; its
    per-episode loop hands the FULL support batch to the layer, so any
    multi-episode batch trips the layer's batch-size assert).  The
    reference softmaxes its returned logits (r2d2.py:374) — ours are
    mapped through the same softmax for comparison."""
    trainer, config = _train_ours(
        tmp_path, "R2D2", "Conv64F",
        {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
         "num_channels": 1},
        None,
        epochs=1, train_episode=8, episode_size=1,
    )
    row = _cross_check(trainer, config, n_batches=10, atol=1e-3,
                       head_inverter=cfp.invert_r2d2_head_params,
                       ours_transform=_softmax_np)
    assert row["episodes"] == 10
