"""Finetuning-family tests: flat-batch training, per-episode head
adaptation, pretrainer meta-val."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.episode import FlatBatch, make_dense_episode_batch, segment_targets
from audio_fewshot_tpu.models import build_method
from audio_fewshot_tpu.models.base import EpisodeSetting, ModelType

SPEC = (1, 32, 24)
SETTING = EpisodeSetting(way=3, shot=3, query=3)
NUM_CLASS = 6


def build(classifier, **cls_kwargs):
    cls_kwargs.setdefault("num_class", NUM_CLASS)
    cls_kwargs.setdefault("inner_param", {
        "inner_train_iter": 5, "inner_batch_size": 4,
        "inner_optim": {"lr": 0.5, "momentum": 0.9, "weight_decay": 0.0},
    })
    return build_method({
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": classifier, "kwargs": cls_kwargs},
        "modality": "audio",
        "way_num": SETTING.way, "shot_num": SETTING.shot,
        "query_num": SETTING.query, "precision": "fp32",
    })


def flat_batch(seed=0, b=12):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(b,) + SPEC).astype(np.float32)
    target = rng.integers(0, NUM_CLASS, size=b).astype(np.int32)
    return FlatBatch(data=jnp.asarray(data), target=jnp.asarray(target))


def episode_batch(seed=0, e=2, separable=True):
    rng = np.random.default_rng(seed)
    way, shot, query = SETTING.way, SETTING.shot, SETTING.query
    means = rng.normal(0, 2.0, size=(way, 1, SPEC[1], 1)).astype(np.float32)
    sup = rng.normal(size=(e, way * shot) + SPEC).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + SPEC).astype(np.float32)
    if separable:
        for w in range(way):
            sup[:, w * shot:(w + 1) * shot] += means[w]
            qry[:, w * query:(w + 1) * query] += means[w]
    return make_dense_episode_batch(sup, qry, way, shot, query)


@pytest.mark.parametrize("classifier", [
    "Baseline", "BaselinePlus", "NegNet", "RFSModel", "SKDModel",
])
def test_finetuning_train_and_adapt(classifier):
    method = build(classifier)
    assert method.model_type == ModelType.FINETUNING
    fb = flat_batch()
    eb = episode_batch()
    variables = method.init_variables(jax.random.PRNGKey(0), eb, SETTING)
    loss, out = method.loss(variables, fb, SETTING, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert out.seg_logits.shape == (12, NUM_CLASS)

    seg_logits = method.forward(variables, eb, SETTING)
    assert seg_logits.shape == (2, 9, 3)
    # adaptation on separable data must classify queries well above chance
    acc = float(jnp.mean(
        (jnp.argmax(seg_logits, -1) == segment_targets(eb)).astype(jnp.float32)
    ))
    assert acc > 0.55, (classifier, acc)


@pytest.mark.parametrize("classifier", [
    "MetabaselinePretrain", "FEAT_Pretrain", "MTLPretrain", "DeepBDC_Pretrain",
])
def test_pretrainers(classifier):
    method = build(classifier)
    fb = flat_batch()
    eb = episode_batch()
    variables = method.init_variables(jax.random.PRNGKey(0), eb, SETTING)
    loss, _ = method.loss(variables, fb, SETTING, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    seg_logits = method.forward(variables, eb, SETTING)
    assert seg_logits.shape == (2, 9, 3)
    assert np.all(np.isfinite(np.asarray(seg_logits)))


def test_s2m2():
    method = build("S2M2")
    fb = flat_batch()
    eb = episode_batch()
    variables = method.init_variables(jax.random.PRNGKey(0), eb, SETTING)
    loss, out = method.loss(variables, fb, SETTING, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "rot_classifier" in variables["params"]
    seg_logits = method.forward(variables, eb, SETTING)
    assert seg_logits.shape == (2, 9, 3)


def test_trainer_routes_flat_batches(tmp_path):
    """FINETUNING model_type gets flat train batches + episodic val from
    get_dataloader, and the Trainer loop runs end-to-end."""
    from audio_fewshot_tpu.train import Trainer

    config = {
        "data_root": "synthetic:6:10",
        "spec_shape": (1, 32, 24),
        "modality": "audio",
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "Baseline", "kwargs": {
            "num_class": 6,
            "inner_param": {"inner_train_iter": 3, "inner_batch_size": 4,
                            "inner_optim": {"lr": 0.5, "momentum": 0.9}}}},
        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3}},
        "lr_scheduler": {"name": "ConstantLR", "kwargs": {}},
        "way_num": 3, "shot_num": 2, "query_num": 3,
        "test_way": 3, "test_shot": 2, "test_query": 3,
        "episode_size": 2, "batch_size": 12,
        "train_episode": 4, "test_episode": 4,
        "epoch": 1, "val_per_epoch": 1, "save_interval": 100,
        "log_interval": 1000, "seed": 0, "precision": "fp32",
        "result_root": str(tmp_path), "prefetch": 0,
        "max_segments_per_clip": 2,
    }
    trainer = Trainer(0, config)
    best_val, best_test = trainer.train_loop(0)
    assert best_val > 0.0
