"""End-to-end smoke: Trainer on tiny synthetic audio episodes learns above
chance, checkpoints land on disk, Test harness evaluates them (SURVEY §7.2
stage 3 vertical slice)."""

import os

import numpy as np
import pytest

import jax


def tiny_train_config(tmp_path, epochs=2):
    return {
        "data_root": "synthetic:8:10",
        "spec_shape": (1, 32, 24),
        "modality": "audio",
        "mean_std_file": None,
        "backbone": {
            "name": "Conv64F",
            "kwargs": {"is_flatten": False, "last_pool": False,
                       "maxpool_last2": False, "num_channels": 1},
        },
        "classifier": {"name": "ProtoNet", "kwargs": None},
        "optimizer": {"name": "Adam", "kwargs": {"lr": 3e-3}, "other": None},
        "lr_scheduler": {"name": "StepLR", "kwargs": {"gamma": 1.0, "step_size": 10}},
        "way_num": 3, "shot_num": 2, "query_num": 3,
        "test_way": 3, "test_shot": 2, "test_query": 3,
        "episode_size": 2, "train_episode": 16, "test_episode": 8,
        "epoch": epochs, "test_epoch": 1, "val_per_epoch": 1,
        "save_interval": 100, "save_part": ["emb_func"],
        "log_interval": 1000, "seed": 0, "precision": "fp32",
        "result_root": str(tmp_path), "prefetch": 0,
        "warmup": 0, "augment_times": 1,
        "max_segments_per_clip": 2,
    }


@pytest.mark.slow
def test_trainer_learns_and_checkpoints(tmp_path):
    from audio_fewshot_tpu.train import Trainer

    config = tiny_train_config(tmp_path, epochs=3)
    trainer = Trainer(0, config)
    best_val, best_test = trainer.train_loop(0)
    # synthetic classes are linearly separable — should be well above 33 %
    assert best_val > 50.0, best_val

    ckpt_dir = trainer.ckpt_dir
    assert os.path.isfile(os.path.join(ckpt_dir, "model_best.pth"))
    assert os.path.isfile(os.path.join(ckpt_dir, "model_last.pth"))
    assert os.path.isfile(os.path.join(ckpt_dir, "emb_func_best.pth"))
    assert os.path.isfile(os.path.join(trainer.result_dir, "config.yaml"))

    # -- Test harness consumes the result dir (reference run_test.py flow)
    from audio_fewshot_tpu.eval import Test

    config["test_epoch"] = 1
    test = Test(0, config, trainer.result_dir)
    mean, ci = test.test_loop()
    assert mean > 50.0, mean


@pytest.mark.slow
def test_trainer_resume(tmp_path):
    from audio_fewshot_tpu.train import Trainer

    config = tiny_train_config(tmp_path, epochs=1)
    t1 = Trainer(0, config)
    t1.train_loop(0)

    config2 = tiny_train_config(tmp_path, epochs=2)
    config2["resume"] = True
    t2 = Trainer(0, config2)
    assert t2.start_epoch == 1
    # optimizer moments resumed (adam step count carried over, not zero)
    import jax

    counts = [
        int(x) for x in jax.tree_util.tree_leaves(t2.opt_state)
        if getattr(x, "ndim", None) == 0 and x.dtype.kind == "i"
    ]
    assert any(c > 0 for c in counts), counts
    t2.train_loop(0)
