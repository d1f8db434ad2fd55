"""Regression tests for the third review pass (infrastructure findings)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_config_defaults_do_not_leak_between_instances():
    from audio_fewshot_tpu.config import DEFAULTS, Config

    a = Config(None, {"optimizer": {"kwargs": {"lr": 0.5}},
                      "lr_scheduler": {"kwargs": {"gamma": 0.33}}})
    assert a.get_config_dict()["optimizer"]["kwargs"]["lr"] == 0.5
    b = Config(None)
    assert b.get_config_dict()["optimizer"]["kwargs"]["lr"] == DEFAULTS["optimizer"]["kwargs"]["lr"] == 0.01 or \
        b.get_config_dict()["optimizer"]["kwargs"]["lr"] != 0.5
    # the module-level DEFAULTS must be untouched
    assert DEFAULTS["optimizer"]["kwargs"]["lr"] != 0.5


def test_eval_setting_inflates_shot_by_augment_times():
    from audio_fewshot_tpu.models import eval_setting, train_setting

    cfg = {"way_num": 5, "shot_num": 1, "query_num": 10,
           "test_way": 5, "test_shot": 1, "test_query": 10,
           "augment_times": 2}
    assert train_setting(cfg).shot == 2
    assert eval_setting(cfg).shot == 2  # reference test.py:641


def test_episode_batches_are_numpy():
    from audio_fewshot_tpu.episode import (
        make_dense_episode_batch, pack_ragged_episode_batch,
    )

    rng = np.random.default_rng(0)
    sup = rng.normal(size=(1, 4, 1, 8, 8)).astype(np.float32)
    qry = rng.normal(size=(1, 4, 1, 8, 8)).astype(np.float32)
    b = make_dense_episode_batch(sup, qry, 2, 2, 2)
    for leaf in jax.tree_util.tree_leaves(b):
        assert isinstance(leaf, np.ndarray), type(leaf)
    segs = rng.normal(size=(6, 1, 8, 8)).astype(np.float32)
    b = pack_ragged_episode_batch(sup, segs, [1, 2, 1, 2], 2, 2, 2)
    for leaf in jax.tree_util.tree_leaves(b):
        assert isinstance(leaf, np.ndarray), type(leaf)


def test_segment_clip_max_segments_cap():
    from audio_fewshot_tpu.data.dataset import segment_clip

    spec = np.random.default_rng(0).normal(size=(1, 8, 100)).astype(np.float32)
    assert segment_clip(spec, 10).shape[0] == 10
    capped = segment_clip(spec, 10, max_segments=3)
    assert capped.shape == (3, 1, 8, 10)
    np.testing.assert_array_equal(capped[0], spec[:, :, :10])


def test_plateau_min_lr_is_absolute():
    from audio_fewshot_tpu.optim import LRScheduler

    s = LRScheduler("ReduceLROnPlateau",
                    {"patience": 0, "factor": 0.1, "min_lr": 0.001,
                     "mode": "min"},
                    epochs=50, base_lr=0.01)
    for _ in range(10):
        s.step(1.0)  # permanent plateau
    # effective lr = base * scale must floor at min_lr=0.001 → scale 0.1
    assert s.scale(10) == pytest.approx(0.1)


def test_best_test_acc_is_at_best_val_epoch():
    """best_test must track the best-VAL epoch, not a running max."""
    from audio_fewshot_tpu.train import Trainer

    class Stub(Trainer):
        def __init__(self):  # bypass full init
            self.best_val_acc = -1.0
            self.best_test_acc = -1.0
            self.ckpt_dir = "/tmp/_stub_ckpt"
            self.config = {"save_interval": 10**9, "save_part": []}
            self.variables = {"params": {}}
            self.scheduler = type("S", (), {"state_dict": lambda self: {}})()
            self.opt_state = ()

    import os
    os.makedirs("/tmp/_stub_ckpt", exist_ok=True)
    t = Stub()
    t._checkpoint(0, val_acc=10.0, test_acc=60.0)
    t._checkpoint(1, val_acc=20.0, test_acc=50.0)
    assert t.best_test_acc == 50.0  # test at best-val epoch (reference)


def test_prefetch_worker_stops_on_abandoned_generator():
    import threading

    from audio_fewshot_tpu.data.dataset import SpectrogramDataset
    from audio_fewshot_tpu.data.loader import EpisodicLoader

    ds = SpectrogramDataset.synthetic(num_classes=4, clips_per_class=8,
                                      segment_shape=(1, 8, 8), seed=0)
    ld = EpisodicLoader(ds, way=3, shot=1, query=2, episodes_per_epoch=64,
                        episode_size=1, mode="train", prefetch=1)
    before = threading.active_count()
    gen = ld.epoch(0)
    next(gen)
    gen.close()  # abandon
    import time
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.05)
    assert threading.active_count() <= before + 1  # worker exited


def test_mel_slaney_consistency():
    from audio_fewshot_tpu.ops.mel import hz_to_mel, mel_to_hz

    f = np.array([100.0, 500.0, 1000.0, 4000.0, 10000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-6)
    # linear below 1kHz: mel(500) == 2.5 * mel(200)
    assert hz_to_mel(500.0) == pytest.approx(2.5 * hz_to_mel(200.0))


def test_ood_mask_matches_topk():
    from audio_fewshot_tpu.models import build_method

    method = build_method({
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "modality": "audio", "precision": "fp32",
    })
    u = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10)).astype(np.float32))
    mask = np.asarray(method.ood_mask(u))
    top = np.asarray(method.ood_topk(u))
    assert mask.sum() == len(top) == 4  # 20% of 20
    flat = mask.reshape(-1)
    assert set(np.nonzero(flat)[0]) == set(top.tolist())
