"""End-to-end checks over the KOS-layout on-disk fixture generator
(tools/make_kos_fixture.py) — the stand-in for the reference's unshipped
KOS audio data (reference config/headers/data.yaml:1 data_root).

Covers: on-disk contract (class dirs of variable-length [128, T] .npy
clips, object-array split file, (2,1,1) mean/std file), the ood data-root
substitution (data/loader.py:resolve_data_sources), ragged eval batches
with multi-segment clips, and the spurious-correlation structure (the
alpha=1 variant is separable by the hum cue; the alpha=0 twin differs
exactly in that cue).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from audio_fewshot_tpu.data.loader import build_dataset, get_dataloader
from audio_fewshot_tpu.models.base import ModelType

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kosfx"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_kos_fixture.py"),
         "--out", out, "--splits", "6,5,5", "--clips", "16", "--seed", "3"],
        check=True, capture_output=True,
    )
    return out


def _config(fixture_dir, **over):
    cfg = {
        "data_root": os.path.join(fixture_dir, "KOS_1_alpha_spec"),
        "mean_std_file": os.path.join(fixture_dir, "Fixture_Mean_Std.npy"),
        "class_per_split": os.path.join(fixture_dir, "KOS_fixture_splits.npy"),
        "way_num": 5, "shot_num": 2, "query_num": 3,
        "episode_size": 2, "train_episode": 4, "test_episode": 4,
        "max_segments_per_clip": 6, "seed": 0,
    }
    cfg.update(over)
    return cfg


def test_on_disk_contract(fixture_dir):
    splits = np.load(os.path.join(fixture_dir, "KOS_fixture_splits.npy"),
                     allow_pickle=True)
    assert [len(s) for s in splits] == [6, 5, 5]
    ms = np.load(os.path.join(fixture_dir, "Fixture_Mean_Std.npy"))
    assert ms.shape == (2, 1, 1) and ms[1] > 0
    cls = str(splits[0][0])
    cdir = os.path.join(fixture_dir, "KOS_1_alpha_spec", cls)
    lengths = set()
    for f in sorted(os.listdir(cdir)):
        spec = np.load(os.path.join(cdir, f))
        assert spec.ndim == 2 and spec.shape[0] == 128
        assert spec.dtype == np.float32
        lengths.add(spec.shape[1])
    assert len(lengths) > 1, "clip lengths should vary (repeats protocol)"


def test_ood_twin_differs_only_in_hum(fixture_dir):
    splits = np.load(os.path.join(fixture_dir, "KOS_fixture_splits.npy"),
                     allow_pickle=True)
    cls = str(splits[2][0])
    a1 = np.load(os.path.join(fixture_dir, "KOS_1_alpha_spec", cls, "clip_000.npy"))
    a0 = np.load(os.path.join(fixture_dir, "KOS_0_alpha_spec", cls, "clip_000.npy"))
    assert a1.shape == a0.shape
    diff_rows = np.where(np.abs(a1 - a0).max(axis=1) > 1e-4)[0]
    assert diff_rows.size > 0, "twin must move the hum band"
    # the differing rows are two narrow bands (old hum + new hum), not the
    # whole spectrogram — the true signal is shared
    assert diff_rows.size <= 16


def test_dataset_and_ood_resolution(fixture_dir):
    cfg = _config(fixture_dir)
    ds_iid = build_dataset(cfg, "test")
    cfg_ood = _config(fixture_dir, ood=True)
    ds_ood = build_dataset(cfg_ood, "test")
    assert ds_iid.num_classes == ds_ood.num_classes == 5
    # same clip inventory, different content (the hum moved)
    assert ds_iid.clips[0][0].shape == ds_ood.clips[0][0].shape
    assert not np.allclose(ds_iid.clips[0][0], ds_ood.clips[0][0])
    # train split is untouched by ood
    tr_iid = build_dataset(cfg, "train")
    tr_ood = build_dataset(cfg_ood, "train")
    assert np.allclose(tr_iid.clips[0][0], tr_ood.clips[0][0])


def test_eval_loader_ragged_batches(fixture_dir):
    cfg = _config(fixture_dir)
    loader = get_dataloader(cfg, "test", ModelType.METRIC)[0]
    batch = next(iter(loader.epoch(0)))
    e, g = batch.query.shape[:2]
    assert e == 2
    assert batch.query.shape[2:] == (1, 128, 157)
    # multi-segment clips present → more packed segments than clips
    n_clips = 5 * 3
    assert int(batch.query_mask.sum(axis=1).max()) > n_clips
    # normalization applied (train-split stats → roughly centered)
    assert abs(float(batch.support.mean())) < 1.5
