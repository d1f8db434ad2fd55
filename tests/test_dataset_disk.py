"""On-disk dataset contract: data_root/<class>/*.npy with the shipped split
and mean/std assets (SURVEY §0 data layout)."""

import os

import numpy as np
import pytest

from audio_fewshot_tpu.data.dataset import SpectrogramDataset, load_mean_std, load_splits
from audio_fewshot_tpu.data.loader import build_dataset, get_dataloader
from audio_fewshot_tpu.models.base import ModelType


@pytest.fixture
def disk_root(tmp_path, rng):
    classes = {"train_a": 0, "train_b": 1, "val_c": 2, "test_d": 3}
    for name in classes:
        cdir = tmp_path / "spec" / name
        cdir.mkdir(parents=True)
        for k in range(6):
            t = int(rng.integers(10, 40))
            np.save(cdir / f"clip{k}.npy",
                    rng.normal(size=(16, t)).astype(np.float32))
    # split + mean/std assets
    splits = np.empty(3, object)
    splits[0] = np.asarray(["train_a", "train_b"])
    splits[1] = np.asarray(["val_c"])
    splits[2] = np.asarray(["test_d"])
    np.save(tmp_path / "splits.npy", splits, allow_pickle=True)
    np.save(tmp_path / "ms.npy", np.asarray([1.5, 2.0], np.float32).reshape(2, 1, 1))
    return tmp_path


def test_from_directory_segments(disk_root):
    ds = SpectrogramDataset.from_directory(
        str(disk_root / "spec"), classes=["train_a", "train_b"],
        segment_frames=12,
    )
    assert ds.num_classes == 2
    assert ds.segment_shape == (1, 16, 12)
    segs = ds.clips[0][0]
    assert segs.ndim == 4 and segs.shape[1:] == (1, 16, 12)


def test_assets_load(disk_root):
    train, val, test = load_splits(str(disk_root / "splits.npy"))
    assert train == ["train_a", "train_b"] and test == ["test_d"]
    mean, std = load_mean_std(str(disk_root / "ms.npy"))
    assert (mean, std) == (1.5, 2.0)


def test_build_dataset_with_splits(disk_root):
    config = {
        "data_root": str(disk_root / "spec"),
        "class_per_split": str(disk_root / "splits.npy"),
        "mean_std_file": str(disk_root / "ms.npy"),
        "segment_frames": 12,
        "seed": 0,
    }
    train_ds = build_dataset(config, "train")
    assert train_ds.classes == ["train_a", "train_b"]
    assert train_ds.mean == 1.5
    val_ds = build_dataset(config, "val")
    assert val_ds.classes == ["val_c"]
    # global label offset: val classes come after the 2 train classes
    assert val_ds.class_offset == 2


def test_full_loader_on_disk(disk_root):
    config = {
        "data_root": str(disk_root / "spec"),
        "class_per_split": str(disk_root / "splits.npy"),
        "mean_std_file": str(disk_root / "ms.npy"),
        "segment_frames": 12,
        "way_num": 2, "shot_num": 2, "query_num": 2,
        "train_episode": 2, "episode_size": 1, "seed": 0, "prefetch": 0,
    }
    loaders = get_dataloader(config, "train", ModelType.METRIC)
    b = next(iter(loaders[0].epoch(0)))
    assert b.support.shape == (1, 4, 1, 16, 12)
    # normalization applied
    assert abs(float(np.asarray(b.support).mean())) < 2.0


def test_shipped_auxiliary_assets():
    """The regenerated Auxiliary assets parse and have the right geometry."""
    if not os.path.isfile("Auxiliary/KOS_paper_splits.npy"):
        pytest.skip("assets not generated")
    train, val, test = load_splits("Auxiliary/KOS_paper_splits.npy")
    assert (len(train), len(val), len(test)) == (25, 5, 8)
    mean, std = load_mean_std("Auxiliary/Clean_Mean_Std.npy")
    assert mean < 0 < std
