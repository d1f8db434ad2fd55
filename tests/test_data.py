"""Data-layer tests: segment chopping, episodic sampling invariants, and
EpisodeBatch packing (SURVEY §4: property tests for packing invariants —
repeats conservation, mask/label alignment)."""

import numpy as np
import pytest

from audio_fewshot_tpu.data.dataset import SpectrogramDataset, segment_clip
from audio_fewshot_tpu.data.loader import EpisodicLoader, FlatLoader, get_dataloader
from audio_fewshot_tpu.data.sampler import EpisodicSampler, FlatSampler
from audio_fewshot_tpu.models.base import ModelType


def test_segment_clip_exact_and_tail():
    spec = np.arange(2 * 8 * 10, dtype=np.float32).reshape(2, 8, 10)
    segs = segment_clip(spec, 5)
    assert segs.shape == (2, 2, 8, 5)
    np.testing.assert_array_equal(segs[0], spec[:, :, :5])
    np.testing.assert_array_equal(segs[1], spec[:, :, 5:])
    # non-divisible: tail window right-aligned, no frames lost
    segs = segment_clip(spec, 7)
    assert segs.shape == (2, 2, 8, 7)
    np.testing.assert_array_equal(segs[1], spec[:, :, 3:])
    # short clip loop-padded to one full window
    segs = segment_clip(spec[:, :, :3], 7)
    assert segs.shape == (1, 2, 8, 7)


def test_sampler_no_overlap_and_determinism():
    counts = [10] * 8
    s1 = EpisodicSampler(counts, way=3, shot=2, query=4, episodes_per_epoch=6,
                         episode_size=2, seed=7)
    s2 = EpisodicSampler(counts, way=3, shot=2, query=4, episodes_per_epoch=6,
                         episode_size=2, seed=7)
    b1 = list(s1.epoch(0))
    b2 = list(s2.epoch(0))
    assert len(b1) == 3 and len(b1[0]) == 2
    for batch1, batch2 in zip(b1, b2):
        for p1, p2 in zip(batch1, batch2):
            np.testing.assert_array_equal(p1.classes, p2.classes)
            np.testing.assert_array_equal(p1.support, p2.support)
            # support/query clip indices never overlap within a class
            for w in range(3):
                assert not set(p1.support[w]) & set(p1.query[w])
    # different epoch → different draw
    b0 = list(s1.epoch(1))
    assert any(
        not np.array_equal(x.classes, y.classes) for x, y in zip(b1[0], b0[0])
    )


def test_sampler_rejects_impossible():
    with pytest.raises(ValueError):
        EpisodicSampler([3, 3, 3], way=3, shot=2, query=4, episodes_per_epoch=1)


def _tiny_ds(mode="train", max_segments=1):
    return SpectrogramDataset.synthetic(
        num_classes=6, clips_per_class=8, segment_shape=(1, 16, 12),
        max_segments=max_segments, seed=3,
    )


def test_episodic_loader_train_shapes():
    ds = _tiny_ds()
    ld = EpisodicLoader(ds, way=3, shot=2, query=4, episodes_per_epoch=4,
                        episode_size=2, mode="train", prefetch=0)
    batches = list(ld.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b.support.shape == (2, 6, 1, 16, 12)
    assert b.query.shape == (2, 12, 1, 16, 12)
    assert b.query_mask.shape == (2, 12)
    assert float(np.asarray(b.query_mask).sum()) == 24.0
    assert b.global_target.shape == (2, 18)
    # local targets way-major
    np.testing.assert_array_equal(
        np.asarray(b.support_target[0]), [0, 0, 1, 1, 2, 2]
    )


def test_episodic_loader_eval_ragged():
    ds = _tiny_ds(max_segments=3)
    ld = EpisodicLoader(ds, way=3, shot=1, query=2, episodes_per_epoch=2,
                        episode_size=1, mode="eval", prefetch=0)
    b = next(iter(ld.epoch(0)))
    mask = np.asarray(b.query_mask)
    clip = np.asarray(b.query_clip)
    # total segments == sum of per-clip repeats, each clip id in range
    n_valid = int(mask.sum())
    assert n_valid >= 6  # ≥ 1 segment per query clip
    assert clip[mask > 0].max() < 6
    # every query clip has at least one segment
    assert set(clip[0][mask[0] > 0].tolist()) == set(range(6))
    # padded entries are masked zeros
    assert np.all(np.asarray(b.query)[mask == 0] == 0)


def test_episodic_loader_eval_augment_times_fills_support():
    """Regression: the eval branch must write augment_times copies per
    support clip — previously it left uninitialized np.empty rows and
    misaligned rows against the way-major support_target."""
    ds = _tiny_ds(max_segments=2)
    ld = EpisodicLoader(ds, way=3, shot=2, query=2, episodes_per_epoch=2,
                        episode_size=1, mode="eval", prefetch=0,
                        augment_times=2)
    b = next(iter(ld.epoch(0)))
    sup = np.asarray(b.support)
    assert sup.shape[1] == 3 * 2 * 2  # way * shot * augment_times
    # no uninitialized garbage: all rows bounded by the dataset's value range
    assert np.isfinite(sup).all()
    assert np.abs(sup).max() < 1e3
    # consecutive augment copies are identical segments of the same clip
    np.testing.assert_array_equal(sup[:, 0::2], sup[:, 1::2])
    # global labels aligned way-major with the inflated shot axis
    gsup = np.asarray(b.global_target)[:, : 3 * 4]
    np.testing.assert_array_equal(gsup[:, 0::2], gsup[:, 1::2])
    np.testing.assert_array_equal(
        np.asarray(b.support_target[0]), np.repeat([0, 1, 2], 4)
    )


def test_flat_loader():
    ds = _tiny_ds()
    ld = FlatLoader(ds, batch_size=16, seed=0)
    batches = list(ld.epoch(0))
    assert len(batches) == 48 // 16
    assert batches[0].data.shape == (16, 1, 16, 12)
    assert batches[0].target.shape == (16,)
    assert batches[0].target.max() < 6


def test_get_dataloader_surface():
    config = {
        "data_root": "synthetic:6:8",
        "spec_shape": (1, 16, 12),
        "way_num": 3, "shot_num": 1, "query_num": 2,
        "test_way": 3, "test_shot": 1, "test_query": 2,
        "train_episode": 4, "test_episode": 2, "episode_size": 1,
        "seed": 0, "prefetch": 0,
    }
    loaders = get_dataloader(config, "train", ModelType.METRIC)
    assert len(loaders) == 1
    b = next(iter(loaders[0].epoch(0)))
    assert b.support.shape[1] == 3
    test_loaders = get_dataloader(config, "test", ModelType.METRIC)
    bt = next(iter(test_loaders[0].epoch(0)))
    assert bt.query_mask.shape == bt.query_clip.shape
    # finetuning train mode → flat loader
    config["batch_size"] = 8
    flat = get_dataloader(config, "train", ModelType.FINETUNING)
    fb = next(iter(flat[0].epoch(0)))
    assert fb.data.shape[0] == 8


def test_prefetch_matches_sync():
    ds = _tiny_ds()
    kw = dict(way=3, shot=2, query=4, episodes_per_epoch=4, episode_size=1,
              mode="train")
    a = EpisodicLoader(ds, prefetch=0, **kw)
    b = EpisodicLoader(ds, prefetch=2, **kw)
    for x, y in zip(a.epoch(0), b.epoch(0)):
        np.testing.assert_array_equal(np.asarray(x.support), np.asarray(y.support))
        np.testing.assert_array_equal(np.asarray(x.query), np.asarray(y.query))
