"""Device-resident segment bank (episode.IndexedEpisodeBatch): the indexed
eval path must reproduce the payload eval path exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from audio_fewshot_tpu.data.dataset import SpectrogramDataset
from audio_fewshot_tpu.data.loader import EpisodicLoader
from audio_fewshot_tpu.episode import (
    EpisodeBatch,
    IndexedEpisodeBatch,
    materialize_episode_batch,
)


def _dataset():
    return SpectrogramDataset.synthetic(
        num_classes=8, clips_per_class=12, segment_shape=(1, 8, 10),
        max_segments=4, seed=3,
    )


def _loader(ds, **kw):
    return EpisodicLoader(
        ds, way=4, shot=2, query=3, episodes_per_epoch=6, episode_size=2,
        mode="test", seed=11, segment_bucket_sizes=(32, 64), prefetch=0, **kw
    )


def test_indexed_batches_materialize_identically():
    ds = _dataset()
    plain = list(_loader(ds).epoch(0))
    indexed_loader = _loader(ds)
    indexed_loader.use_segment_bank()
    indexed = list(indexed_loader.epoch(0))
    bank = jnp.asarray(ds.segment_bank()[0])

    assert len(plain) == len(indexed) > 0
    for pb, ib in zip(plain, indexed):
        assert isinstance(pb, EpisodeBatch)
        assert isinstance(ib, IndexedEpisodeBatch)
        mb = materialize_episode_batch(ib, bank)
        np.testing.assert_array_equal(np.asarray(mb.support), pb.support)
        np.testing.assert_array_equal(np.asarray(mb.query), pb.query)
        np.testing.assert_array_equal(np.asarray(mb.query_clip), pb.query_clip)
        np.testing.assert_array_equal(np.asarray(mb.query_mask), pb.query_mask)
        np.testing.assert_array_equal(
            np.asarray(mb.support_target), pb.support_target
        )
        np.testing.assert_array_equal(
            np.asarray(mb.query_target), pb.query_target
        )
        np.testing.assert_array_equal(
            np.asarray(mb.global_target), pb.global_target
        )


def test_bank_wire_dtype_upcasts_on_materialize():
    import ml_dtypes

    ds = _dataset()
    host, starts = ds.segment_bank()
    bank = jnp.asarray(host.astype(ml_dtypes.bfloat16))
    loader = _loader(ds)
    loader.use_segment_bank()
    ib = next(iter(loader.epoch(0)))
    mb = materialize_episode_batch(ib, bank)
    assert mb.support.dtype == jnp.float32
    assert mb.query.dtype == jnp.float32
    # values agree at bf16 precision
    np.testing.assert_allclose(
        np.asarray(mb.support),
        np.asarray(jnp.take(jnp.asarray(host), ib.support_idx, axis=0)),
        rtol=1e-2, atol=1e-2,
    )


def test_end_to_end_eval_with_bank_matches_without(tmp_path):
    """Full Test harness: accuracy with the device bank == without."""
    from audio_fewshot_tpu.eval import Test

    cfg = {
        "data_root": "synthetic:8:10",
        "way_num": 4, "shot_num": 1, "query_num": 2,
        "test_way": 4, "test_shot": 1, "test_query": 2,
        "episode_size": 2, "test_episode": 6, "test_epoch": 1,
        "max_segments_per_clip": 3, "segment_bucket_sizes": [16, 32],
        "spec_shape": [1, 32, 40],
        "seed": 5, "prefetch": 0,
        "backbone": {"name": "Conv64F", "kwargs": {"num_channels": 1, "last_pool": False, "maxpool_last2": False}},
        "classifier": {"name": "ProtoNet", "kwargs": {}},
        "epoch": 1, "result_root": str(tmp_path),
    }
    accs = {}
    for knob in (False, True):
        c = dict(cfg)
        c["device_eval_bank"] = knob
        t = Test(0, c, result_path=None)
        if knob:
            assert t.test_bank is not None, "bank should be enabled"
        else:
            assert t.test_bank is None
        accs[knob] = t.test_loop()
    assert accs[True][0] == accs[False][0], accs


def test_train_indexed_batches_materialize_identically():
    """Train-mode index batches (random segment picks) must materialize
    bit-identically — the rng draw order is shared with the payload path."""
    ds = _dataset()

    def tr_loader(**kw):
        return EpisodicLoader(
            ds, way=4, shot=2, query=3, episodes_per_epoch=6, episode_size=2,
            mode="train", seed=11, prefetch=0, **kw
        )

    plain = list(tr_loader().epoch(0))
    indexed_loader = tr_loader()
    indexed_loader.use_segment_bank()
    indexed = list(indexed_loader.epoch(0))
    bank = jnp.asarray(ds.segment_bank()[0])

    assert len(plain) == len(indexed) > 0
    for pb, ib in zip(plain, indexed):
        assert isinstance(ib, IndexedEpisodeBatch)
        mb = materialize_episode_batch(ib, bank)
        np.testing.assert_array_equal(np.asarray(mb.support), pb.support)
        np.testing.assert_array_equal(np.asarray(mb.query), pb.query)
        np.testing.assert_array_equal(
            np.asarray(mb.global_target), pb.global_target
        )


def test_flat_indexed_batches_materialize_identically():
    from audio_fewshot_tpu.data.loader import FlatLoader
    from audio_fewshot_tpu.episode import (
        IndexedFlatBatch,
        materialize_flat_batch,
    )

    ds = _dataset()
    plain = list(FlatLoader(ds, batch_size=16, seed=4).epoch(0))
    il = FlatLoader(ds, batch_size=16, seed=4)
    il.use_segment_bank()
    indexed = list(il.epoch(0))
    bank = jnp.asarray(ds.segment_bank()[0])

    assert len(plain) == len(indexed) > 0
    for pb, ib in zip(plain, indexed):
        assert isinstance(ib, IndexedFlatBatch)
        mb = materialize_flat_batch(ib, bank)
        np.testing.assert_array_equal(np.asarray(mb.data), pb.data)
        np.testing.assert_array_equal(np.asarray(mb.target), pb.target)


def test_end_to_end_training_with_bank_matches_without(tmp_path):
    """Trainer: loss trajectory with the device bank == without (the
    augmentation/step rng streams are batch-content independent)."""
    from audio_fewshot_tpu.train import Trainer

    cfg = {
        "data_root": "synthetic:6:8",
        "way_num": 4, "shot_num": 1, "query_num": 2,
        "test_way": 4, "test_shot": 1, "test_query": 2,
        "episode_size": 2, "train_episode": 6, "test_episode": 4,
        "epoch": 1, "val_per_epoch": 1,
        "max_segments_per_clip": 3, "segment_bucket_sizes": [16, 32],
        "spec_shape": [1, 32, 40],
        "seed": 5, "prefetch": 0, "augment": True,
        "backbone": {"name": "Conv64F", "kwargs": {
            "num_channels": 1, "last_pool": False, "maxpool_last2": False}},
        "classifier": {"name": "ProtoNet", "kwargs": {}},
        "optimizer": {"name": "Adam", "kwargs": {"lr": 0.001}},
        "result_root": str(tmp_path),
        "compilation_cache": False,
    }
    results = {}
    for knob in (False, True):
        c = dict(cfg)
        c["device_data_bank"] = knob
        c["tag"] = f"bank_{knob}"
        t = Trainer(0, c)
        if knob:
            assert t.train_bank is not None
        else:
            assert t.train_bank is None
        results[knob] = t.train_loop()
    assert results[True] == results[False], results


def test_bank_cap_admits_small_splits_when_large_split_overflows():
    """A too-large train split must not disable the small val/test banks
    (code-review r2 finding): admission is per dataset, smallest first."""
    from audio_fewshot_tpu.data.bank import setup_segment_banks
    from audio_fewshot_tpu.parallel import get_mesh

    big = SpectrogramDataset.synthetic(
        num_classes=6, clips_per_class=20, segment_shape=(1, 8, 10),
        max_segments=4, seed=1,
    )
    small = SpectrogramDataset.synthetic(
        num_classes=3, clips_per_class=4, segment_shape=(1, 8, 10),
        max_segments=2, seed=2,
    )
    big_loader = EpisodicLoader(big, way=3, shot=1, query=2,
                                episodes_per_epoch=2, mode="train", prefetch=0)
    small_loader = EpisodicLoader(small, way=3, shot=1, query=2,
                                  episodes_per_epoch=2, mode="test", prefetch=0)
    mesh = get_mesh(1)
    # cap sized between the two banks
    cap_gb = (small.bank_nbytes(4) + 1) / 2 ** 30
    cfg = {"device_data_bank": "auto", "device_data_bank_max_gb": cap_gb}
    banks = setup_segment_banks(cfg, [big_loader, small_loader], mesh, None)
    assert banks[0] is None and banks[1] is not None
    assert not big_loader.emit_indices and small_loader.emit_indices


def test_bank_knob_alias_resolution():
    """Non-default values win under either knob name (old result dumps
    persist device_eval_bank)."""
    from audio_fewshot_tpu.data.bank import _resolve

    # old dump has the alias default; explicit new-name setting wins
    assert _resolve({"device_eval_bank": "auto", "device_data_bank": False},
                    "device_data_bank", "device_eval_bank", "auto") is False
    # explicit alias wins over new-name default
    assert _resolve({"device_eval_bank": False, "device_data_bank": "auto"},
                    "device_data_bank", "device_eval_bank", "auto") is False
    # both default
    assert _resolve({"device_eval_bank": "auto", "device_data_bank": "auto"},
                    "device_data_bank", "device_eval_bank", "auto") == "auto"
    assert _resolve({}, "device_data_bank", "device_eval_bank", "auto") == "auto"


def test_bank_payload_released_after_setup():
    from audio_fewshot_tpu.data.bank import setup_segment_banks
    from audio_fewshot_tpu.parallel import get_mesh

    ds = _dataset()
    loader = _loader(ds)
    banks = setup_segment_banks({"device_data_bank": True}, [loader],
                                get_mesh(1), None)
    assert banks[0] is not None
    assert getattr(ds, "_bank", None) is None  # host copy freed
    # loaders still function (starts map is payload-free)
    b = next(iter(loader.epoch(0)))
    assert isinstance(b, IndexedEpisodeBatch)


def test_bank_eval_sharded_over_8_devices_matches_single(tmp_path):
    """Bank-indexed eval on an 8-device mesh == 1-device (replicated bank,
    sharded index batches — the multi-chip serving path)."""
    from audio_fewshot_tpu.eval import Test

    cfg = {
        "data_root": "synthetic:8:10",
        "way_num": 4, "shot_num": 1, "query_num": 2,
        "test_way": 4, "test_shot": 1, "test_query": 2,
        "episode_size": 8, "test_episode": 16, "test_epoch": 1,
        "max_segments_per_clip": 3, "segment_bucket_sizes": [32, 64],
        "spec_shape": [1, 32, 40],
        "seed": 5, "prefetch": 0,
        "backbone": {"name": "Conv64F", "kwargs": {
            "num_channels": 1, "last_pool": False, "maxpool_last2": False}},
        "classifier": {"name": "ProtoNet", "kwargs": {}},
        "epoch": 1, "result_root": str(tmp_path),
        "device_data_bank": True,
    }
    accs = {}
    for n_dev in (1, 8):
        c = dict(cfg)
        c["n_devices"] = n_dev
        t = Test(0, c, result_path=None)
        assert t.test_bank is not None
        assert len(t.mesh.devices.ravel()) == n_dev
        accs[n_dev] = t.test_loop()
    assert accs[8][0] == accs[1][0], accs
