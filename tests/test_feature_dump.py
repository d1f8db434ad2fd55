"""featdata_*.npz dumps (utils/features.py) — the reference's
``visualize_features`` live artifact + intended t-SNE projection
(deepbdc.py:67-270; its call sites and projection body are commented
out as snapshotted — we implement the intended surface, opt-in via
``dump_features: true``)."""

import glob
import os

import jax
import numpy as np
import pytest

from audio_fewshot_tpu.episode import (
    make_dense_episode_batch,
    pack_ragged_episode_batch,
)
from audio_fewshot_tpu.models import build_method
from audio_fewshot_tpu.models.base import EpisodeSetting
from audio_fewshot_tpu.utils.features import dump_episode_features

SPEC = (1, 32, 24)
SETTING = EpisodeSetting(way=3, shot=2, query=3)


def _build_proto():
    config = {
        "backbone": {
            "name": "Conv64F",
            "kwargs": {
                "is_flatten": False, "last_pool": False,
                "maxpool_last2": False, "num_channels": 1,
            },
        },
        "classifier": {"name": "ProtoNet", "kwargs": None},
        "modality": "audio",
        "precision": "fp32",
    }
    return build_method(config)


def _dense_batch(e=2, seed=0):
    rng = np.random.default_rng(seed)
    way, shot, query = SETTING.way, SETTING.shot, SETTING.query
    sup = rng.normal(size=(e, way * shot) + SPEC).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + SPEC).astype(np.float32)
    return make_dense_episode_batch(sup, qry, way, shot, query)


def test_dense_dump_contract(tmp_path):
    method = _build_proto()
    batch = _dense_batch(e=2)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)
    paths = dump_episode_features(method, variables, batch, str(tmp_path))

    assert len(paths) == 2  # one file per episode
    way, shot, query = SETTING.way, SETTING.shot, SETTING.query
    n = way * (shot + query)

    sup_f, qry_f, _ = method.embed(variables, batch, train=False)
    sup_f = np.asarray(sup_f).reshape(2, way * shot, -1)
    qry_f = np.asarray(qry_f).reshape(2, way * query, -1)

    for ep, path in enumerate(paths):
        assert os.path.dirname(path).endswith("plots")
        data = np.load(path)
        feat = data["raw_features"]
        assert feat.shape == (n, sup_f.shape[-1])
        assert int(data["shot"]) == shot
        assert int(data["way"]) == way
        assert int(data["query"]) == query
        assert bool(data["normalize"]) is True
        assert str(data["method"]) == "tsne"
        # alternating per-class blocks: [shot supports, query queries]
        block = shot + query
        for c in range(way):
            rows = feat[c * block : (c + 1) * block]
            np.testing.assert_allclose(
                rows[:shot], sup_f[ep, c * shot : (c + 1) * shot], rtol=1e-6
            )
            np.testing.assert_allclose(
                rows[shot:], qry_f[ep, c * query : (c + 1) * query], rtol=1e-6
            )
        # intended projection, saved as coordinates (sklearn is available)
        assert data["features_2d"].shape == (n, 2)


def test_ragged_dump_takes_first_valid_segment(tmp_path):
    method = _build_proto()
    way, shot, query = SETTING.way, SETTING.shot, SETTING.query
    rng = np.random.default_rng(1)
    e, wq = 1, way * query
    repeats = rng.integers(1, 4, size=(e * wq,))
    sup = rng.normal(size=(e, way * shot) + SPEC).astype(np.float32)
    segs = rng.normal(size=(int(repeats.sum()),) + SPEC).astype(np.float32)
    batch = pack_ragged_episode_batch(sup, segs, repeats, way, shot, query)

    paths = dump_episode_features(method, variables := method.init_variables(
        jax.random.PRNGKey(0), batch, SETTING), batch, str(tmp_path))
    feat = np.load(paths[0])["raw_features"]
    assert feat.shape[0] == way * (shot + query)

    _, qry_f, _ = method.embed(variables, batch, train=False)
    qry_f = np.asarray(qry_f).reshape(batch.query.shape[1], -1)
    clip_ids = np.asarray(batch.query_clip[0])
    mask = np.asarray(batch.query_mask[0])
    block = shot + query
    for c in range(way):
        q_rows = feat[c * block + shot : (c + 1) * block]
        clips = np.nonzero(np.asarray(batch.query_target[0]) == c)[0]
        for row, clip in zip(q_rows, clips):
            first = np.nonzero((clip_ids == clip) & (mask > 0))[0][0]
            np.testing.assert_allclose(row, qry_f[first], rtol=1e-6)


def test_finetuning_method_dump(tmp_path):
    """The dump surface is method-agnostic (the reference pasted the same
    code into two heads; ours works for every family): FINETUNING methods
    embed episodic test batches the same way."""
    config = {
        "backbone": {
            "name": "Conv64F",
            "kwargs": {
                "is_flatten": False, "last_pool": False,
                "maxpool_last2": False, "num_channels": 1,
            },
        },
        "classifier": {"name": "Baseline", "kwargs": {
            "feat_dim": 64 * 32 * 24, "num_class": 8}},
        "modality": "audio",
        "precision": "fp32",
    }
    method = build_method(config)
    batch = _dense_batch(e=1)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)
    paths = dump_episode_features(method, variables, batch, str(tmp_path))
    assert len(paths) == 1
    feat = np.load(paths[0])["raw_features"]
    way, shot, query = SETTING.way, SETTING.shot, SETTING.query
    assert feat.shape[0] == way * (shot + query)
    assert np.isfinite(feat).all()


def test_cli_knob_writes_plots_dir(tmp_path):
    """dump_features through the Test harness itself (eval.py wiring)."""
    from audio_fewshot_tpu.eval import Test

    cfg = {
        "data_root": "synthetic:8:6",
        "way_num": 3, "shot_num": 2, "query_num": 3,
        "test_way": 3, "test_shot": 2, "test_query": 3,
        "episode_size": 2, "test_episode": 4, "test_epoch": 1,
        "epoch": 1, "seed": 0, "prefetch": 0,
        "max_segments_per_clip": 3, "segment_bucket_sizes": [16, 32],
        "spec_shape": [1, 32, 24],
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False,
            "maxpool_last2": False, "num_channels": 1}},
        "classifier": {"name": "ProtoNet", "kwargs": {}},
        "precision": "fp32",
        "dump_features": True,
        "result_root": str(tmp_path),
    }
    result_dir = str(tmp_path / "run")
    os.makedirs(os.path.join(result_dir, "checkpoints"), exist_ok=True)
    t = Test(0, cfg, result_dir)
    t.test_loop()
    dumps = glob.glob(os.path.join(result_dir, "plots", "featdata_*.npz"))
    assert dumps, "Test.test_loop wrote no featdata dumps"
