"""Regression tests for the round-1 code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_config_rejects_indivisible_episode_size():
    from audio_fewshot_tpu.config import Config

    with pytest.raises(ValueError):
        Config(None, {"n_gpu": 8, "episode_size": 4})
    # divisible is fine
    Config(None, {"n_gpu": 4, "episode_size": 8})


def test_prefetch_propagates_worker_errors():
    from audio_fewshot_tpu.data.dataset import SpectrogramDataset
    from audio_fewshot_tpu.data.loader import EpisodicLoader

    ds = SpectrogramDataset.synthetic(num_classes=4, clips_per_class=6,
                                      segment_shape=(1, 8, 8), seed=0)
    ld = EpisodicLoader(ds, way=3, shot=1, query=2, episodes_per_epoch=4,
                        episode_size=1, mode="train", prefetch=2)
    ld._build_batch = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    with pytest.raises(RuntimeError, match="boom"):
        list(ld.epoch(0))


def test_weight_decay_skips_frozen_params():
    from audio_fewshot_tpu.optim import build_optimizer

    opt = build_optimizer({"optimizer": {"name": "SGD", "kwargs": {
        "lr": 0.1, "weight_decay": 0.1}}})
    params = {"m": {"frozen": jnp.ones((3,)), "live": jnp.ones((3,))}}
    grads = {"m": {"frozen": jnp.zeros((3,)), "live": jnp.ones((3,))}}
    state = opt.init(params)
    new, _ = opt.apply(grads, state, params, opt.lr_tree(params))
    # frozen (zero-grad) leaf untouched; live leaf moved by grad + wd
    np.testing.assert_array_equal(np.asarray(new["m"]["frozen"]), 1.0)
    np.testing.assert_allclose(np.asarray(new["m"]["live"]), 1.0 - 0.1 * 1.1)


def test_swin_shifted_window_padding():
    """Non-window-divisible input through a shifted block must run and the
    output must be finite (the pad/roll order regression)."""
    import audio_fewshot_tpu.models  # noqa: F401
    from audio_fewshot_tpu.registry import BACKBONES

    net = BACKBONES.build("swin_mini", window_size=7, num_channels=1,
                          dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 60, 68)),
                    jnp.float32)
    v = net.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, x, train=False)
    out = net.apply(v, x, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_uncertainty_npz_has_exactly_two_keys(tmp_path):
    from audio_fewshot_tpu.data.dataset import SpectrogramDataset
    from audio_fewshot_tpu.data.loader import EpisodicLoader
    from audio_fewshot_tpu.models import build_method
    from audio_fewshot_tpu.models.base import EpisodeSetting
    from audio_fewshot_tpu.parallel import get_mesh

    method = build_method({
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "modality": "audio", "precision": "fp32",
    })
    setting = EpisodeSetting(way=3, shot=2, query=3)
    ds = SpectrogramDataset.synthetic(num_classes=5, clips_per_class=8,
                                      segment_shape=(1, 32, 24), seed=0)
    loader = EpisodicLoader(ds, way=3, shot=2, query=3, episodes_per_epoch=2,
                            episode_size=2, mode="eval", prefetch=0)
    batch = next(iter(loader.epoch(0)))
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    dump = str(tmp_path / "uncertainty_data.npz")
    method.calibrate_threshold(variables, loader, setting, get_mesh(1),
                               dump_path=dump)
    with np.load(dump, allow_pickle=True) as z:
        assert sorted(z.files) == ["is_corrects", "uncertains"]


def test_boil_nil_mode():
    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.models import build_method
    from audio_fewshot_tpu.models.base import EpisodeSetting

    setting = EpisodeSetting(way=3, shot=2, query=2)
    method = build_method({
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1, "use_running_statistics": False}},
        "classifier": {"name": "BOIL", "kwargs": {
            "inner_param": {"lr": 0.01, "extractor_lr": 0.01,
                            "classifier_lr": 0.0, "train_iter": 1,
                            "test_iter": 1, "test_mode": "NIL"}}},
        "modality": "audio", "way_num": 3, "shot_num": 2, "query_num": 2,
        "precision": "fp32",
    })
    rng = np.random.default_rng(0)
    sup = rng.normal(size=(1, 6, 1, 32, 24)).astype(np.float32)
    qry = rng.normal(size=(1, 6, 1, 32, 24)).astype(np.float32)
    batch = make_dense_episode_batch(sup, qry, 3, 2, 2)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    out = method.forward(variables, batch, setting)
    assert out.shape == (1, 6, 3)
    # cosine logits bounded in [-1, 1]
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-5


def test_calibration_overall_policy_runs():
    """uncertainty_policy='overall' (pooled 95% quantile, reference
    deepbdc.py:387-402) — wired from config via eval.py."""
    from audio_fewshot_tpu.data.dataset import SpectrogramDataset
    from audio_fewshot_tpu.data.loader import EpisodicLoader
    from audio_fewshot_tpu.models import build_method
    from audio_fewshot_tpu.models.base import EpisodeSetting
    from audio_fewshot_tpu.parallel import get_mesh

    method = build_method({
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "modality": "audio", "precision": "fp32",
    })
    setting = EpisodeSetting(way=3, shot=2, query=3)
    ds = SpectrogramDataset.synthetic(num_classes=5, clips_per_class=8,
                                      segment_shape=(1, 32, 24), seed=0)
    loader = EpisodicLoader(ds, way=3, shot=2, query=3, episodes_per_epoch=2,
                            episode_size=2, mode="eval", prefetch=0)
    batch = next(iter(loader.epoch(0)))
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    th = method.calibrate_threshold(variables, loader, setting, get_mesh(1),
                                    policy="overall")
    assert th is not None and np.isfinite(th)
    assert method.uncertain_global_threshold is not None
