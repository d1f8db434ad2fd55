"""Round-3 honesty/fidelity fixes (VERDICT.md round 2, items 2 and 9)."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.episode import DualBatch, FlatBatch, make_dense_episode_batch
from audio_fewshot_tpu.models import build_method
from audio_fewshot_tpu.models.base import EpisodeSetting

SPEC = (1, 32, 24)
SETTING = EpisodeSetting(way=3, shot=2, query=3)


def _episode_batch(seed=0, e=2):
    rng = np.random.default_rng(seed)
    way, shot, query = SETTING.way, SETTING.shot, SETTING.query
    sup = rng.normal(size=(e, way * shot) + SPEC).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + SPEC).astype(np.float32)
    b = make_dense_episode_batch(sup, qry, way, shot, query)
    gs = np.tile(np.repeat(np.arange(way), shot)[None], (e, 1))
    gq = np.tile(np.repeat(np.arange(way), query)[None], (e, 1))
    return b.replace(global_target=jnp.asarray(np.concatenate([gs, gq], 1)))


def _flat_batch(seed=3, n=8, num_class=6):
    rng = np.random.default_rng(seed)
    return FlatBatch(
        data=jnp.asarray(rng.normal(size=(n,) + SPEC).astype(np.float32)),
        target=jnp.asarray(rng.integers(num_class, size=(n,)).astype(np.int32)),
    )


def _build_renet(**kw):
    kwargs = {"feat_dim": 64, "num_classes": 6}
    kwargs.update(kw)
    return build_method({
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "RENet", "kwargs": kwargs},
        "modality": "audio",
        "way_num": SETTING.way, "shot_num": SETTING.shot,
        "query_num": SETTING.query, "precision": "fp32",
    })


class TestRENetDualLoader:
    """Faithful RENet training objective: loss = λ·epi + abs + aux over the
    paired (episodic, global-flat) batches (reference renet.py:409-447,
    dataloader_num: 2 at config/renet.yaml:78, trainer.py:159-188)."""

    def test_dual_batch_adds_exactly_the_aux_ce(self):
        method = _build_renet()
        ep = _episode_batch()
        flat = _flat_batch(num_class=6)
        variables = method.init_variables(jax.random.PRNGKey(0), ep, SETTING)
        rng = jax.random.PRNGKey(1)

        loss_epi_abs, out1 = method.loss(variables, ep, SETTING, rng)
        loss_dual, out2 = method.loss(
            variables, DualBatch(episode=ep, flat=flat), SETTING, rng
        )

        # manual aux: encode = emb_func → SCR (residual+relu inside), GAP, fc
        g_feat, _ = method.apply_module(
            variables, "emb_func", flat.data, train=True, rng=rng
        )
        g_ref, _ = method.apply_module(
            variables, "scr", g_feat.transpose(0, 2, 3, 1), train=True, rng=rng
        )
        logits = method.modules["fc"].apply(
            {"params": variables["params"]["fc"]}, g_ref.mean(axis=(1, 2))
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        aux = -jnp.mean(
            jnp.take_along_axis(logp, flat.target[:, None], axis=-1)
        )
        np.testing.assert_allclose(
            float(loss_dual), float(loss_epi_abs) + float(aux), rtol=1e-5
        )
        # the dual pass must also fold the flat pass's batch stats in
        assert out2.updates is not None

    def test_abs_term_always_present(self):
        """The absolute global CE is part of the loss even without the
        second loader (it only needs the episodic global targets)."""
        method = _build_renet()
        ep = _episode_batch()
        variables = method.init_variables(jax.random.PRNGKey(0), ep, SETTING)
        rng = jax.random.PRNGKey(1)
        loss_full, out = method.loss(variables, ep, SETTING, rng)

        # λ·epi alone, reconstructed from the returned similarity logits
        from audio_fewshot_tpu.episode import segment_targets
        from audio_fewshot_tpu.models.base import masked_cross_entropy

        epi = masked_cross_entropy(
            out.seg_logits, segment_targets(ep), ep.query_mask
        )
        assert float(loss_full) > float(method.lambda_epi * epi) + 1e-4

    def test_missing_global_target_raises(self):
        method = _build_renet()
        ep = _episode_batch().replace(global_target=None)
        full = _episode_batch()
        variables = method.init_variables(jax.random.PRNGKey(0), full, SETTING)
        with pytest.raises(ValueError, match="global targets"):
            method.loss(variables, ep, SETTING, jax.random.PRNGKey(1))

    def test_abs_layout_mismatch_raises(self):
        """The former silent shape gate (heads/renet.py:275) is now a loud
        error (same convention as heads/can.py)."""
        method = _build_renet()
        ep = _episode_batch()
        variables = method.init_variables(jax.random.PRNGKey(0), ep, SETTING)
        bad = ep.replace(global_target=ep.global_target[:, :-2])
        with pytest.raises(ValueError, match="abs loss layout"):
            method.loss(variables, bad, SETTING, jax.random.PRNGKey(1))

    def test_get_dataloader_returns_episodic_plus_flat(self):
        from audio_fewshot_tpu.data import get_dataloader
        from audio_fewshot_tpu.data.loader import EpisodicLoader, FlatLoader
        from audio_fewshot_tpu.models.base import ModelType

        cfg = {
            "data_root": "synthetic:6:8", "spec_shape": SPEC,
            "dataloader_num": 2, "batch_size": 8,
            "way_num": 3, "shot_num": 2, "query_num": 3,
            "episode_size": 2, "train_episode": 8, "seed": 0,
            "prefetch": 0, "max_segments_per_clip": 2,
        }
        loaders = get_dataloader(cfg, "train", ModelType.METRIC, False, "audio")
        assert len(loaders) == 2
        assert isinstance(loaders[0], EpisodicLoader)
        assert isinstance(loaders[1], FlatLoader)
        # one dataset → one segment bank
        assert loaders[0].dataset is loaders[1].dataset
        # eval stays single-loader episodic
        ev = get_dataloader(cfg, "test", ModelType.METRIC, False, "audio")
        assert len(ev) == 1 and isinstance(ev[0], EpisodicLoader)

    @pytest.mark.slow
    def test_trainer_end_to_end_dual_loader(self, tmp_path):
        """Trainer pairs the loaders into DualBatch steps (bank-indexed),
        trains RENet with the full objective, and learns above chance."""
        from audio_fewshot_tpu.train import Trainer

        config = {
            "data_root": "synthetic:6:10",
            "spec_shape": SPEC,
            "modality": "audio",
            "mean_std_file": None,
            "backbone": {"name": "Conv64F", "kwargs": {
                "is_flatten": False, "last_pool": False,
                "maxpool_last2": False, "num_channels": 1}},
            "classifier": {"name": "RENet", "kwargs": {
                "feat_dim": 64, "num_classes": 6, "lambda_epi": 0.25}},
            "optimizer": {"name": "Adam", "kwargs": {"lr": 3e-3}, "other": None},
            "lr_scheduler": {"name": "StepLR",
                             "kwargs": {"gamma": 1.0, "step_size": 10}},
            "way_num": 3, "shot_num": 1, "query_num": 3,
            "test_way": 3, "test_shot": 1, "test_query": 3,
            "episode_size": 2, "train_episode": 12, "test_episode": 4,
            "epoch": 2, "test_epoch": 1, "val_per_epoch": 1,
            "dataloader_num": 2, "batch_size": 8,
            "save_interval": 100, "save_part": ["emb_func"],
            "log_interval": 1000, "seed": 0, "precision": "fp32",
            "result_root": str(tmp_path), "prefetch": 0,
            "warmup": 0, "augment_times": 1,
            "max_segments_per_clip": 2,
        }
        trainer = Trainer(0, config)
        from audio_fewshot_tpu.data.loader import EpisodicLoader, FlatLoader

        assert isinstance(trainer.train_loader[0], EpisodicLoader)
        assert isinstance(trainer.train_loader[1], FlatLoader)
        best_val, best_test = trainer.train_loop(0)
        assert best_val > 40.0, best_val


class TestTtaCleanStats:
    """Energy-TTA must fail loudly when the Clean stats file is absent
    (reference test.py:397-398 hard-codes ./Auxiliary/Clean_Mean_Std.npy)."""

    def test_missing_clean_stats_raises(self, tmp_path):
        from audio_fewshot_tpu.eval import resolve_tta_stats

        cfg = {"tta_mean_std_file": str(tmp_path / "nope.npy")}
        with pytest.raises(FileNotFoundError, match="energy-OOD TTA requires"):
            resolve_tta_stats(cfg, logging.getLogger("t"))

    def test_explicit_opt_in_falls_back_to_config_stats(self, tmp_path):
        from audio_fewshot_tpu.eval import resolve_tta_stats

        ms = np.array([[[3.0]], [[2.0]]], dtype=np.float32)
        np.save(tmp_path / "cfg_ms.npy", ms)
        cfg = {
            "tta_mean_std_file": str(tmp_path / "nope.npy"),
            "tta_allow_config_stats": True,
            "mean_std_file": str(tmp_path / "cfg_ms.npy"),
        }
        mean, std = resolve_tta_stats(cfg, logging.getLogger("t"))
        assert float(np.asarray(mean).reshape(())) == pytest.approx(3.0)
        assert float(np.asarray(std).reshape(())) == pytest.approx(2.0)

    def test_present_clean_stats_load(self, tmp_path):
        from audio_fewshot_tpu.eval import resolve_tta_stats

        ms = np.array([[[-15.0]], [[26.0]]], dtype=np.float32)
        np.save(tmp_path / "Clean_Mean_Std.npy", ms)
        cfg = {"tta_mean_std_file": str(tmp_path / "Clean_Mean_Std.npy")}
        mean, std = resolve_tta_stats(cfg, logging.getLogger("t"))
        assert float(np.asarray(mean).reshape(())) == pytest.approx(-15.0)
        assert float(np.asarray(std).reshape(())) == pytest.approx(26.0)


class TestEvalBatching:
    """VERDICT round 2, item 5 — close the CLI eval round-trip gap."""

    def test_test_episode_size_overrides_eval_only(self):
        from audio_fewshot_tpu.data import get_dataloader
        from audio_fewshot_tpu.models.base import ModelType

        cfg = {
            "data_root": "synthetic:6:8", "spec_shape": SPEC,
            "way_num": 3, "shot_num": 2, "query_num": 3,
            "episode_size": 2, "test_episode_size": 4,
            "train_episode": 8, "test_episode": 8, "seed": 0,
            "prefetch": 0, "max_segments_per_clip": 2,
        }
        tr = get_dataloader(cfg, "train", ModelType.METRIC, False, "audio")
        ev = get_dataloader(cfg, "test", ModelType.METRIC, False, "audio")
        assert tr[0].episode_size == 2
        assert ev[0].episode_size == 4
        # unset → eval inherits episode_size
        cfg2 = {**cfg}
        del cfg2["test_episode_size"]
        ev2 = get_dataloader(cfg2, "test", ModelType.METRIC, False, "audio")
        assert ev2[0].episode_size == 2


class TestFEATReferenceRecipe:
    """FEAT fidelity: the reference inverts the paper's loss weighting
    (feat.py:230 ``loss = loss1 * balance + loss_reg``) and ships audio
    kwargs temperature/temperature2 1.0, balance 0.5
    (/root/reference/config/feat.yaml:17-22); its attention uses 0.1 on
    the attention matrix but 0.5 after the projection (feat.py:58,137)."""

    def test_defaults_match_reference_audio_config(self):
        from audio_fewshot_tpu.models.heads.feat import FEAT, SetAttention
        from audio_fewshot_tpu.models.backbones.conv_four import conv64f

        head = FEAT(conv64f(num_channels=1), way_num=5, shot_num=5,
                    query_num=10)
        assert head.temperature == 1.0
        assert head.temperature2 == 1.0
        assert head.balance == 0.5
        attn = SetAttention(hdim=64)
        assert attn.attn_dropout == 0.1
        assert attn.dropout == 0.5


class TestDualLoaderSharding:
    """The flat companion batch shards along its batch axis with the same
    P('data') spec as episodes — a batch_size not divisible by the mesh
    used to fail at device_put; the trainer now rounds it down loudly."""

    def test_dual_loader_trains_on_multi_device_mesh(self, tmp_path):
        from audio_fewshot_tpu.train import Trainer

        config = {
            # 32x24 -> 3x2 feature maps after the two stride-3 pools: RENet
            # needs spatial maps (1x1 is NaN geometry — renet.py guard)
            "data_root": "synthetic:6:8", "spec_shape": (1, 32, 24),
            "modality": "audio", "mean_std_file": None,
            "backbone": {"name": "Conv64F", "kwargs": {
                "is_flatten": False, "last_pool": False,
                "maxpool_last2": False, "num_channels": 1}},
            "classifier": {"name": "RENet",
                           "kwargs": {"feat_dim": 64, "num_class": 6}},
            "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3},
                          "other": None},
            "lr_scheduler": {"name": "StepLR",
                             "kwargs": {"gamma": 1.0, "step_size": 10}},
            "way_num": 2, "shot_num": 1, "query_num": 2,
            "test_way": 2, "test_shot": 1, "test_query": 2,
            "episode_size": 4, "train_episode": 4, "test_episode": 4,
            "epoch": 1, "test_epoch": 1, "val_per_epoch": 10,
            "save_interval": 100, "log_interval": 1000, "seed": 0,
            "precision": "fp32", "result_root": str(tmp_path),
            "prefetch": 0, "warmup": 0, "augment_times": 1,
            "max_segments_per_clip": 1, "device_data_bank": False,
            # 10 % 4 != 0 — must round down to 8, not crash at device_put
            "dataloader_num": 2, "batch_size": 10,
        }
        tr = Trainer(0, config)
        assert tr.mesh.devices.size > 1  # conftest's 8 virtual CPU devices
        assert config["batch_size"] % tr.mesh.devices.size == 0
        tr.train_loop(0)
        # training must actually be numerically healthy, not merely complete
        # (round 3 shipped a fixture whose 1x1 feature maps trained on NaN)
        final_loss = tr.train_meter.avg("loss")
        assert np.isfinite(final_loss), f"non-finite train loss {final_loss}"
