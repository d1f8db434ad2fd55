"""Trainer — epoch loop, jitted train/eval steps, checkpointing.

Reference: ``libfewshot_core/trainer.py`` (774 LoC).  Same lifecycle —
build dirs/logger/writer/meters/model/loaders/optimizer, then per epoch
train → val → test with best-val checkpoint selection (trainer.py:81-135) —
re-expressed as: one jitted SPMD train step (episodes sharded over the mesh,
params replicated, gradient psum inserted by XLA), host-side LR scheduling
(one float per epoch, traced into the step so LR changes don't recompile),
and msgpack checkpoints with the reference's BEST/NORMAL/LAST + ``save_part``
semantics.

There is no DDP wrapper, no SyncBN, no process spawn: a single process drives
all local devices (reference run_trainer.py:43-51 → one jit).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import save_config
from .data import get_dataloader
from .models import build_method, eval_setting, train_setting
from .models.base import EpisodeSetting, MethodBase, ModelType
from .optim import Optimizer, LRScheduler, build_optimizer, build_scheduler
from .parallel import get_mesh, maybe_init_distributed, replicate
from .utils import (
    AverageMeter,
    SaveType,
    TensorboardWriter,
    init_logger,
    init_seed,
    load_last,
    load_part,
    mean_confidence_interval,
    save_model,
)


def enable_compilation_cache(config: Dict[str, Any]) -> None:
    """Persistent XLA compilation cache — repeat CLI runs skip the slow
    first-compile (config key ``compilation_cache``; false disables)."""
    cache = config.get("compilation_cache", ".jax_cache")
    if not cache:
        return
    # anchor the default at the repo root: tests/tools chdir freely, and a
    # cwd-relative dir silently fails cache writes from other directories
    if cache == ".jax_cache":
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs — not fatal
        pass


class Trainer:
    def __init__(self, rank: int, config: Dict[str, Any]):
        self.rank = rank
        self.config = config
        enable_compilation_cache(config)
        self.result_dir, self.ckpt_dir, self.log_dir = self._init_files(config)
        self.logger = init_logger(
            self.log_dir,
            level=config.get("log_level", "info"),
            file_name=self._log_name(config),
        )
        self.writer = TensorboardWriter(os.path.join(self.log_dir, "tfboard_files"))
        self.rng = init_seed(int(config.get("seed", 0)), config.get("deterministic", True))

        self.method: MethodBase = build_method(config)
        self.train_setting = train_setting(config)
        self.eval_setting = eval_setting(config)

        maybe_init_distributed(config)
        # n_gpu > 1 maps to an explicit device count (reference config parity)
        n_dev = config.get("n_devices") or (
            config["n_gpu"] if int(config.get("n_gpu", 1) or 1) > 1 else None
        )
        # FINETUNING trains on flat batches — size the mesh by batch_size,
        # not episode_size (otherwise the default episode_size=1 would pin
        # the most parallel workload to a single chip)
        if self.method.model_type == ModelType.FINETUNING:
            # flat pretraining is the most parallel workload — size the mesh
            # by batch_size; episodic eval batches that don't divide the
            # mesh run replicated (see _validate)
            divisor = int(config.get("batch_size", 128))
        else:
            divisor = int(config.get("episode_size", 1))
        self.mesh = get_mesh(n_dev, batch_divisor=divisor)
        n_used = len(self.mesh.devices.ravel())
        if n_dev is None and n_used < len(jax.devices()):
            self.logger.warning(
                "using %d of %d devices (batch divisor %d) — raise "
                "episode_size/batch_size or set n_devices to use more",
                n_used, len(jax.devices()), divisor,
            )
        self.n_devices = len(self.mesh.devices.ravel())
        self.logger.info(
            "mesh: %d device(s) [%s]",
            self.n_devices,
            self.mesh.devices.ravel()[0].platform,
        )
        # dual-loader training (dataloader_num 2, e.g. RENet) shards the
        # flat companion batch along its batch axis with the same P('data')
        # spec — a batch_size not divisible by the mesh fails at
        # device_put, so round it down (min one sample per device) loudly
        if (int(config.get("dataloader_num", 1)) > 1
                and self.method.model_type != ModelType.FINETUNING):
            bs = int(config.get("batch_size", 128))
            if bs % self.n_devices:
                new_bs = max(self.n_devices, (bs // self.n_devices) * self.n_devices)
                self.logger.warning(
                    "dual-loader batch_size %d is not divisible by the "
                    "%d-device mesh — using %d (the flat companion batch "
                    "shards along its batch axis)", bs, self.n_devices, new_bs,
                )
                config["batch_size"] = new_bs

        self.train_loader = get_dataloader(
            config, "train", self.method.model_type, False, config.get("modality", "audio")
        )
        self.val_loader = get_dataloader(
            config, "val", self.method.model_type, False, config.get("modality", "audio")
        )
        self.test_loader = get_dataloader(
            config, "test", self.method.model_type, False, config.get("modality", "audio")
        )

        self.variables = self._init_variables()
        self.optimizer: Optimizer = build_optimizer(config)
        self.opt_state = self.optimizer.init(self.variables["params"])
        self.scheduler: LRScheduler = build_scheduler(config)

        self.start_epoch = 0
        self.best_val_acc = -1.0
        self.best_test_acc = -1.0
        self._maybe_load_pretrain_or_resume()

        # device-side train augmentation (the reference's ``augment`` key
        # lives in its missing data package — here it is a jitted random
        # spectrogram augmentation fused into the train step)
        from .data import get_mean_std

        self.augment = bool(config.get("augment", False)) and self.method.model_type != ModelType.FINETUNING
        self.aug_mean, self.aug_std = get_mean_std(config, "train")

        # optional wire compression for host→device batches (see
        # parallel/mesh.resolve_transfer_dtype — the tunneled transfer is
        # the measured train-loop bottleneck on remote-TPU setups)
        from .parallel.mesh import resolve_transfer_dtype

        self.transfer_dtype = resolve_transfer_dtype(config.get("transfer_dtype"))

        # device-resident segment banks (data/bank.py): corpus ships to HBM
        # once; batches become int32 gathers — must come after
        # _init_variables (which consumes a payload example batch)
        from .data.bank import setup_segment_banks

        banks = setup_segment_banks(
            config, self.train_loader + [self.val_loader[0], self.test_loader[0]],
            self.mesh, self.transfer_dtype, self.logger,
        )
        self.train_bank = banks[0]
        self.val_bank, self.test_bank = banks[-2], banks[-1]

        self._jit_train_step = jax.jit(
            self._train_step, static_argnames=("setting",), donate_argnums=(0, 1)
        )
        self._jit_eval_step = jax.jit(self._eval_step, static_argnames=("setting",))

        self.train_meter = AverageMeter("train", ["batch_time", "data_time", "calc_time", "loss", "acc"], self.writer)
        self.eval_meter = AverageMeter("eval", ["acc"], self.writer)

    # -- setup --------------------------------------------------------------

    @staticmethod
    def _log_name(config) -> str:
        return "{}-{}-train.log".format(
            config["classifier"]["name"], config["backbone"]["name"]
        )

    def _init_files(self, config) -> Tuple[str, str, str]:
        """Result directory layout matching the reference
        (trainer.py:330-384): ``results/<Classifier-data-backbone-way-shot>/
        {checkpoints, log_files}`` + the merged config dump."""
        if config.get("resume") and config.get("resume_path"):
            result_dir = config["resume_path"]
        else:
            data_name = os.path.basename(str(config.get("data_root", "data")).rstrip("/"))
            tag = config.get("tag")
            name = "{}-{}-{}-{}-{}{}".format(
                config["classifier"]["name"],
                data_name,
                config["backbone"]["name"],
                config["way_num"],
                config["shot_num"],
                f"-{tag}" if tag else "",
            )
            result_dir = os.path.join(config.get("result_root", "./results"), name)
        ckpt_dir = os.path.join(result_dir, "checkpoints")
        log_dir = os.path.join(result_dir, "log_files")
        for d in (result_dir, ckpt_dir, log_dir):
            os.makedirs(d, exist_ok=True)
        save_config(config, os.path.join(result_dir, "config.yaml"))
        return result_dir, ckpt_dir, log_dir

    def _example_batch(self) -> Any:
        return next(iter(self.train_loader[0].epoch(0)))

    def _init_variables(self):
        self.rng, init_rng = jax.random.split(self.rng)
        batch = self._example_batch()
        variables = self.method.init_variables(init_rng, batch, self.train_setting)
        if self.config.get("init_type"):
            from .models.init import init_weights

            self.rng, w_rng = jax.random.split(self.rng)
            variables = {
                **variables,
                "params": init_weights(
                    variables["params"], self.config["init_type"], w_rng
                ),
            }
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
        self.logger.info("model: %s / %s — %.2fM params",
                         self.config["classifier"]["name"],
                         self.config["backbone"]["name"], n_params / 1e6)
        return jax.device_put(variables, replicate(self.mesh))

    def _maybe_load_pretrain_or_resume(self):
        cfg = self.config
        bk = cfg.get("backbone") or {}
        clap_ckpt = (bk.get("kwargs") or {}).get("checkpoint_path") if isinstance(bk, dict) else None
        if clap_ckpt and str(bk.get("name", "")).startswith("CLAP"):
            # converted CLAP weights (flat npz — clap_encoder.save_params /
            # tools/convert_clap_checkpoint.py), loaded into the emb_func
            # part; structure-checked against the initialized tree
            from .models.backbones.clap_encoder import load_params

            loaded = load_params(clap_ckpt)
            tmpl = self.variables["params"]["emb_func"]
            t_struct = jax.tree_util.tree_structure(tmpl)
            l_struct = jax.tree_util.tree_structure(loaded)
            if t_struct != l_struct:
                raise ValueError(
                    f"CLAP checkpoint {clap_ckpt} does not match the "
                    f"encoder's param tree (got {l_struct}, want {t_struct})"
                )
            params = dict(self.variables["params"])
            params["emb_func"] = jax.tree_util.tree_map(
                lambda t, l: jnp.asarray(l, t.dtype).reshape(t.shape), tmpl, loaded
            )
            self.variables = {**self.variables, "params": params}
            self.logger.info("loaded CLAP encoder weights from %s", clap_ckpt)
        if cfg.get("pretrain_path"):
            self.variables = load_part(
                cfg["pretrain_path"], self.variables, part="emb_func"
            )
            self.logger.info("loaded pretrained emb_func from %s", cfg["pretrain_path"])
        if cfg.get("resume"):
            path = os.path.join(self.ckpt_dir, "model_last.pth")
            if os.path.isfile(path):
                state = load_last(path, self.variables, self.opt_state)
                self.variables = jax.device_put(state["variables"], replicate(self.mesh))
                if state.get("opt_state") is not None:
                    self.opt_state = jax.device_put(
                        state["opt_state"], replicate(self.mesh)
                    )
                self.start_epoch = int(state.get("epoch", 0)) + 1
                self.best_val_acc = float(state.get("best_val_acc", -1.0))
                self.best_test_acc = float(state.get("best_test_acc", -1.0))
                if state.get("scheduler"):
                    self.scheduler.load_state_dict(state["scheduler"])
                self.logger.info("resumed from %s at epoch %d", path, self.start_epoch)

    # -- jitted steps -------------------------------------------------------

    def _augment_batch(self, batch, rng):
        """Random spectrogram augmentation on device — one augmentation type
        per step (scalar switch outside the vmap; see
        ops/audio_augmentations.augment_batch_one_type)."""
        from .episode import DualBatch
        from .ops.audio_augmentations import augment_batch_one_type

        k_sup, k_qry, k_flat = jax.random.split(rng, 3)

        def aug(x, key):
            flat = x.reshape((-1,) + x.shape[2:])
            out = augment_batch_one_type(key, flat, self.aug_mean, self.aug_std)
            return out.reshape(x.shape)

        if isinstance(batch, DualBatch):
            ep = batch.episode.replace(
                support=aug(batch.episode.support, k_sup),
                query=aug(batch.episode.query, k_qry),
            )
            g = batch.flat.replace(
                data=augment_batch_one_type(
                    k_flat, batch.flat.data, self.aug_mean, self.aug_std
                )
            )
            return DualBatch(episode=ep, flat=g)
        return batch.replace(
            support=aug(batch.support, k_sup), query=aug(batch.query, k_qry)
        )

    def _train_step(self, variables, opt_state, batch, bank, lr_groups, rng,
                    setting: EpisodeSetting):
        from .episode import (
            DualBatch,
            materialize_episode_batch,
            materialize_flat_batch,
        )
        from .parallel.mesh import upcast_floats

        if bank is not None:
            if isinstance(batch, DualBatch):
                batch = DualBatch(
                    episode=materialize_episode_batch(batch.episode, bank),
                    flat=materialize_flat_batch(batch.flat, bank),
                )
            elif hasattr(batch, "data_idx"):
                batch = materialize_flat_batch(batch, bank)
            else:
                batch = materialize_episode_batch(batch, bank)
        batch = upcast_floats(batch)  # undo transfer_dtype wire compression
        if self.augment:
            rng, aug_rng = jax.random.split(rng)
            batch = self._augment_batch(batch, aug_rng)
        non_params = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params):
            loss, out = self.method.loss(
                {**non_params, "params": params}, batch, setting, rng
            )
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        params, opt_state = self.optimizer.apply(
            grads, opt_state, variables["params"], lr_groups
        )
        new_vars = {**non_params, "params": params}
        if out.updates:
            new_vars = self.method.merge_updates(new_vars, out.updates)
        metrics = dict(out.metrics)
        metrics["loss"] = loss
        return new_vars, opt_state, metrics

    def _eval_step(self, variables, batch, bank, setting: EpisodeSetting):
        from .episode import materialize_episode_batch
        from .parallel.mesh import upcast_floats

        if bank is not None:
            batch = materialize_episode_batch(batch, bank)
        batch = upcast_floats(batch)
        seg_logits = self.method.forward(variables, batch, setting)
        return self.method.eval_episode_accuracy(seg_logits, batch)

    def _featuring_step(self, variables, batch, bank, sums, counts):
        """One accumulation step of the IFSL 'featuring' pass: per-class
        embedding sums + counts (reference matchingnetifsl_pretrain.py:56-67,
        incl. the ``norm`` pre-normalization at :40-43,56-57)."""
        from .episode import materialize_flat_batch
        from .parallel.mesh import upcast_floats

        if bank is not None:
            batch = materialize_flat_batch(batch, bank)
        batch = upcast_floats(batch)
        feats, _ = self.method.apply_module(
            variables, "emb_func", batch.data, train=False
        )
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        if getattr(self.method, "norm", False):
            feats = feats / (
                jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-5
            )
        onehot = jax.nn.one_hot(
            batch.target, self.method.num_class, dtype=feats.dtype
        )
        return sums + onehot.T @ feats, counts + jnp.sum(onehot, axis=0)

    def run_featuring(self):
        """IFSL 'featuring' mode (``ifsl_pretrain_param.featuring: true``):
        the reference zeroes the loss and np.saves running per-class mean
        embeddings to ``feature_path`` every step of every epoch
        (matchingnetifsl_pretrain.py:58-68) — parameters never move, so the
        epochs collapse to ONE accumulation pass here (eval-mode BN; the
        reference's train-mode running-stat drift under a zero-loss loop is
        an artifact, not signal).  Leaves a normal result dir: the npy
        artifact plus last/part checkpoints of the (unchanged) weights."""
        cfg = self.config
        feature_path = getattr(self.method, "feature_path", None)
        assert feature_path, (
            "featuring: true requires ifsl_pretrain_param.feature_path"
        )
        from .parallel.mesh import transfer_ahead

        d = self.variables["params"]["classifier"]["kernel"].shape[0]
        num_class = self.method.num_class
        sums = jnp.zeros((num_class, d), jnp.float32)
        counts = jnp.zeros((num_class,), jnp.float32)
        step_fn = jax.jit(self._featuring_step, donate_argnums=(3, 4))
        t0, steps = time.time(), 0
        for dev_batch in transfer_ahead(
            self.train_loader[0].epoch(0), self.mesh, self.transfer_dtype
        ):
            sums, counts = step_fn(
                self.variables, dev_batch, self.train_bank, sums, counts
            )
            steps += 1
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        os.makedirs(os.path.dirname(os.path.abspath(feature_path)), exist_ok=True)
        np.save(feature_path, np.asarray(jax.device_get(means), np.float32))
        covered = int(jax.device_get(jnp.sum(counts > 0)))
        self.logger.info(
            "featuring: %d steps, %d/%d classes covered -> %s (%.1f s)",
            steps, covered, num_class, feature_path, time.time() - t0,
        )
        if covered < num_class:
            # unseen classes keep zero rows, as the reference's
            # zero-initialized accumulator does
            self.logger.warning(
                "featuring: %d classes unseen in the train split keep "
                "all-zero feature rows", num_class - covered,
            )
        host_vars = jax.device_get(self.variables)
        save_model(
            self.ckpt_dir, host_vars, 0, SaveType.LAST,
            train_state={"best_val_acc": -1.0, "best_test_acc": -1.0},
            save_part=cfg.get("save_part") or [],
        )
        self.writer.close()
        return self.best_val_acc, self.best_test_acc

    # -- loops --------------------------------------------------------------

    def train_loop(self, rank: int = 0):
        cfg = self.config
        if getattr(self.method, "featuring", False):
            return self.run_featuring()
        epochs = int(cfg.get("epoch", 1))
        t_start = time.time()
        for epoch in range(self.start_epoch, epochs):
            self.logger.info("============ Train on the train set ============")
            self.logger.info("learning rate: %.6g", self.optimizer.base_lr * self.scheduler.scale(epoch))
            train_loss = self._train(epoch)

            val_acc = test_acc = None
            if (epoch + 1) % int(cfg.get("val_per_epoch", 1)) == 0:
                self.logger.info("============ Validation on the val set ============")
                val_acc, val_ci = self._validate(epoch, self.val_loader[0], "val", self.val_bank)
                self.logger.info(" * Acc@1 %.3f ± %.3f Best acc %.3f", val_acc, val_ci, max(self.best_val_acc, val_acc))
                self.logger.info("============ Testing on the test set ============")
                test_acc, test_ci = self._validate(epoch, self.test_loader[0], "test", self.test_bank)
                self.logger.info(" * Acc@1 %.3f ± %.3f Best acc %.3f", test_acc, test_ci, max(self.best_test_acc, test_acc))

            self.scheduler.step(train_loss)
            self._checkpoint(epoch, val_acc, test_acc)
            self._log_eta(epoch, epochs, t_start)
        self.logger.info(
            "End of experiment — best val %.3f / best test %.3f (results: %s)",
            self.best_val_acc, self.best_test_acc, self.result_dir,
        )
        self.writer.close()
        return self.best_val_acc, self.best_test_acc

    def _train(self, epoch: int) -> float:
        cfg = self.config
        meter = self.train_meter
        meter.reset()
        lr_scale = self.scheduler.scale(epoch)
        lr_groups = self.optimizer.lr_tree(self.variables["params"], lr_scale)
        log_interval = int(cfg.get("log_interval", 100))
        episode_size = int(cfg.get("episode_size", 1))

        # optional on-device profiling: trace steps [profile_start,
        # profile_start+profile_steps) of epoch 0 (SURVEY §5.1 — the
        # reference only has wall-clock meters; this adds a real trace)
        profile_steps = int(cfg.get("profile_steps", 0) or 0)
        profile_start = int(cfg.get("profile_start", 2))
        profile_dir = os.path.join(self.log_dir, "profile")

        def host_batches():
            iters = [ld.epoch(epoch) for ld in self.train_loader]
            if len(iters) == 1:
                yield from iters[0]
                return
            # dataloader_num 2 with a global-flat companion loader: the
            # reference zips both loaders into ONE model call per step
            # (trainer.py:159-188, ``zip(*self.train_loader)``) — RENet's
            # auxiliary global CE consumes the flat half (renet.py:409-447)
            from .data.loader import FlatLoader
            from .episode import DualBatch

            if isinstance(self.train_loader[1], FlatLoader) and not isinstance(
                self.train_loader[0], FlatLoader
            ):
                # zip truncates to the shorter loader (reference semantics)
                # — on small datasets the flat companion can starve the
                # epoch far below train_episode; say so instead of silently
                # shrinking the epoch (lower batch_size to rebalance)
                n_ep, n_flat = len(self.train_loader[0]), len(self.train_loader[1])
                if epoch == 0 and n_flat < n_ep:
                    self.logger.info(
                        "dual-loader epoch truncated to %d steps: the "
                        "global-flat companion (%d batches of batch_size "
                        "%s) is shorter than the episodic loader (%d) — "
                        "reference zip semantics (trainer.py:159)",
                        min(n_ep, n_flat), n_flat,
                        cfg.get("batch_size", 128), n_ep,
                    )
                for ep_b, g_b in zip(*iters[:2]):
                    yield DualBatch(episode=ep_b, flat=g_b)
                return
            for batches in zip(*iters):
                yield from batches

        def device_batches():
            """One-ahead device transfer: `jax.device_put` is async, so the
            next batch's host→device copy overlaps the current step's
            compute instead of serializing in front of it."""
            from .parallel.mesh import transfer_ahead

            yield from transfer_ahead(host_batches(), self.mesh, self.transfer_dtype)

        t_end = time.time()
        step = 0
        for dev_batch in device_batches():
            if profile_steps and epoch == 0 and step == profile_start:
                jax.profiler.start_trace(profile_dir)
                self._profiling = True
            if getattr(self, "_profiling", False) and step >= profile_start + profile_steps:
                jax.profiler.stop_trace()
                self._profiling = False
                self.logger.info("profiler trace written to %s", profile_dir)
                profile_steps = 0
            self.writer.set_step(epoch * len(self.train_loader[0]) + step)
            meter.update("data_time", time.time() - t_end)
            self.rng, step_rng = jax.random.split(self.rng)
            t0 = time.time()
            self.variables, self.opt_state, metrics = self._jit_train_step(
                self.variables, self.opt_state, dev_batch, self.train_bank,
                lr_groups, step_rng, self.train_setting,
            )
            metrics = jax.device_get(metrics)
            meter.update("calc_time", time.time() - t0)
            meter.update("loss", float(metrics["loss"]))
            meter.update("acc", float(metrics.get("acc", 0.0)))
            meter.update("batch_time", time.time() - t_end)
            t_end = time.time()
            if step % log_interval == 0:
                if cfg.get("log_paramerter"):
                    self._log_param_histograms()
                self.logger.info(
                    "Epoch-({}): [{}/{}]\tTime {:.3f} ({:.3f})\tCalc {:.3f} ({:.3f})\t"
                    "Data {:.3f} ({:.3f})\tLoss {:.3f} ({:.3f})\tAcc@1 {:.3f} ({:.3f})".format(
                        epoch, step * episode_size, len(self.train_loader[0]) * episode_size,
                        meter.last("batch_time"), meter.avg("batch_time"),
                        meter.last("calc_time"), meter.avg("calc_time"),
                        meter.last("data_time"), meter.avg("data_time"),
                        meter.last("loss"), meter.avg("loss"),
                        meter.last("acc"), meter.avg("acc"),
                    )
                )
            step += 1
        if getattr(self, "_profiling", False):
            # trace window outran the epoch — flush it rather than leak
            jax.profiler.stop_trace()
            self._profiling = False
            self.logger.info("profiler trace written to %s", profile_dir)
        return meter.avg("loss")

    def _log_param_histograms(self) -> None:
        """``log_paramerter: true`` — per-parameter TB histograms at every
        ``log_interval`` step, skipping batch-norm params (the reference
        filters names containing "bn", trainer.py:168-172).  Tags mirror the
        reference's ``name.replace(".", "/")`` so dashboards line up."""
        flat = jax.tree_util.tree_flatten_with_path(self.variables["params"])[0]
        for path, leaf in flat:
            parts = [getattr(k, "key", str(k)) for k in path]
            # the reference filters torch names containing "bn"; flax default
            # module names spell it out ("BatchNorm_0"), so match both
            if any(
                "bn" in (s := str(p).lower()) or "batchnorm" in s for p in parts
            ):
                continue
            # float32 cast: torch's histogram binning rejects ml_dtypes
            # bfloat16 arrays (param_dtype bf16 runs)
            self.writer.add_histogram(
                "/".join(str(p) for p in parts),
                np.asarray(jax.device_get(leaf), np.float32),
            )

    def _validate(self, epoch: int, loader, mode: str, bank=None) -> Tuple[float, float]:
        self.writer.set_step(epoch)
        accs = []
        n_mesh = len(self.mesh.devices.ravel())
        from .parallel.mesh import transfer_ahead

        def to_device(batches):
            """One-ahead sharded transfer when the episode axis divides the
            mesh (it is constant per loader); replicated fallback otherwise
            (FINETUNING meshes are sized by batch_size)."""
            it = iter(batches)
            try:
                first = next(it)
            except StopIteration:
                return

            def chain():
                yield first
                yield from it

            ep_axis = first.support_idx if hasattr(first, "support_idx") else first.support
            if ep_axis.shape[0] % n_mesh == 0:
                yield from transfer_ahead(chain(), self.mesh, self.transfer_dtype)
            else:
                for b in chain():
                    yield jax.tree_util.tree_map(
                        lambda x: jax.device_put(np.asarray(x), replicate(self.mesh)),
                        b,
                    )

        for dev_batch in to_device(loader.epoch(epoch)):
            ep_acc = self._jit_eval_step(self.variables, dev_batch, bank, self.eval_setting)
            accs.extend(np.asarray(jax.device_get(ep_acc)).ravel().tolist())
        mean, ci = mean_confidence_interval(accs)
        self.eval_meter.update("acc", mean)
        return mean, ci

    # -- checkpoints --------------------------------------------------------

    def _checkpoint(self, epoch: int, val_acc: Optional[float], test_acc: Optional[float]):
        cfg = self.config
        host_vars = jax.device_get(self.variables)
        save_part = cfg.get("save_part") or []
        if val_acc is not None and val_acc > self.best_val_acc:
            self.best_val_acc = val_acc
            # test accuracy AT the best-val epoch — not a running max
            # (reference trainer.py:112-114); a max would report a number
            # no selectable checkpoint achieves
            if test_acc is not None:
                self.best_test_acc = test_acc
            save_model(self.ckpt_dir, host_vars, epoch, SaveType.BEST, save_part=save_part)
        if (epoch + 1) % int(cfg.get("save_interval", 10)) == 0:
            save_model(self.ckpt_dir, host_vars, epoch, SaveType.NORMAL, save_part=save_part)
        save_model(
            self.ckpt_dir, host_vars, epoch, SaveType.LAST,
            train_state={
                "best_val_acc": self.best_val_acc,
                "best_test_acc": self.best_test_acc,
                "scheduler": self.scheduler.state_dict(),
                # full training state incl. optimizer moments (reference
                # LAST semantics, utils/utils.py:207-265)
                "opt_state": jax.device_get(self.opt_state),
            },
            save_part=save_part,
        )

    def _log_eta(self, epoch: int, epochs: int, t_start: float):
        done = epoch - self.start_epoch + 1
        per_epoch = (time.time() - t_start) / done
        remain = per_epoch * (epochs - epoch - 1)
        self.logger.info("epoch %d done (%.1fs/epoch, ETA %.0fs)", epoch, per_epoch, remain)
