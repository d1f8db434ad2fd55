"""Test harness — episodic evaluation with confidence intervals.

Reference: ``libfewshot_core/test.py`` (733 LoC).  ``Test(rank, config,
result_path).test_loop()`` runs ``test_epoch`` passes over the test loader,
reporting a 95 % CI per epoch and aggregated over all epochs
(test.py:180-238).  The energy-OOD calibration pass (validation-set
uncertainty threshold, test.py:188) and the TTA re-classification loop
(test.py:331-500) hook in through the method when it supports them
(DeepBDC — see models/heads/deepbdc.py).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import get_dataloader
from .models import build_method, eval_setting
from .models.base import EpisodeSetting, MethodBase
from .parallel import get_mesh, replicate
from .utils import (
    init_logger,
    init_seed,
    load_variables,
    mean_confidence_interval,
)


def resolve_tta_stats(cfg: Dict[str, Any], logger) -> Tuple[float, float]:
    """De/re-normalization stats for the energy-OOD TTA pass.

    The reference always loads the CLEAN stats here, regardless of the
    config's ``mean_std_file`` (test.py:397-398 hard-codes
    ``./Auxiliary/Clean_Mean_Std.npy``).  If the file is absent we fail
    loudly — silently substituting the config's own stats changes the
    de/re-norm semantics — unless the user explicitly opts into the
    fallback with ``tta_allow_config_stats: true``.
    """
    from .data import get_mean_std
    from .data.dataset import load_mean_std

    clean = cfg.get("tta_mean_std_file", "./Auxiliary/Clean_Mean_Std.npy")
    if clean and os.path.isfile(clean):
        return load_mean_std(clean)
    if cfg.get("tta_allow_config_stats", False):
        logger.warning(
            "Clean stats %s not found — TTA falls back to the config's "
            "mean_std_file (tta_allow_config_stats=True)", clean,
        )
        return get_mean_std(cfg, "test")
    raise FileNotFoundError(
        f"energy-OOD TTA requires the Clean normalization stats "
        f"({clean!r} not found). The reference hard-codes "
        f"./Auxiliary/Clean_Mean_Std.npy for the de/re-norm step "
        f"(test.py:397-398); falling back to the config's own stats would "
        f"silently change semantics. Provide the file (tools/make_assets.py "
        f"regenerates it), point tta_mean_std_file at it, or set "
        f"tta_allow_config_stats: true to opt into the fallback."
    )


def tta_eval_step(method, variables, batch, rng, setting: EpisodeSetting, *,
                  tta_mean: float, tta_std: float, num_augmentations: int,
                  tta_segments_per_clip: int, bank=None):
    """Energy-OOD + TTA re-classification (reference test.py:331-500):
    flag the top-20 % most-uncertain query clips, REPLACE each flagged
    clip's segments with ``num_augmentations`` noise-suppressed copies of
    each, and re-take the majority vote over the augmented pool.

    This is the reference's *intended* semantics: ``augment_images_with_
    mask`` (test.py:107-122) substitutes every segment of a flagged clip
    with M augmented versions (originals dropped) and re-runs the model
    on the enlarged batch.  The reference's repeats bookkeeping
    (``repeats[idxs] += M-1``, test.py:413) is only coherent for
    single-segment clips — multi-segment flagged clips shift every later
    clip's alignment; here the segment gather is per-clip and exact.
    All static shapes — flagged count and per-clip segment cap are fixed.

    Module-level (not a ``Test`` method) so the driver's multi-chip dry run
    jits the same production step over a mesh (__graft_entry__).
    """
    from .episode import materialize_episode_batch
    from .parallel.mesh import upcast_floats

    if bank is not None:
        batch = materialize_episode_batch(batch, bank)
    batch = upcast_floats(batch)  # undo transfer_dtype wire compression
    from .ops.audio_augmentations import batch_augment_spectrogram
    from .utils.aggregate import clip_vote_counts

    sup_raw, qry_f, _ = method.embed(variables, batch, train=False)
    sup_f = sup_raw
    use_bpa = getattr(method, "use_bpa", False)
    if use_bpa:
        # mirror forward(): the base votes and the calibration pass ran
        # through the BPA transform — the TTA path must score on the
        # same feature space
        from .models.heads.proto_net import apply_bpa

        sup_f, qry_f = apply_bpa(sup_raw, qry_f, batch.query_mask)
    seg_logits = method.feature_logits(sup_f, qry_f, setting)

    wq = batch.num_query_clips
    uncertains, _ = method.clip_uncertainty(seg_logits, batch)
    top_idx = method.ood_topk(uncertains)
    k = top_idx.shape[0]
    m = num_augmentations
    ep_idx = top_idx // wq
    clip_idx = top_idx % wq

    # all valid segments of each flagged clip, capped at a static S
    # (the padded segment axis is static; S defaults to the loader's
    # max_segments_per_clip so nothing is dropped)
    is_clip = (batch.query_clip[ep_idx] == clip_idx[:, None]) & (
        batch.query_mask[ep_idx] > 0
    )  # [K, G]
    s_cap = min(tta_segments_per_clip, is_clip.shape[1])
    order = jnp.argsort(~is_clip, axis=1, stable=True)[:, :s_cap]  # [K, S]
    seg_valid = jnp.take_along_axis(is_clip, order, axis=1)  # [K, S]
    segments = batch.query[ep_idx[:, None], order]  # [K, S, C, H, W]

    aug = batch_augment_spectrogram(
        rng, segments.reshape((k * s_cap,) + segments.shape[2:]),
        tta_mean, tta_std,
        num_augmentations=m,
        augmentation_type="noise_suppression",
    )  # [K*S*M, C, H, W]
    aug_f = method.embed_segments(variables, aug).reshape(k, s_cap * m, -1)
    # each flagged clip scores vs its own episode's support set
    if use_bpa:
        # BPA features live in the affinity space of their own joint
        # [support ‖ query] set — the post-transform support has width
        # ws+G, incompatible with raw D-dim aug embeddings.  Re-apply
        # the transform jointly over (raw support, aug segments) per
        # flagged clip, masking the padded segment slots out of the
        # transport marginals, and score inside that space.
        from .models.heads.proto_net import apply_bpa

        aug_mask = jnp.repeat(
            seg_valid.astype(jnp.float32), m, axis=1
        )  # [K, S*M]
        sup_t, aug_t = apply_bpa(sup_raw[ep_idx], aug_f, aug_mask)
        aug_logits = method.feature_logits(sup_t, aug_t, setting)
    else:
        aug_logits = method.feature_logits(sup_f[ep_idx], aug_f, setting)

    votes = clip_vote_counts(
        seg_logits, batch.query_clip, batch.query_mask, wq
    )  # [E, Wq, way]
    way = votes.shape[-1]
    aug_pred = jax.nn.one_hot(jnp.argmax(aug_logits, axis=-1), way)
    aug_pred = aug_pred.reshape(k, s_cap, m, way)
    aug_votes = jnp.sum(
        aug_pred * seg_valid[:, :, None, None], axis=(1, 2)
    )  # [K, way]
    # REPLACE the flagged clips' vote pools (reference substitution
    # semantics: the original segments are not re-scored)
    votes = votes.at[ep_idx, clip_idx].set(aug_votes)
    preds = jnp.argmax(votes, axis=-1).astype(jnp.int32)
    return jnp.mean(
        (preds == batch.query_target).astype(jnp.float32), axis=-1
    ) * 100.0


class Test:
    __test__ = False  # not a pytest case (this module is imported by tests)

    def __init__(self, rank: int, config: Dict[str, Any], result_path: Optional[str] = None):
        from .train import enable_compilation_cache

        self.rank = rank
        self.config = config
        enable_compilation_cache(config)
        self.result_path = result_path
        log_dir = os.path.join(result_path, "log_files") if result_path else None
        self.logger = init_logger(
            log_dir,
            level=config.get("log_level", "info"),
            file_name="{}-{}-test.log".format(
                config["classifier"]["name"], config["backbone"]["name"]
            ),
        )
        self.rng = init_seed(int(config.get("seed", 0)))
        self.method: MethodBase = build_method(config)
        self.setting = eval_setting(config)
        self.mesh = get_mesh(
            config.get("n_devices"),
            batch_divisor=int(
                config.get("test_episode_size")
                or config.get("episode_size", 1)
            ),
        )

        # the val split only feeds the energy-OOD calibration pass — for
        # methods without it, loading the split (and later shipping its
        # segment bank to HBM, where it competes with the test bank for
        # the device_data_bank budget) is pure waste
        self._needs_val = getattr(self.method, "supports_energy_ood", False)
        self.val_loader = (
            get_dataloader(
                config, "val", self.method.model_type, False,
                config.get("modality", "audio"),
            )
            if self._needs_val else None
        )
        self.test_loader = get_dataloader(
            config, "test", self.method.model_type, False, config.get("modality", "audio")
        )

        self.variables = self._load_model()
        self._jit_eval_step = jax.jit(self._eval_step, static_argnames=("setting",))
        self._jit_tta_step = jax.jit(self._tta_eval_step, static_argnames=("setting",))

        from .parallel.mesh import resolve_transfer_dtype

        self.transfer_dtype = resolve_transfer_dtype(config.get("transfer_dtype"))
        self.val_bank, self.test_bank = self._setup_segment_banks()

        self.enhance_via_energy = bool(config.get("enhance_classification_via_energy", False))
        self.num_augmentations = int(config.get("num_augmentations", 10))
        # max_segments_per_clip: 0 is the loader's "unlimited" sentinel —
        # the TTA segment cap must stay positive (it sizes a static axis)
        self.tta_segments_per_clip = int(
            config.get("tta_segments_per_clip")
            or config.get("max_segments_per_clip")
            or 8
        )
        self.tta_mean, self.tta_std = 0.0, 1.0

    def _load_model(self):
        self.rng, init_rng = jax.random.split(self.rng)
        example = next(iter(self.test_loader[0].epoch(0)))
        variables = self.method.init_variables(init_rng, example, self.setting)
        ckpt = None
        if self.result_path:
            cand = os.path.join(self.result_path, "checkpoints", "model_best.pth")
            if os.path.isfile(cand):
                ckpt = cand
        if ckpt:
            variables = load_variables(ckpt, variables)
            self.logger.info("loaded checkpoint %s", ckpt)
        else:
            self.logger.warning("no checkpoint found — evaluating at init")
        return jax.device_put(variables, replicate(self.mesh))

    def _setup_segment_banks(self):
        """Device-resident eval corpus — see data/bank.py."""
        from .data.bank import setup_segment_banks

        loaders = [self.test_loader[0]]
        if self.val_loader is not None:
            loaders.insert(0, self.val_loader[0])
        banks = setup_segment_banks(
            self.config, loaders, self.mesh, self.transfer_dtype, self.logger,
        )
        if self.val_loader is None:
            return None, banks[0]
        return banks[0], banks[1]

    def _eval_step(self, variables, batch, bank, setting: EpisodeSetting):
        from .episode import materialize_episode_batch
        from .parallel.mesh import upcast_floats

        if bank is not None:
            batch = materialize_episode_batch(batch, bank)
        batch = upcast_floats(batch)  # undo transfer_dtype wire compression
        seg_logits = self.method.forward(variables, batch, setting)
        return self.method.eval_episode_accuracy(seg_logits, batch)

    def _tta_eval_step(self, variables, batch, bank, rng, setting: EpisodeSetting):
        return tta_eval_step(
            self.method, variables, batch, rng, setting,
            tta_mean=self.tta_mean, tta_std=self.tta_std,
            num_augmentations=self.num_augmentations,
            tta_segments_per_clip=self.tta_segments_per_clip,
            bank=bank,
        )

    def test_loop(self) -> Tuple[float, float]:
        cfg = self.config
        n_epochs = int(cfg.get("test_epoch", 5))

        energy = self.enhance_via_energy and getattr(
            self.method, "supports_energy_ood", False
        )
        if getattr(self.method, "supports_energy_ood", False):
            self.logger.info("============ Calibration pass on the val set ============")
            dump = (
                os.path.join(self.result_path, "uncertainty_data.npz")
                if self.result_path else None
            )
            th = self.method.calibrate_threshold(
                self.variables, self.val_loader[0], self.setting, self.mesh,
                policy=str(cfg.get("uncertainty_policy", "mean")),
                dump_path=dump, bank=self.val_bank,
            )
            self.logger.info("uncertainty threshold: %s", th)
        if energy:
            self.tta_mean, self.tta_std = resolve_tta_stats(cfg, self.logger)
            self.logger.info(
                "energy-OOD TTA enabled: %d augmentations, top %.0f%% flagged",
                self.num_augmentations, 100 * self.method.ood_fraction,
            )
        rng = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 7)

        epoch_means: List[float] = []
        all_accs: List[float] = []
        from .parallel.mesh import transfer_ahead

        if cfg.get("dump_features", False):
            # reference visualize_features featdata dump + intended t-SNE
            # projection (see utils/features.py) on the first test batch
            if not self.result_path:
                self.logger.warning("dump_features set but no result dir — skipped")
            else:
                from .episode import materialize_episode_batch
                from .parallel.mesh import shard_batch, upcast_floats
                from .utils.features import dump_episode_features

                # single-batch transfer (transfer_ahead would eagerly ship
                # a second, discarded batch through the tunnel)
                wb = shard_batch(
                    next(iter(self.test_loader[0].epoch(0))),
                    self.mesh, self.transfer_dtype,
                )
                if self.test_bank is not None:
                    wb = materialize_episode_batch(wb, self.test_bank)
                dump_episode_features(
                    self.method, self.variables, upcast_floats(wb),
                    self.result_path,
                    normalize=bool(cfg.get("dump_features_normalize", True)),
                    proj_method=str(cfg.get("dump_features_method", "tsne")),
                    logger=self.logger,
                )

        # deep pipelining is safe when in-flight step inputs are int32 bank
        # indices; on the bank-less path every pending step keeps its FULL
        # spectrogram payload live in HBM until execution retires, so cap
        # the window unless the user overrides explicitly (0 = drain every
        # step — an explicit 0 must not fall through to the default)
        configured = cfg.get("eval_queue_depth")
        queue_depth = (
            (32 if self.test_bank is not None else 4)
            if configured is None else int(configured)
        )

        if cfg.get("eval_warmup", True):
            # One discarded execution per DISTINCT batch shape before the
            # timed loop.  Each bucketed shape is its own executable, and
            # through the remote-TPU tunnel an executable's first execution
            # pays server-side compile/load plus the async weight+bank
            # transfers (observed 0.3-150 s, nondeterministic — the server
            # caches executables across processes for a while); folding that
            # into the epoch timer made the reported eps/s meaningless
            # run-to-run.  Logged separately so the one-time cost stays
            # visible.
            t0 = time.time()
            buckets = getattr(self.test_loader[0], "segment_bucket_sizes", None)
            # with explicit buckets every batch shape is one of them; the
            # default power-of-two bucketing can produce several distinct
            # shapes per epoch, so hunt until the shapes stop being new.
            # Either way bound the scan: a tail-cover bucket may never
            # occur in the sampled epoch, and the warmup must not silently
            # walk (and transfer) the whole test epoch hunting for it
            n_expect = max(1, len(buckets)) if buckets else None
            scan_cap = max(8, 4 * (n_expect or 2))
            stale_stop = 3  # unbucketed: stop after 3 batches with no new shape
            scanned = 0
            stale = 0
            seen: set = set()
            for wb in transfer_ahead(
                self.test_loader[0].epoch(0), self.mesh, self.transfer_dtype
            ):
                scanned += 1
                key = tuple(
                    getattr(l, "shape", ()) for l in jax.tree_util.tree_leaves(wb)
                )
                if key in seen:
                    stale += 1
                    done = (
                        len(seen) >= n_expect if n_expect is not None
                        else stale >= stale_stop
                    )
                    if done or scanned >= scan_cap:
                        break
                    continue
                stale = 0
                seen.add(key)
                if energy:
                    out = self._jit_tta_step(
                        self.variables, wb, self.test_bank,
                        jax.random.PRNGKey(0), self.setting,
                    )
                else:
                    out = self._jit_eval_step(
                        self.variables, wb, self.test_bank, self.setting
                    )
                jax.block_until_ready(out)
                if n_expect is not None and len(seen) >= n_expect:
                    break
                if scanned >= scan_cap:
                    break
            self.logger.info(
                "eval step warmed in %.1fs (%d shape(s); compile + "
                "weight/bank transfer)", time.time() - t0, len(seen),
            )

        for epoch in range(n_epochs):
            t0 = time.time()
            accs: List[float] = []
            pending: List[Any] = []

            def drain():
                # one host sync for the whole window — jax dispatch is async,
                # so per-step device_get makes warm eval round-trip-latency
                # bound through the tunnel (BASELINE.md: 87 eps/s at
                # episode_size 4 vs 301 device-side); K-deep pipelining
                # amortizes the latency K×
                for got in jax.device_get(pending):
                    accs.extend(np.asarray(got).ravel().tolist())
                pending.clear()

            for dev_batch in transfer_ahead(
                self.test_loader[0].epoch(epoch), self.mesh, self.transfer_dtype
            ):
                if energy:
                    rng, step_rng = jax.random.split(rng)
                    ep_acc = self._jit_tta_step(
                        self.variables, dev_batch, self.test_bank, step_rng,
                        self.setting,
                    )
                else:
                    ep_acc = self._jit_eval_step(
                        self.variables, dev_batch, self.test_bank, self.setting
                    )
                pending.append(ep_acc)
                if len(pending) >= queue_depth:
                    drain()
            drain()
            mean, ci = mean_confidence_interval(accs)
            n_eps = len(accs)
            dt = time.time() - t0
            self.logger.info(
                "Test epoch %d: Acc@1 %.3f ± %.3f (%d episodes, %.1f eps/s)",
                epoch, mean, ci, n_eps, n_eps / max(dt, 1e-9),
            )
            epoch_means.append(mean)
            all_accs.extend(accs)

        agg_mean, agg_ci = mean_confidence_interval(epoch_means)
        self.logger.info("Aggregated: Acc@1 %.3f ± %.3f over %d epochs", agg_mean, agg_ci, n_epochs)
        return agg_mean, agg_ci
