"""DeepBDC — prototypes over Brownian-distance-covariance features, plus the
framework's energy-based OOD detection machinery.

Reference: libfewshot_core/model/metric/deepbdc.py — ProtoLayer switching
euclidean (shot > 1) ↔ dot-product (1-shot) at :37-53; energy uncertainty
``-logsumexp(avg_logits)`` (:319), validation-calibrated threshold = mean of
per-batch 95 % quantiles over *correct* predictions (:381-442, 'mean'
policy), top-20 % most-uncertain queries flagged OOD (:343-344).  The TTA
re-classification loop lives in the Test harness (reference test.py:331-500).

TPU design: the per-episode Python loop (:302-307) is one einsum; the
calibration pass is a jitted scan over the val loader with host-side
quantile bookkeeping (tiny arrays).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...episode import EpisodeBatch, segment_targets
from ...registry import CLASSIFIERS
from ...utils.aggregate import average_logits, majority_vote
from ..base import EpisodeSetting, LossOutput, MethodBase, ModelType, masked_cross_entropy
from .proto_net import neg_sq_euclidean, prototypes


def bdc_proto_logits(query_feat, support_feat, way, shot):
    """Euclid for multi-shot, raw dot-product for 1-shot (reference
    deepbdc.py:37-53 — unnormalized on purpose)."""
    proto = prototypes(support_feat, way, shot)
    if shot > 1:
        return neg_sq_euclidean(query_feat, proto)
    return jnp.einsum("egd,ewd->egw", query_feat, proto)


@CLASSIFIERS.register("DeepBDC")
class DeepBDC(MethodBase):
    model_type = ModelType.METRIC
    supports_energy_ood = True
    #: fraction of most-uncertain queries flagged OOD (reference :343-344)
    ood_fraction = 0.2

    def __init__(self, emb_func, use_bpa: bool = False, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.use_bpa = use_bpa
        self.uncertain_global_threshold: Optional[float] = None
        self.uncertains_mean: Optional[float] = None
        self.uncertains_std: Optional[float] = None

    # -- core ---------------------------------------------------------------

    def loss(self, variables, batch, setting, rng):
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        if self.use_bpa:
            from .proto_net import apply_bpa

            sup, qry = apply_bpa(sup, qry, batch.query_mask)
        seg_logits = bdc_proto_logits(qry, sup, setting.way, setting.shot)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        if self.use_bpa:
            from .proto_net import apply_bpa

            sup, qry = apply_bpa(sup, qry, batch.query_mask)
        return bdc_proto_logits(qry, sup, setting.way, setting.shot)

    def feature_logits(self, sup_feat, qry_feat, setting):
        """Head over precomputed features — the TTA re-classification hook
        (reference test.py:412-420 re-runs the whole model; here augmented
        segments reuse the episode's support features)."""
        return bdc_proto_logits(qry_feat, sup_feat, setting.way, setting.shot)

    def embed_segments(self, variables, segments):
        """Backbone features of raw segments [N, C, H, W] → [N, D]."""
        feats, _ = self.apply_module(variables, "emb_func", segments, train=False)
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        return feats

    # -- energy OOD ---------------------------------------------------------

    def clip_uncertainty(self, seg_logits, batch: EpisodeBatch):
        """Per-clip energy uncertainty ``-logsumexp(avg logits)`` and
        majority-vote correctness.  Returns ([E,Wq] uncertainty,
        [E,Wq] bool correct)."""
        nq = batch.num_query_clips
        avg = average_logits(seg_logits, batch.query_clip, batch.query_mask, nq)
        uncertains = -jax.nn.logsumexp(avg, axis=-1)
        preds = majority_vote(seg_logits, batch.query_clip, batch.query_mask, nq)
        return uncertains, preds == batch.query_target

    def calibrate_threshold(self, variables, loader, setting: EpisodeSetting,
                            mesh, policy: str = "mean",
                            dump_path: Optional[str] = None,
                            bank=None) -> Optional[float]:
        """Validation calibration pass (reference test.py:188 →
        deepbdc.py:381-442).  'mean' policy: threshold = mean over batches of
        the 95 % quantile of correct-prediction uncertainties.
        ``dump_path``: write the reference's ``uncertainty_data.npz`` side
        artifact (deepbdc.py:421)."""
        from ...episode import materialize_episode_batch
        from ...parallel import shard_batch

        @jax.jit
        def step(variables, batch, bank):
            if bank is not None:
                batch = materialize_episode_batch(batch, bank)
            from ...parallel.mesh import upcast_floats

            batch = upcast_floats(batch)
            seg_logits = self.forward(variables, batch, setting)
            return self.clip_uncertainty(seg_logits, batch)

        # dispatch asynchronously with a bounded window, draining every
        # `depth` steps — per-step device_get makes the calibration pass
        # tunnel-round-trip bound, but an UNbounded dispatch keeps every
        # in-flight batch's payload live in HBM until its execution
        # retires (OOM risk on the bank-less path, where whole
        # spectrogram payloads ride each step; with a bank the in-flight
        # inputs are just int32 indices and the window can be deep)
        depth = 32 if bank is not None else 4
        thresholds, means, stds = [], [], []
        all_u, all_ok = [], []

        def drain(pending):
            for u, ok in jax.device_get(pending):
                u = np.asarray(u).ravel()
                ok = np.asarray(ok).ravel()
                all_u.append(u)
                all_ok.append(ok)
                means.append(u.mean())
                stds.append(u.std())
                correct = u[ok]
                if correct.size:
                    thresholds.append(np.quantile(correct, 0.95))
            pending.clear()

        pending = []
        for batch in loader.epoch(0):
            pending.append(step(variables, shard_batch(batch, mesh), bank))
            if len(pending) >= depth:
                drain(pending)
        drain(pending)
        if dump_path:
            np.savez(dump_path, uncertains=np.asarray(all_u, dtype=object),
                     is_corrects=np.asarray(all_ok, dtype=object))
        if not thresholds:
            return None
        if policy == "overall":
            # pooled 95 % quantile over ALL correct-prediction uncertainties
            # (reference deepbdc.py:387-402), with correctness-conditioned
            # mean/std
            pooled_u = np.concatenate(all_u)
            pooled_ok = np.concatenate(all_ok)
            correct_all = pooled_u[pooled_ok]
            self.uncertain_global_threshold = float(np.quantile(correct_all, 0.95))
            self.uncertains_mean = float(correct_all.mean())
            self.uncertains_std = float(correct_all.std())
        else:
            self.uncertain_global_threshold = float(np.mean(thresholds))
            self.uncertains_mean = float(np.mean(means))
            self.uncertains_std = float(np.mean(stds))
        return self.uncertain_global_threshold

    def ood_topk(self, uncertains: jnp.ndarray):
        """Flat indices of the top-20 % most-uncertain query clips
        (reference deepbdc.py:343-344).  Static count → XLA top_k.
        The single source of the flagging policy — the TTA harness and
        ``ood_mask`` both derive from it."""
        flat = uncertains.reshape(-1)
        k = max(1, int(self.ood_fraction * flat.shape[0]))
        _, top_idx = jax.lax.top_k(flat, k)
        return top_idx

    def ood_mask(self, uncertains: jnp.ndarray) -> jnp.ndarray:
        """Boolean [E, Wq] mask form of ``ood_topk``."""
        top_idx = self.ood_topk(uncertains)
        flat = jnp.zeros(uncertains.size, bool).at[top_idx].set(True)
        return flat.reshape(uncertains.shape)
