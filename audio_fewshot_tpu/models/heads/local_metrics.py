"""Local-descriptor distribution metrics: ADM, ADM_KL, ConvMNet.

Reference: libfewshot_core/model/metric/{adm,adm_kl,convm_net}.py.  All
treat a feature map as a cloud of ``h·w`` local descriptors per segment:

- ADM (adm.py:30-172): class/query Gaussians (mean + regularized covariance)
  → asymmetric KL divergence, combined with a top-k cosine image-to-class
  term through a BatchNorm1d + dilated Conv1d mixer.
- ADM_KL (adm_kl.py:29-155): the KL part alone.
- ConvMNet (convm_net.py:33-101): query-descriptor covariance similarity
  ``diag(q Σ_w qᵀ)`` scored by a strided Conv1d over the way axis.

TPU shape: everything is batched einsum + ``jnp.linalg`` (inverse/slogdet of
64×64 matrices — tiny, batched over episodes×classes); no per-episode loops.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


def _descriptor_moments(feat: jnp.ndarray, eps: float = 0.01):
    """[..., n_local, c] → (mean [..., 1, c], cov [..., c, c]) with +eps·I
    regularization (reference adm.py:41-62)."""
    n = feat.shape[-2]
    mean = jnp.mean(feat, axis=-2, keepdims=True)
    centered = feat - mean
    cov = jnp.einsum("...nc,...nd->...cd", centered, centered) / (n - 1)
    return mean, cov + eps * jnp.eye(feat.shape[-1], dtype=feat.dtype)


def kl_gaussian_batch(q_mean, q_cov, s_mean, s_cov):
    """KL(q ‖ s) for batched Gaussians (reference adm.py:64-110).
    q_*: [E,G,...], s_*: [E,way,...] → [E,G,way]."""
    c = q_mean.shape[-1]
    s_cov_inv = jnp.linalg.inv(s_cov)  # [E,way,c,c]
    mean_diff = s_mean[:, None, :, 0, :] - q_mean[:, :, None, 0, :]  # [E,G,way,c]
    trace = jnp.einsum("egcd,ewdc->egw", q_cov, s_cov_inv)
    maha = jnp.einsum("egwc,ewcd,egwd->egw", mean_diff, s_cov_inv, mean_diff)
    logdet = (
        jnp.linalg.slogdet(s_cov)[1][:, None, :]
        - jnp.linalg.slogdet(q_cov)[1][:, :, None]
    )
    return 0.5 * (trace + maha + logdet - c)


def _to_descriptors(feat_map: jnp.ndarray) -> jnp.ndarray:
    """[E,B,c,h,w] → [E,B,h·w,c]."""
    e, b, c, h, w = feat_map.shape
    return feat_map.reshape(e, b, c, h * w).transpose(0, 1, 3, 2)


def topk_cosine_sim(qd, sd_way, n_k):
    """Top-k cosine image-to-class similarity.  qd [E,G,hw,c] (normalized),
    sd_way [E,way,s·hw,c] (normalized) → [E,G,way]."""
    sim = jnp.einsum("egxc,ewyc->egwxy", qd, sd_way)
    topk, _ = jax.lax.top_k(sim, n_k)
    return jnp.sum(topk, axis=(-2, -1))


class ADMMixer(nn.Module):
    """BatchNorm1d(2·way) over the [kl ‖ cos] concat + dilated Conv1d(k=2,
    dilation=way) that learns a scalar blend per class (reference
    adm.py:39-40,160-166)."""

    way_num: int

    @nn.compact
    def __call__(self, kl_dis: jnp.ndarray, inner_sim: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        e, g, w = kl_dis.shape
        x = jnp.concatenate([kl_dis, inner_sim], axis=-1)  # [E,G,2w]
        # torch BatchNorm1d over the channel (=2w) axis, batch = E·G
        flat = x.reshape(e * g, 2 * w)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="norm")
        flat = bn(flat)
        # Conv1d(1→1, kernel 2, dilation w): out[i] = k0·x[i] + k1·x[i+w]
        # for i in [0, w) — exactly a learned 2-way blend
        kernel = self.param("mix", nn.initializers.normal(0.02), (2,))
        mixed = kernel[0] * flat[:, :w] + kernel[1] * flat[:, w:]
        return mixed.reshape(e, g, w)


@CLASSIFIERS.register("ADM")
class ADM(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, n_k: int = 3, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.n_k = n_k
        self.way_num = int(kwargs.get("way_num", 5))
        self.modules["head"] = ADMMixer(way_num=self.way_num)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        e, g, w = 1, 2, setting.way
        z = jnp.zeros((e, g, w), jnp.float32)
        sub = self.modules["head"].init({"params": rngs["params"]}, z, z, train=False)
        self._merge_init(variables, "head", sub)

    def _scores(self, qry, sup, way, shot):
        e = qry.shape[0]
        c = qry.shape[2]
        hw = qry.shape[3] * qry.shape[4]
        qd = _to_descriptors(qry)  # [E,G,hw,c]
        sd = _to_descriptors(sup).reshape(e, way, shot * hw, c)
        q_mean, q_cov = _descriptor_moments(qd)
        s_mean, s_cov = _descriptor_moments(sd)
        kl_dis = -kl_gaussian_batch(q_mean, q_cov, s_mean, s_cov)
        qn = qd / jnp.maximum(jnp.linalg.norm(qd, axis=-1, keepdims=True), 1e-12)
        sn = sd / jnp.maximum(jnp.linalg.norm(sd, axis=-1, keepdims=True), 1e-12)
        inner = topk_cosine_sim(qn, sn, self.n_k)
        return kl_dis, inner

    def _logits(self, variables, batch, setting, train, rng=None):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        kl_dis, inner = self._scores(qry, sup, setting.way, setting.shot)
        mixed, upd2 = self.apply_module(
            variables, "head", kl_dis, inner, train=train, rng=rng
        )
        merged = self.merge_updates({}, updates, upd2) if (updates or upd2) else None
        return mixed, merged

    def loss(self, variables, batch, setting, rng):
        seg_logits, updates = self._logits(variables, batch, setting, True, rng)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        seg_logits, _ = self._logits(variables, batch, setting, False)
        return seg_logits


@CLASSIFIERS.register("ADM_KL")
class ADMKL(MethodBase):
    """KL-divergence metric alone (reference adm_kl.py KLLayer)."""

    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, n_k: int = 3, CMS: bool = False, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.n_k = n_k
        self.cms = CMS

    def _logits_of(self, qry, sup, way, shot):
        e = qry.shape[0]
        c = qry.shape[2]
        hw = qry.shape[3] * qry.shape[4]
        qd = _to_descriptors(qry)
        sd = _to_descriptors(sup).reshape(e, way, shot * hw, c)
        q_mean, q_cov = _descriptor_moments(qd)
        s_mean, s_cov = _descriptor_moments(sd)
        return -kl_gaussian_batch(q_mean, q_cov, s_mean, s_cov)

    def loss(self, variables, batch, setting, rng):
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        seg_logits = self._logits_of(qry, sup, setting.way, setting.shot)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        return self._logits_of(qry, sup, setting.way, setting.shot)


class ConvMScorer(nn.Module):
    """LeakyReLU → Dropout → Conv1d(kernel=stride=h·w) collapsing each
    class's h·w covariance-similarity diag to one score (reference
    convm_net.py:40-50)."""

    @nn.compact
    def __call__(self, cov_sim: jnp.ndarray, train: bool) -> jnp.ndarray:
        # cov_sim: [E,G,way,hw]
        x = nn.leaky_relu(cov_sim, negative_slope=0.2)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (cov_sim.shape[-1], 1)
        )
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return (x @ kernel)[..., 0] + bias


@CLASSIFIERS.register("ConvMNet")
class ConvMNet(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, n_local: Optional[int] = None, **kwargs):
        # n_local (= h*w, the reference Conv1d kernel size) is derived from
        # the feature map here — accepted for config parity only.
        super().__init__(emb_func, **kwargs)
        self.modules["head"] = ConvMScorer()

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        hw = feats.shape[-2] * feats.shape[-1]
        z = jnp.zeros((1, 2, setting.way, hw), jnp.float32)
        sub = self.modules["head"].init({"params": rngs["params"]}, z, train=False)
        self._merge_init(variables, "head", sub)

    def _cov_sim(self, qry, sup, way, shot):
        e = qry.shape[0]
        c = qry.shape[2]
        hw = qry.shape[3] * qry.shape[4]
        qd = _to_descriptors(qry)
        qd = qd - jnp.mean(qd, axis=-2, keepdims=True)
        sd = _to_descriptors(sup).reshape(e, way, shot * hw, c)
        sd = sd - jnp.mean(sd, axis=-2, keepdims=True)
        cov = jnp.einsum("ewnc,ewnd->ewcd", sd, sd) / (hw - 1)
        # diag(q Σ qᵀ): [E,G,way,hw]
        return jnp.einsum("egxc,ewcd,egxd->egwx", qd, cov, qd)

    def _logits(self, variables, batch, setting, train, rng=None):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        cov_sim = self._cov_sim(qry, sup, setting.way, setting.shot)
        scores, _ = self.apply_module(variables, "head", cov_sim, train=train, rng=rng)
        return scores, updates

    def loss(self, variables, batch, setting, rng):
        seg_logits, updates = self._logits(variables, batch, setting, True, rng)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        seg_logits, _ = self._logits(variables, batch, setting, False)
        return seg_logits
