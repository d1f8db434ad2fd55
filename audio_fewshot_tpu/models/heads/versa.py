"""VERSA — amortized Bayesian few-shot head (Gordon et al., ICLR 2019).

Reference: libfewshot_core/model/meta/versa.py — shared trunk ``h``
(Linear+BN+ReLU), ψ-networks predict per-class weight/bias mean+logvar from
class-mean features (:99-114); MC-sample logits, average by logsumexp, train
loss = −mean task log-likelihood (logsumexp over samples of −CE, :71-81,
with a NaN drop at :73 "FIXME nan").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..backbones.layers import BatchNorm
from ..base import LossOutput, MethodBase, ModelType


class Predictor(nn.Module):
    hid_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.elu(nn.Dense(self.hid_dim)(x))
        x = nn.elu(nn.Dense(self.hid_dim)(x))
        return nn.Dense(self.out_dim)(x)


class VERSAHead(nn.Module):
    d_theta: int = 256
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, feats, train: bool, mask=None):
        # mask [N, 1] bool: rows contributing to the batch-stat BN
        # statistics — bucket-padded query rows must not perturb real rows'
        # normalization (the torch reference only ever sees real segments)
        x = nn.Dense(self.d_theta, name="h_dense")(feats)
        x = BatchNorm(use_running_statistics=False, name="h_bn")(
            x, train, mask=mask
        )
        x = nn.relu(x)
        return nn.Dropout(self.drop_rate, deterministic=not train)(x)


class PsiNets(nn.Module):
    d_theta: int = 256

    @nn.compact
    def __call__(self, class_feat, train: bool = False):
        wm = Predictor(self.d_theta, self.d_theta, name="weight_mean")(class_feat)
        wl = Predictor(self.d_theta, self.d_theta, name="weight_logvar")(class_feat)
        bm = Predictor(self.d_theta, 1, name="bias_mean")(class_feat)
        bl = Predictor(self.d_theta, 1, name="bias_logvar")(class_feat)
        return wm, wl, bm, bl


@CLASSIFIERS.register("VERSA")
class VERSA(MethodBase):
    model_type = ModelType.META

    def __init__(self, emb_func, feat_dim=None, sample_num: int = 10,
                 d_theta: int = 256, drop_rate: float = 0.0, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.sample_num = sample_num
        self.d_theta = d_theta
        self.modules["head"] = VERSAHead(d_theta=d_theta, drop_rate=drop_rate)
        self.modules["psi"] = PsiNets(d_theta=d_theta)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        sub = self.modules["head"].init(
            {"params": rngs["params"], "dropout": rngs["dropout"]},
            feats[:2], train=False,
        )
        self._merge_init(variables, "head", sub)
        z = jnp.zeros((1, setting.way, self.d_theta), jnp.float32)
        sub = self.modules["psi"].init({"params": rngs["params"]}, z)
        self._merge_init(variables, "psi", sub)

    def _logit_distribution(self, variables, batch, setting, train, rng):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        e, ws, d = sup.shape
        g = qry.shape[1]
        flat = jnp.concatenate([sup.reshape(-1, d), qry.reshape(-1, d)], axis=0)
        # padded query rows stay out of the batch-stat BN statistics
        row_mask = jnp.concatenate([
            jnp.ones((e * ws,), bool),
            (batch.query_mask > 0).reshape(-1),
        ])[:, None]
        h, upd2 = self.apply_module(
            variables, "head", flat, train=train, rng=rng, mask=row_mask
        )
        sup_h = h[: e * ws].reshape(e, ws, -1)
        qry_h = h[e * ws:].reshape(e, g, -1)
        class_feat = sup_h.reshape(e, setting.way, setting.shot, -1).mean(axis=2)
        (wm, wl, bm, bl), _ = self.apply_module(variables, "psi", class_feat)
        # weight: [E, d_theta, way]; bias: [E, 1, way]
        wm, wl = wm.transpose(0, 2, 1), wl.transpose(0, 2, 1)
        bm, bl = bm.transpose(0, 2, 1), bl.transpose(0, 2, 1)
        mean = jnp.einsum("egd,edw->egw", qry_h, wm) + bm
        logvar = jnp.log(
            jnp.einsum("egd,edw->egw", qry_h ** 2, jnp.exp(wl)) + jnp.exp(bl)
        )
        merged = self.merge_updates({}, updates, upd2) if (updates or upd2) else None
        return mean, logvar, merged

    def _sample_logits(self, mean, logvar, rng):
        eps = jax.random.normal(rng, (self.sample_num,) + mean.shape)
        return mean[None] + eps * jnp.exp(0.5 * logvar)[None]  # [S,E,G,way]

    def loss(self, variables, batch, setting, rng):
        r_embed, r_sample = jax.random.split(rng)
        mean, logvar, updates = self._logit_distribution(
            variables, batch, setting, True, r_embed
        )
        samples = self._sample_logits(mean, logvar, r_sample)
        targets = segment_targets(batch)
        logp = jax.nn.log_softmax(samples, axis=-1)
        ll = jnp.take_along_axis(
            logp, targets[None, ..., None], axis=-1
        )[..., 0]  # [S,E,G]
        task_score = jax.nn.logsumexp(ll, axis=0) - jnp.log(float(self.sample_num))
        task_score = jnp.where(jnp.isnan(task_score), 0.0, task_score)  # ref :73
        mask = batch.query_mask
        loss = -jnp.sum(task_score * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        seg_logits = jax.nn.logsumexp(samples, axis=0) - jnp.log(float(self.sample_num))
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        mean, logvar, _ = self._logit_distribution(variables, batch, setting, False, None)
        samples = self._sample_logits(mean, logvar, jax.random.PRNGKey(0))
        return jax.nn.logsumexp(samples, axis=0) - jnp.log(float(self.sample_num))
