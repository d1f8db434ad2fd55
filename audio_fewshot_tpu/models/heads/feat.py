"""FEAT — few-shot embedding adaptation with a set-to-set transformer
(Ye et al., CVPR 2020).

Reference: libfewshot_core/model/metric/feat.py — single-head self-attention
(MultiHeadAttention :74-128, residual + LayerNorm) adapts the prototypes;
logits = temperature-scaled metric vs adapted protos (:233-246); training
adds a contrastive regularizer: attention over each class's (shot+query)
members, samples classified against the adapted class centers with
temperature2 (:248-290), loss = balance·CE + CE_reg.

The reference train path unpacks 4 values from the 5-tuple
``split_by_episode`` and is broken as snapshotted (SURVEY §7.3) — intended
behavior implemented here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy
from ..losses import cross_entropy
from .proto_net import neg_sq_euclidean, prototypes


class SetAttention(nn.Module):
    """Single-head set-to-set attention: scaled dot-product + dropout,
    residual, LayerNorm (reference MultiHeadAttention with n_head=1).

    Dropout rates mirror the reference exactly: 0.1 on the attention
    matrix (ScaledDotProductAttention's attn_dropout default, feat.py:58)
    and 0.5 after the output projection (FEAT passes dropout=0.5,
    feat.py:137)."""

    hdim: int
    dropout: float = 0.5
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # x: [..., n, d] — attention width follows the actual feature dim
        # (reference requires hdim == backbone feat dim; derived here)
        d = x.shape[-1]
        q = nn.Dense(d, name="w_q", use_bias=False)(x)
        k = nn.Dense(d, name="w_k", use_bias=False)(x)
        v = nn.Dense(d, name="w_v", use_bias=False)(x)
        attn = jax.nn.softmax(
            jnp.einsum("...nd,...md->...nm", q, k) / jnp.sqrt(jnp.float32(d)), axis=-1
        )
        attn = nn.Dropout(self.attn_dropout, deterministic=not train)(attn)
        out = jnp.einsum("...nm,...md->...nd", attn, v)
        out = nn.Dense(d, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        # torch nn.LayerNorm eps (1e-5; flax defaults to 1e-6)
        return nn.LayerNorm(name="ln", epsilon=1e-5)(out + x)


def metric_logits(query, proto, mode, temperature):
    if mode == "euclidean":
        return neg_sq_euclidean(query, proto) / temperature
    qn = query / jnp.maximum(jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12)
    pn = proto / jnp.maximum(jnp.linalg.norm(proto, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("egd,ewd->egw", qn, pn) / temperature


@CLASSIFIERS.register("FEAT")
class FEAT(MethodBase):
    model_type = ModelType.METRIC

    def __init__(self, emb_func, hdim: int = 64, temperature: float = 1.0,
                 temperature2: float = 1.0, balance: float = 0.5,
                 mode: str = "euclidean", **kwargs):
        # kwarg defaults = the reference's shipped audio config values
        # (/root/reference/config/feat.yaml:17-22 and
        # config/classifiers/FEAT.yaml — the reference class itself has no
        # defaults); note the reference weights the EPISODIC term by
        # ``balance`` (loss = balance*CE + CE_reg, feat.py:230), inverting
        # the FEAT paper — the image-paper values (64/16/0.1) underfit
        # under that weighting
        super().__init__(emb_func, **kwargs)
        self.hdim = hdim
        self.temperature = float(temperature)
        self.temperature2 = float(temperature2)
        self.balance = float(balance)
        self.mode = mode
        self.modules["head"] = SetAttention(hdim=hdim)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        z = jnp.zeros((1, setting.way, feats.shape[-1]), jnp.float32)
        sub = self.modules["head"].init(
            {"params": rngs["params"], "dropout": rngs["dropout"]}, z, train=False
        )
        self._merge_init(variables, "head", sub)

    def _adapted_logits(self, variables, sup, qry, setting, train, rng):
        proto = prototypes(sup, setting.way, setting.shot)
        proto, _ = self.apply_module(variables, "head", proto, train=train, rng=rng)
        return metric_logits(qry, proto, self.mode, self.temperature)

    def loss(self, variables, batch, setting, rng):
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        seg_logits = self._adapted_logits(variables, sup, qry, setting, True, rng)
        loss1 = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)

        # contrastive regularizer over way-major [shot | query] class groups
        e = sup.shape[0]
        way, shot = setting.way, setting.shot
        q_per = qry.shape[1] // way
        d = sup.shape[-1]
        sup_g = sup.reshape(e, way, shot, d)
        qry_g = qry.reshape(e, way, q_per, d)
        aux = jnp.concatenate([sup_g, qry_g], axis=2)  # [E,way,s+q,d]
        aux_emb, _ = self.apply_module(
            variables, "head", aux.reshape(e * way, shot + q_per, d),
            train=True, rng=rng,
        )
        centers = aux_emb.reshape(e, way, shot + q_per, d).mean(axis=2)
        samples = aux.reshape(e, way * (shot + q_per), d)
        reg_logits = metric_logits(samples, centers, self.mode, self.temperature2)
        reg_targets = jnp.broadcast_to(
            jnp.repeat(jnp.arange(way), shot + q_per)[None], reg_logits.shape[:2]
        )
        loss_reg = cross_entropy(reg_logits.reshape(-1, way), reg_targets.reshape(-1))

        loss = self.balance * loss1 + loss_reg
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        return self._adapted_logits(variables, sup, qry, setting, False, None)
