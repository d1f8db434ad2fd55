"""ProtoNet — Prototypical Networks (Snell et al., NeurIPS 2017).

Reference: libfewshot_core/model/metric/proto_net.py.  The reference's
``ProtoLayer`` (proto_net.py:30-64) computes class-mean prototypes and either
negative squared-euclidean or cosine logits; eval loops over episodes in
Python (proto_net.py:107-113).  Here both train and eval are one batched
einsum over the episode axis — the ragged query axis is already dense+masked.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ...episode import EpisodeBatch, segment_targets
from ...registry import CLASSIFIERS
from ..base import EpisodeSetting, LossOutput, MethodBase, ModelType, masked_cross_entropy


def neg_sq_euclidean(query_feat: jnp.ndarray, proto: jnp.ndarray) -> jnp.ndarray:
    """−‖q − p‖² via 2q·p − ‖q‖² − ‖p‖² — one MXU matmul instead of the
    [E,G,way,D] difference tensor.  HIGHEST precision: the bf16 default
    rounds the cross term differently from the exact squared norms."""
    qp = jnp.einsum("egd,ewd->egw", query_feat, proto,
                    precision=jax.lax.Precision.HIGHEST)
    q2 = jnp.sum(query_feat * query_feat, axis=-1)[..., None]
    p2 = jnp.sum(proto * proto, axis=-1)[:, None, :]
    return 2.0 * qp - q2 - p2


def prototypes(support_feat: jnp.ndarray, way: int, shot: int) -> jnp.ndarray:
    """Class-mean prototypes [E, way, D] from way-major support [E, way*shot, D]."""
    e, ws, d = support_feat.shape
    return support_feat.reshape(e, way, shot, d).mean(axis=2)


def proto_logits(
    query_feat: jnp.ndarray,
    support_feat: jnp.ndarray,
    way: int,
    shot: int,
    mode: str = "euclidean",
) -> jnp.ndarray:
    """[E, G, way] logits (reference ProtoLayer modes, proto_net.py:52-64)."""
    proto = prototypes(support_feat, way, shot)
    if mode == "euclidean":
        return neg_sq_euclidean(query_feat, proto)
    if mode == "cos_sim":
        qn = query_feat / jnp.maximum(
            jnp.linalg.norm(query_feat, axis=-1, keepdims=True), 1e-12
        )
        pn = proto / jnp.maximum(jnp.linalg.norm(proto, axis=-1, keepdims=True), 1e-12)
        return jnp.einsum("egd,ewd->egw", qn, pn)
    raise ValueError(f"unknown proto mode {mode!r}")


def apply_bpa(sup: jnp.ndarray, qry: jnp.ndarray,
              query_mask: jnp.ndarray = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optional BPA self-OT feature transform over each episode's
    [support ‖ query] set (reference wires BPA behind disabled switches at
    proto_net.py:142 / deepbdc.py:284; live here via ``use_bpa``).
    ``query_mask`` keeps padded ragged-eval segments out of the transport
    marginals."""
    from ...ops.bpa import bpa_transform

    ws = sup.shape[1]
    feats = jnp.concatenate([sup, qry], axis=1)
    row_mask = None
    if query_mask is not None:
        row_mask = jnp.concatenate(
            [jnp.ones(sup.shape[:2], query_mask.dtype), query_mask], axis=1
        )
    affin = bpa_transform(feats, distance="cosine", row_mask=row_mask)
    return affin[:, :ws], affin[:, ws:]


@CLASSIFIERS.register("ProtoNet")
class ProtoNet(MethodBase):
    model_type = ModelType.METRIC

    def __init__(self, emb_func, mode: str = "euclidean", use_bpa: bool = False,
                 **kwargs):
        super().__init__(emb_func, **kwargs)
        self.mode = mode
        self.use_bpa = use_bpa

    def loss(
        self,
        variables: Dict[str, Any],
        batch: EpisodeBatch,
        setting: EpisodeSetting,
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, LossOutput]:
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        if self.use_bpa:
            sup, qry = apply_bpa(sup, qry, batch.query_mask)
        seg_logits = proto_logits(qry, sup, setting.way, setting.shot, self.mode)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(
        self, variables: Dict[str, Any], batch: EpisodeBatch, setting: EpisodeSetting
    ) -> jnp.ndarray:
        sup, qry, _ = self.embed(variables, batch, train=False)
        if self.use_bpa:
            sup, qry = apply_bpa(sup, qry, batch.query_mask)
        return proto_logits(qry, sup, setting.way, setting.shot, self.mode)
