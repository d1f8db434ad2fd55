"""MCL — Mutual Centralized Learning via bipartite Katz random walks
(Liu et al., CVPR 2022).

Reference: libfewshot_core/model/metric/mcl.py — cosine similarity between
query local descriptors and class-averaged support maps forms a bipartite
graph; row-softmax transition matrices in both directions; the Katz
centrality ``((I − αT)⁻¹ − I)·1`` of support nodes, summed per class, is the
prediction (bipartite_katz_forward :145-165, dense ``torch.inverse``).

TPU shape: one batched ``jnp.linalg.solve`` over the [E·G] small
``(M_s+M_q)²`` systems instead of explicit inverses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


def _bipartite_similarity(query_feat, support_feat, way, shot):
    """Cosine similarity between query local descriptors and class-averaged
    support maps (averaging_based_similarities, mcl.py:134-143):
    query [E,G,c,h,w], support [E,W*S,c,h,w] → S [E,G,hw,way·hw]."""
    e, g, c, h, w = query_feat.shape
    hw = h * w
    sup = support_feat.reshape(e, way, shot, c, hw).mean(axis=2)  # [E,way,c,hw]
    sup = sup / jnp.maximum(jnp.linalg.norm(sup, axis=2, keepdims=True), 1e-12)
    qry = query_feat.reshape(e, g, c, hw)
    qry = qry / jnp.maximum(jnp.linalg.norm(qry, axis=2, keepdims=True), 1e-12)
    return jnp.einsum("egcx,ewcy->egxwy", qry, sup).reshape(e, g, hw, way * hw)


def _katz_vector(s_mat, katz_factor, gamma, gamma2):
    """Katz centrality ``((I − αT)⁻¹ − I)·1`` of the bipartite graph built
    from ``s_mat [..., M_q, M_s]`` (bipartite_katz_forward, mcl.py:145-165) →
    ``[..., M_s + M_q]`` (support nodes first)."""
    m_q, m_s = s_mat.shape[-2], s_mat.shape[-1]
    lead = s_mat.shape[:-2]
    t_sq = jax.nn.softmax(gamma * s_mat, axis=-1)  # rows over support
    t_qs = jax.nn.softmax(gamma2 * jnp.swapaxes(s_mat, -1, -2), axis=-1)

    n = m_s + m_q
    top = jnp.concatenate(
        [jnp.zeros(lead + (m_s, m_s)), jnp.swapaxes(t_sq, -1, -2)], axis=-1
    )
    bottom = jnp.concatenate(
        [jnp.swapaxes(t_qs, -1, -2), jnp.zeros(lead + (m_q, m_q))], axis=-1
    )
    t_full = jnp.concatenate([top, bottom], axis=-2)  # [..., n, n]

    eye = jnp.eye(n)
    ones = jnp.ones(lead + (n, 1))
    return jnp.linalg.solve(eye - katz_factor * t_full, ones)[..., 0] - 1.0


def mcl_logits(query_feat, support_feat, way, shot, katz_factor=0.5,
               gamma=20.0, gamma2=10.0):
    """query [E,G,c,h,w], support [E,W*S,c,h,w] → [E,G,way] (probabilities:
    Katz mass per class; the reference trains with NLL over their log)."""
    hw = query_feat.shape[-2] * query_feat.shape[-1]
    s_mat = _bipartite_similarity(query_feat, support_feat, way, shot)
    katz = _katz_vector(s_mat, katz_factor, gamma, gamma2)
    sup_katz = katz[..., : way * hw]
    sup_katz = sup_katz / jnp.maximum(
        jnp.sum(sup_katz, axis=-1, keepdims=True), 1e-12
    )
    e, g = s_mat.shape[:2]
    return sup_katz.reshape(e, g, way, hw).sum(axis=-1)


def katz_query_mask(query_feat, support_feat, way, shot, katz_factor,
                    gamma, gamma2):
    """Reference ``MCLMask`` (mcl.py:78-121): the QUERY nodes' Katz
    centrality, normalized to sum 1 over positions → [E,G,h·w] weights
    (consumed by R2D2MCL's mask-weighted query pooling, r2d2_mcl.py:157-160)."""
    hw = query_feat.shape[-2] * query_feat.shape[-1]
    s_mat = _bipartite_similarity(query_feat, support_feat, way, shot)
    katz = _katz_vector(s_mat, katz_factor, gamma, gamma2)
    q_katz = katz[..., way * hw:]
    return q_katz / jnp.maximum(jnp.sum(q_katz, axis=-1, keepdims=True), 1e-12)


@CLASSIFIERS.register("MCL")
class MCL(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, n_k: int = 1, katz_factor: float = 0.5,
                 gamma: float = 20.0, gamma2: float = 10.0, **kwargs):
        # n_k is accepted for config parity; the reference MCLLayer stores
        # it but the katz path never reads it either (mcl.py:124-131).
        super().__init__(emb_func, **kwargs)
        self.katz_factor = katz_factor
        self.gamma = gamma
        self.gamma2 = gamma2

    def _logits(self, qry, sup, setting):
        probs = mcl_logits(qry, sup, setting.way, setting.shot,
                           self.katz_factor, self.gamma, self.gamma2)
        # log-probabilities (reference trains NLLLoss on log of katz mass)
        return jnp.log(jnp.maximum(probs, 1e-12))

    def loss(self, variables, batch, setting, rng):
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        seg_logits = self._logits(qry, sup, setting)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        return self._logits(qry, sup, setting)
