"""DN4 — local-descriptor k-nearest-neighbor matching (Li et al., CVPR 2019).

Reference: libfewshot_core/model/metric/dn4.py (DN4Layer :34-75): normalize
local descriptors, per (query position × class) similarity against all
``shot·h·w`` support descriptors, sum the top-``n_k``.

TPU shape: one ``[E,G,hw,c] × [E,way,c,s·hw]`` einsum (MXU) +
``jax.lax.top_k`` over the last axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


def dn4_logits(query_feat, support_feat, way, shot, n_k):
    """query_feat [E,G,c,h,w], support_feat [E,W*S,c,h,w] → [E,G,way]."""
    e, g, c, h, w = query_feat.shape
    hw = h * w
    q = query_feat.reshape(e, g, c, hw).transpose(0, 1, 3, 2)  # [E,G,hw,c]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)

    s = support_feat.reshape(e, way, shot, c, hw)
    s = s.transpose(0, 1, 3, 2, 4).reshape(e, way, c, shot * hw)
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=2, keepdims=True), 1e-12)

    # [E,G,way,hw,s·hw]
    rel = jnp.einsum("egxc,ewcy->egwxy", q, s)
    topk, _ = jax.lax.top_k(rel, n_k)
    return jnp.sum(topk, axis=(-2, -1))


@CLASSIFIERS.register("DN4")
class DN4(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, n_k: int = 3, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.n_k = n_k

    def loss(self, variables, batch, setting, rng):
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        seg_logits = dn4_logits(qry, sup, setting.way, setting.shot, self.n_k)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        return dn4_logits(qry, sup, setting.way, setting.shot, self.n_k)
