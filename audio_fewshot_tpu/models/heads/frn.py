"""FRN — Feature-map Ridge-regression Reconstruction Networks
(Wertheimer et al., CVPR 2021).

Reference: libfewshot_core/model/metric/frn.py — each query's local
descriptors are reconstructed from each class's support descriptor pool via
ridge regression (Woodbury identity, :46-93); logit = −mean reconstruction
error × learnable scale; learnable log-λ/log-ρ in ``self.r``; auxiliary
``auxrank`` loss (:201) pushes same-class descriptor similarity above
cross-class.  The reference hard-codes ``resolution = 72`` (:31) — here the
resolution is taken from the feature map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


class FRNParams(nn.Module):
    @nn.compact
    def __call__(self, train: bool = False):
        scale = self.param("scale", lambda r: jnp.asarray(1.0, jnp.float32))
        r = self.param("r", nn.initializers.zeros, (2,))
        return scale, r


def frn_recon_dist(query_d, support_d, alpha, beta):
    """Reconstruction distance via the Woodbury form (reference frn.py:46-93).

    query_d: [E, Gr, d] pooled query descriptors (Gr = G·resolution),
    support_d: [E, way, sr, d].  Returns [E, Gr, way].
    """
    sr, d = support_d.shape[-2:]
    reg = sr / d
    lam = reg * jnp.exp(alpha) + 1e-6
    rho = jnp.exp(beta)
    sts = jnp.einsum("bwnd,bwnf->bwdf", support_d, support_d)  # [E,way,d,d]
    eye = jnp.eye(d, dtype=sts.dtype)
    hat = jnp.linalg.solve(sts + lam * eye, sts)  # (StS+λI)⁻¹ StS
    q_bar = jnp.einsum("bgd,bwdf->bgwf", query_d, hat) * rho
    diff = q_bar - query_d[:, :, None, :]
    return jnp.sum(diff * diff, axis=-1)  # [E,Gr,way]


def auxrank_loss(support_d, way):
    """Auxiliary ranking loss (reference frn.py:201 ``auxrank``): mean
    squared cross-class descriptor similarity of L2-normalized support
    pools."""
    sn = support_d / jnp.maximum(
        jnp.linalg.norm(support_d, axis=-1, keepdims=True), 1e-12
    )
    sim = jnp.einsum("ewnd,evmd->ewvnm", sn, sn)
    mask = 1.0 - jnp.eye(way)
    cross = sim * mask[None, :, :, None, None]
    return jnp.sum(cross ** 2) / (sim.shape[0] * way * (way - 1) + 1e-9)


@CLASSIFIERS.register("FRN")
class FRN(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, aux_weight: float = 0.03, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.aux_weight = aux_weight
        self.modules["head"] = FRNParams()

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        sub = self.modules["head"].init({"params": rngs["params"]})
        self._merge_init(variables, "head", sub)

    @staticmethod
    def _pools(qry, sup, way, shot):
        e, g, c, h, w = qry.shape
        hw = h * w
        qd = qry.reshape(e, g, c, hw).transpose(0, 1, 3, 2)  # [E,G,hw,c]
        sd = sup.reshape(e, way, shot, c, hw).transpose(0, 1, 2, 4, 3)
        sd = sd.reshape(e, way, shot * hw, c)
        return qd, sd, hw

    def _logits(self, variables, batch, setting, train, rng=None):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        (scale, r), _ = self.apply_module(variables, "head")
        qd, sd, hw = self._pools(qry, sup, setting.way, setting.shot)
        e, g = qd.shape[:2]
        dist = frn_recon_dist(
            qd.reshape(e, g * hw, -1), sd, r[0], r[1]
        ).reshape(e, g, hw, setting.way)
        neg = -dist.mean(axis=2) * scale  # [E,G,way]
        return neg, sd, updates

    def loss(self, variables, batch, setting, rng):
        seg_logits, sd, updates = self._logits(variables, batch, setting, True, rng)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        loss = loss + self.aux_weight * auxrank_loss(sd, setting.way)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        seg_logits, _, _ = self._logits(variables, batch, setting, False)
        return seg_logits
