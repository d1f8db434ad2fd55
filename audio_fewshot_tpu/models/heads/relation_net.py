"""RelationNet — learned relation scorer over concatenated feature maps
(Sung et al., CVPR 2018).

Reference: libfewshot_core/model/metric/relation_net.py — class "proto" map =
SUM of shot feature maps (:158-162), concat with the query map on channels,
score with a 2-conv + 2-fc RelationLayer (:31-60; BN momentum 1 ⇒
batch-stats-only normalization).  The reference's loss path contains leftover
debug ``print/input()`` (:129-131, SURVEY §7.3) — intended behavior
implemented here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..backbones.layers import BatchNorm
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


class RelationLayer(nn.Module):
    """Conv3(VALID)+BN+ReLU+MaxPool2 ×2 → fc(→8)→fc(→1).  BN uses batch
    statistics in train and eval (torch momentum=1 semantics)."""

    feat_dim: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x: [N, 2C, H, W] → NHWC.  sample_mask [N] marks pairs built from
        # real (non-bucket-padded) query rows: the batch-stat BNs restrict
        # statistics to them so eval scores are padding-invariant (the
        # torch reference never pads)
        x = jnp.transpose(x, (0, 2, 3, 1))
        m = None if sample_mask is None else sample_mask[:, None, None, None]
        for i in range(2):
            x = nn.Conv(self.feat_dim, (3, 3), padding="VALID", name=f"conv{i + 1}")(x)
            x = BatchNorm(use_running_statistics=False, name=f"bn{i + 1}")(
                x, train, mask=m)
            x = nn.relu(x)
            if x.shape[1] >= 2 and x.shape[2] >= 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(8, name="fc1")(x))
        return nn.Dense(1, name="fc2")(x)


@CLASSIFIERS.register("RelationNet")
class RelationNet(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, feat_dim: int = 64, feat_height: int = 3,
                 feat_width: int = 3, **kwargs):
        # feat_height/feat_width size the reference's fc layer; the Dense
        # here infers its input size, so they are config-parity-only.
        super().__init__(emb_func, **kwargs)
        self.modules["head"] = RelationLayer(feat_dim=feat_dim)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        c = feats.shape[1]
        pair = jnp.zeros((1, 2 * c) + feats.shape[2:], feats.dtype)
        sub = self.modules["head"].init({"params": rngs["params"]}, pair, train=False)
        self._merge_init(variables, "head", sub)

    def _pairs(self, qry, sup, way, shot):
        """[E,G,c,h,w] × [E,W*S,c,h,w] → [E*G*W, 2c, h, w] pair stack."""
        e, g, c, h, w = qry.shape
        proto = sup.reshape(e, way, shot, c, h, w).sum(axis=2)  # [E,way,c,h,w]
        q = jnp.broadcast_to(qry[:, :, None], (e, g, way, c, h, w))
        p = jnp.broadcast_to(proto[:, None], (e, g, way, c, h, w))
        return jnp.concatenate([q, p], axis=3).reshape(e * g * way, 2 * c, h, w)

    def _logits(self, variables, batch, setting, train, rng=None):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        e, g = qry.shape[:2]
        pairs = self._pairs(qry, sup, setting.way, setting.shot)
        pair_mask = jnp.repeat((batch.query_mask > 0).reshape(-1), setting.way)
        scores, upd2 = self.apply_module(
            variables, "head", pairs, train=train, rng=rng,
            sample_mask=pair_mask,
        )
        seg_logits = scores.reshape(e, g, setting.way)
        return seg_logits, self.merge_updates({}, updates, upd2) if (updates or upd2) else None

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
