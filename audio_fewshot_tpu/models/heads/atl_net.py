"""ATLNet — episodic attention + adaptive threshold local matching
(Dong et al., IJCAI 2020).

Reference: libfewshot_core/model/metric/atl_net.py — a shared 1×1-conv+BN
transform W over feature maps, cosine matching of query descriptors against
all support descriptors, and an AEAModule (:31-60) producing a per-query-
descriptor adaptive threshold via an MLP; the thresholded, L1-normalized
attention re-weights the match scores; score = Σ_support-hw, mean over
(shot, query-hw), × scale (:130-153).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..backbones.layers import BatchNorm
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


class ATLModule(nn.Module):
    """W transform + AEA adaptive-threshold attention."""

    feat_dim: int
    scale_value: float = 30.0
    atten_scale_value: float = 50.0
    from_value: float = 0.5
    value_interval: float = 0.3

    @nn.compact
    def __call__(self, query_feat, support_feat, way, shot, train: bool):
        e, g, c, h, w = query_feat.shape
        ws = support_feat.shape[1]
        hw = h * w

        # W is SHARED between query and support (reference self.W) — build
        # the submodules once, apply twice
        w_conv = nn.Conv(self.feat_dim, (1, 1), use_bias=False, name="w_conv")
        w_bn = BatchNorm(name="w_bn")

        def w_transform(x, n):
            # [E,n,c,h,w] → 1×1 conv + BN + leaky over NHWC
            y = x.reshape(e * n, c, h, w).transpose(0, 2, 3, 1)
            y = nn.leaky_relu(w_bn(w_conv(y), train), 0.2)
            return y.transpose(0, 3, 1, 2).reshape(e, n, self.feat_dim, hw)

        # attention path (transformed + normalized)
        wq = w_transform(query_feat, g).transpose(0, 1, 3, 2)  # [E,G,hw,c]
        wq = wq / jnp.maximum(jnp.linalg.norm(wq, axis=-1, keepdims=True), 1e-12)
        wsup = w_transform(support_feat, ws).transpose(0, 2, 1, 3).reshape(
            e, self.feat_dim, ws * hw
        )
        wsup = wsup / jnp.maximum(jnp.linalg.norm(wsup, axis=1, keepdims=True), 1e-12)
        f_x = jnp.einsum("egxc,ecy->egxy", wq, wsup)  # [E,G,hw,ws·hw]

        # AEA: per-descriptor threshold from an MLP (f_psi)
        t = nn.Dense(self.feat_dim // 16, name="psi1")(wq)
        t = nn.leaky_relu(t, 0.2)
        t = jax.nn.sigmoid(nn.Dense(1, name="psi2")(t))
        clamp = t * self.value_interval + self.from_value  # [E,G,hw,1]
        gate = jax.nn.sigmoid(self.atten_scale_value * (f_x - clamp))
        atten = gate / jnp.maximum(jnp.sum(gate, axis=-1, keepdims=True), 1e-12)

        # raw cosine matching on untransformed features
        q = query_feat.reshape(e, g, c, hw).transpose(0, 1, 3, 2)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        s = support_feat.reshape(e, ws, c, hw).transpose(0, 2, 1, 3).reshape(
            e, c, ws * hw
        )
        s = s / jnp.maximum(jnp.linalg.norm(s, axis=1, keepdims=True), 1e-12)
        match = jnp.einsum("egxc,ecy->egxy", q, s)

        scored = (atten * match).reshape(e, g, hw, way, shot, hw)
        scored = jnp.sum(scored, axis=-1)  # over support hw
        return jnp.mean(scored, axis=(2, 4)) * self.scale_value  # [E,G,way]


@CLASSIFIERS.register("ATLNet")
class ATLNet(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, feat_dim: int = 64, scale_value: float = 30.0,
                 atten_scale_value: float = 50.0, from_value: float = 0.5,
                 value_interval: float = 0.3, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.modules["head"] = ATLModule(
            feat_dim=feat_dim, scale_value=scale_value,
            atten_scale_value=atten_scale_value, from_value=from_value,
            value_interval=value_interval,
        )

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        c, h, w = feats.shape[1:]
        q = jnp.zeros((1, 2, c, h, w), jnp.float32)
        s = jnp.zeros((1, setting.way * setting.shot, c, h, w), jnp.float32)
        sub = self.modules["head"].init(
            {"params": rngs["params"]}, q, s, setting.way, setting.shot,
            train=False,
        )
        self._merge_init(variables, "head", sub)

    def _logits(self, variables, batch, setting, train, rng=None):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        out, upd2 = self.apply_module(
            variables, "head", qry, sup, setting.way, setting.shot,
            train=train, rng=rng,
        )
        merged = self.merge_updates({}, updates, upd2) if (updates or upd2) else None
        return out, merged

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
