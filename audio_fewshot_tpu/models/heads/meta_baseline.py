"""MetaBaseline — cosine prototypes × learnable temperature (Chen et al.).

Reference: libfewshot_core/model/metric/meta_baseline.py (temperature
``self.temp = nn.Parameter(10.)`` at :54, cosine ProtoLayer_temperature at
:25-47).  One einsum over the episode batch.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import EpisodeBatch, segment_targets
from ...registry import CLASSIFIERS
from ..base import EpisodeSetting, LossOutput, MethodBase, ModelType, masked_cross_entropy
from .proto_net import prototypes


class _TempParam(nn.Module):
    init_temp: float = 10.0

    @nn.compact
    def __call__(self, train: bool = False) -> jnp.ndarray:
        return self.param("temp", lambda rng: jnp.asarray(self.init_temp, jnp.float32))


def cosine_proto_logits(query_feat, support_feat, way, shot):
    proto = prototypes(support_feat, way, shot)
    qn = query_feat / jnp.maximum(
        jnp.linalg.norm(query_feat, axis=-1, keepdims=True), 1e-12
    )
    pn = proto / jnp.maximum(jnp.linalg.norm(proto, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("egd,ewd->egw", qn, pn)


@CLASSIFIERS.register("MetaBaseline")
class MetaBaseline(MethodBase):
    model_type = ModelType.METRIC

    def __init__(self, emb_func, temperature: float = 10.0, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.modules["head"] = _TempParam(init_temp=temperature)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        sub = self.modules["head"].init({"params": rngs["params"]})
        self._merge_init(variables, "head", sub)

    def _logits(self, variables, batch, setting, train, rng=None):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        temp, _ = self.apply_module(variables, "head")
        return temp * cosine_proto_logits(qry, sup, setting.way, setting.shot), updates

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
