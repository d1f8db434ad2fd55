"""MTL — Meta-Transfer Learning (Sun et al., CVPR 2019).

Reference: libfewshot_core/model/meta/mtl.py — a linear ``MTLBaseLearner``
over frozen scaled/shifted backbone features, adapted by a plain SGD inner
loop (:121-139, lr 0.01); the backbone's convs are frozen with learnable
per-channel scale/shift (``convert_mtl_module``,
backbone/utils/mtl_module.py — the ``mtl`` flag on the conv backbones here).
NOTE: the reference's episodic path is legacy-broken (4-value unpack of the
5-tuple split, mtl.py:82-84 — SURVEY §7.3); the intended head-only
adaptation is implemented, repeats-aware.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy
from ..losses import cross_entropy


class MTLBaseLearner(nn.Module):
    way_num: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.way_num, name="fc")(x)


@CLASSIFIERS.register("MTL")
class MTL(MethodBase):
    model_type = ModelType.META

    def __init__(self, emb_func, inner_param: Optional[Dict] = None,
                 feat_dim=None, num_classes: int = 64, way_num: int = 5,
                 **kwargs):
        super().__init__(emb_func, **kwargs)
        p = dict(inner_param or {})
        self.inner_iter = int(p.get("iter", 100))
        self.inner_lr = float(p.get("lr", 0.01))
        self.way_num = way_num
        self.modules["classifier"] = MTLBaseLearner(way_num=way_num)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        sub = self.modules["classifier"].init(rngs["params"], feats[:1])
        self._merge_init(variables, "classifier", sub)

    def _run(self, variables, batch, setting, rng=None, train=False):
        sup_f, qry_f, updates = self.embed(variables, batch, train=train, rng=rng)
        head0 = variables["params"]["classifier"]

        def episode_fn(sup, sup_y, qry):
            def support_loss(hp):
                logits = self.modules["classifier"].apply({"params": hp}, sup)
                return cross_entropy(logits, sup_y)

            def step(hp, _):
                grads = jax.grad(support_loss)(hp)
                return (
                    jax.tree_util.tree_map(
                        lambda w, g: w - self.inner_lr * g, hp, grads
                    ),
                    None,
                )

            adapted, _ = jax.lax.scan(step, head0, None, length=self.inner_iter)
            return self.modules["classifier"].apply({"params": adapted}, qry)

        seg_logits = jax.vmap(episode_fn)(sup_f, batch.support_target, qry_f)
        return seg_logits, updates

    def loss(self, variables, batch, setting, rng):
        seg_logits, updates = self._run(variables, batch, setting, rng, train=True)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        seg_logits, _ = self._run(variables, batch, setting)
        return seg_logits
