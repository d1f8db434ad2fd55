"""MeTAL — Meta-learning with Task-Adaptive Loss functions (Baik et al.,
ICCV 2021).

Reference: libfewshot_core/model/meta/metal.py — MAML head-adaptation where
the inner objective is support CE PLUS two learned losses: ``meta_loss``
(MLP over [normalized task state ‖ support preds ‖ one-hot targets],
:150-166) and ``meta_query_loss`` (MLP over [classifier-weight state ‖
query preds ‖ prediction entropy], :168-184); per-step "LossAdapter"
networks modulate the meta-loss weights (:239-391).

TPU re-design: inner loop = ``lax.scan`` of grad steps on the classifier
head; the learned losses are step-conditioned MLPs (a learned per-step
embedding replaces the reference's per-step parameter copies — same
task-adaptive capacity, one parameter set); second-order gradients flow
through the scan.
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


class MetaLossNet(nn.Module):
    """Step-conditioned learned loss: MLP(state ‖ step-embedding) → scalar."""

    hid_dim: int = 40
    max_steps: int = 64

    @nn.compact
    def __call__(self, state, step, train: bool = False):
        emb = nn.Embed(self.max_steps, 8, name="step_emb")(step)
        x = jnp.concatenate(
            [state, jnp.broadcast_to(emb, state.shape[:-1] + (8,))], axis=-1
        )
        x = nn.relu(nn.Dense(self.hid_dim, name="fc1")(x))
        return nn.Dense(1, name="fc2")(x)


def _normalize(x):
    return (x - x.mean()) / (x.std() + 1e-12)


@CLASSIFIERS.register("MeTAL")
class MeTAL(MethodBase):
    model_type = ModelType.META

    def __init__(self, emb_func, inner_param: Optional[Dict] = None,
                 feat_dim=None, way_num: int = 5, **kwargs):
        super().__init__(emb_func, **kwargs)
        p = dict(inner_param or {})
        self.inner_lr = float(p.get("lr", 0.01))
        self.train_iter = int(p.get("train_iter", 5))
        self.test_iter = int(p.get("test_iter", 10))
        if max(self.train_iter, self.test_iter) > MetaLossNet.max_steps:
            raise ValueError(
                f"MeTAL inner iters (train {self.train_iter} / test "
                f"{self.test_iter}) exceed the step-embedding capacity "
                f"({MetaLossNet.max_steps}) — XLA would silently clamp"
            )
        self.way_num = way_num
        self.modules["classifier"] = nn.Dense(way_num)
        self.modules["meta_loss"] = MetaLossNet()
        self.modules["meta_query_loss"] = MetaLossNet()

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        sub = self.modules["classifier"].init(rngs["params"], feats[:1])
        self._merge_init(variables, "classifier", sub)
        way = setting.way
        # support state: [1+2 (loss + head param means) ‖ preds ‖ one-hot]
        s_state = jnp.zeros((2, 3 + 2 * way), jnp.float32)
        sub = self.modules["meta_loss"].init(
            {"params": rngs["params"]}, s_state, jnp.zeros((), jnp.int32)
        )
        self._merge_init(variables, "meta_loss", sub)
        q_state = jnp.zeros((2, 2 + way + 1), jnp.float32)
        sub = self.modules["meta_query_loss"].init(
            {"params": rngs["params"]}, q_state, jnp.zeros((), jnp.int32)
        )
        self._merge_init(variables, "meta_query_loss", sub)

    def _run(self, variables, batch, setting, rng, train, n_steps):
        sup_f, qry_f, updates = self.embed(variables, batch, train=train, rng=rng)
        params = variables["params"]
        way = setting.way

        def head_logits(hp, f):
            return self.modules["classifier"].apply({"params": hp}, f)

        def episode_fn(sup, sup_y, qry):
            head0 = params["classifier"]
            onehot = jax.nn.one_hot(sup_y, way)

            def inner_obj(hp, step):
                s_preds = head_logits(hp, sup)
                q_preds = head_logits(hp, qry)
                s_loss = cross_entropy(s_preds, sup_y)
                w_means = jnp.stack(
                    [jnp.mean(hp["kernel"]), jnp.mean(hp["bias"])]
                )
                task_state = _normalize(jnp.concatenate([s_loss[None], w_means]))
                s_state = jnp.concatenate(
                    [
                        jnp.broadcast_to(task_state, (sup.shape[0], 3)),
                        s_preds,
                        onehot,
                    ],
                    axis=-1,
                )
                meta_s = self.modules["meta_loss"].apply(
                    {"params": params["meta_loss"]}, _normalize(s_state), step
                ).mean()
                logp = jax.nn.log_softmax(q_preds, axis=-1)
                entropy = jnp.sum(jnp.exp(logp) * logp, axis=-1, keepdims=True)
                q_state = jnp.concatenate(
                    [
                        jnp.broadcast_to(w_means, (qry.shape[0], 2)),
                        q_preds,
                        entropy,
                    ],
                    axis=-1,
                )
                meta_q = self.modules["meta_query_loss"].apply(
                    {"params": params["meta_query_loss"]}, _normalize(q_state), step
                ).mean()
                return s_loss + meta_s + meta_q

            def step_fn(hp, step):
                grads = jax.grad(inner_obj)(hp, step)
                return (
                    jax.tree_util.tree_map(
                        lambda w, g: w - self.inner_lr * g, hp, grads
                    ),
                    None,
                )

            adapted, _ = jax.lax.scan(
                step_fn, head0, jnp.arange(n_steps, dtype=jnp.int32)
            )
            return head_logits(adapted, qry)

        seg_logits = jax.vmap(episode_fn)(sup_f, batch.support_target, qry_f)
        return seg_logits, updates

    def loss(self, variables, batch, setting, rng):
        seg_logits, updates = self._run(
            variables, batch, setting, rng, True, self.train_iter
        )
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        seg_logits, _ = self._run(
            variables, batch, setting, None, False, self.test_iter
        )
        return seg_logits


# the reference's shipped metal.yaml uses the all-caps name (config/metal.yaml:59)
CLASSIFIERS.register_alias("METAL", "MeTAL")
