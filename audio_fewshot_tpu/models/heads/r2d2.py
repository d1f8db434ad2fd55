"""R2D2 — differentiable closed-form ridge regression (Bertinetto et al.).

Reference: libfewshot_core/model/meta/r2d2.py (R2D2Layer :82-127): dual-form
``W = Sᵀ (S Sᵀ + γ I)⁻¹ Y``, logits ``α·QW + β`` with learnable α/β/γ.

TPU shape: the per-episode ``[n_s, n_s]`` systems are tiny (≤75²) —
``jnp.linalg.solve`` batched over the episode axis is a single fused XLA op
(SURVEY §3.4).  Also exported as ``R2D2MCL`` over dense-map features
(reference r2d2_mcl.py — local descriptors become extra "support rows").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


class R2D2Params(nn.Module):
    @nn.compact
    def __call__(self, train: bool = False):
        alpha = self.param("alpha", lambda r: jnp.asarray(1.0, jnp.float32))
        beta = self.param("beta", lambda r: jnp.asarray(0.0, jnp.float32))
        gamma = self.param("gamma", lambda r: jnp.asarray(50.0, jnp.float32))
        return alpha, beta, gamma


def ridge_logits(query, support, support_onehot, alpha, beta, gamma):
    """Batched dual ridge: query [E,G,D], support [E,NS,D], onehot [E,NS,W]."""
    ns = support.shape[1]
    gram = jnp.einsum("end,emd->enm", support, support)
    eye = jnp.eye(ns, dtype=gram.dtype)
    # (S Sᵀ + γI)⁻¹ Y  — one batched solve instead of an explicit inverse
    sol = jnp.linalg.solve(gram + gamma * eye, support_onehot)  # [E,NS,W]
    w = jnp.einsum("end,enw->edw", support, sol)  # [E,D,W]
    return alpha * jnp.einsum("egd,edw->egw", query, w) + beta


@CLASSIFIERS.register("R2D2")
class R2D2(MethodBase):
    model_type = ModelType.META

    def __init__(self, emb_func, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.modules["head"] = R2D2Params()

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        sub = self.modules["head"].init({"params": rngs["params"]})
        self._merge_init(variables, "head", sub)

    def _logits(self, variables, batch, setting, train, rng=None):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        (alpha, beta, gamma), _ = self.apply_module(variables, "head")
        onehot = jax.nn.one_hot(batch.support_target, setting.way, dtype=sup.dtype)
        return ridge_logits(qry, sup, onehot, alpha, beta, gamma), updates

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


@CLASSIFIERS.register("R2D2MCL")
class R2D2MCL(R2D2):
    """R2D2 ridge head over MCL-attended features (reference r2d2_mcl.py
    set_forward :143-173): the MCLMask Katz centrality weights each query's
    spatial positions (mask-weighted sum → one vector per query segment),
    supports are global-average-pooled, then the standard dual-form ridge
    solve produces the logits."""

    needs_feature_map = True

    def __init__(self, emb_func, katz_factor: float = 0.5,
                 gamma: float = 20.0, gamma2: float = 10.0, **kwargs):
        # the reference constructor has NO defaults (r2d2_mcl.py:138 reads
        # kwargs.get — None unless configured); every shipped reproduce
        # YAML uses katz_factor 0.5 / gamma 20 / gamma2 10, same as MCL
        super().__init__(emb_func, **kwargs)
        self.katz_factor = katz_factor
        self.gamma = gamma
        self.gamma2 = gamma2

    def _logits(self, variables, batch, setting, train, rng=None):
        from .mcl import katz_query_mask

        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        (alpha, beta, gamma), _ = self.apply_module(variables, "head")
        e, g, c, h, w = qry.shape
        mask = katz_query_mask(qry, sup, setting.way, setting.shot,
                               self.katz_factor, self.gamma, self.gamma2)
        qry_vec = jnp.einsum("egcx,egx->egc", qry.reshape(e, g, c, h * w), mask)
        sup_vec = sup.mean(axis=(-2, -1))  # adaptive_avg_pool2d(·, 1)
        onehot = jax.nn.one_hot(batch.support_target, setting.way, dtype=sup.dtype)
        return ridge_logits(qry_vec, sup_vec, onehot, alpha, beta, gamma), updates
