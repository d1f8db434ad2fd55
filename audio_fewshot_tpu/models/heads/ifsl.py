"""DMatchingNet — Interventional Few-Shot Learning over a matching network
(Yue et al., NeurIPS 2020).

Reference: libfewshot_core/model/meta/matchingnet_ifsl.py — features are cut
into ``n_splits`` chunks (IFSLUtils.get_split_features :98-116); each chunk
gets a "d-feature" (pretrained-classifier probabilities, ``d_feature: pd``);
per split, a MatchingNetLayer (bidirectional-LSTM support encoder G + FCE
attention-LSTM query refinement, :162-211) produces refined embeddings;
scores = relu-cosine query×support ×temp, fused with the d-branch scores
(``logit_fusion``), counterfactual branch subtracted (:258-300); attention
softmax over support → class mass → log-probs, averaged over splits.

The pretrained linear head (reference loads ``cls_path``) initializes
randomly here and can be loaded through the standard ``pretrain_path``
part-checkpoint flow.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType
from ..losses import cross_entropy


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-5)


class _FCEStep(nn.Module):
    """One FullyContextualEmbedding step: attention read over G + LSTM cell
    (reference FullyContextualEmbedding.forward loop, :170-183)."""

    feat_dim: int

    @nn.compact
    def __call__(self, carry, _):
        h, c, query, g = carry
        a = jax.nn.softmax(h @ g.T, axis=-1)
        r = a @ g
        x = jnp.concatenate([query, r], axis=-1)
        (c, h), _ = nn.OptimizedLSTMCell(self.feat_dim, name="cell")((c, h), x)
        h = h + query
        return (h, c, query, g), None


class MatchingNetLayer(nn.Module):
    """Bidirectional LSTM over the support set + FCE attention-LSTM for
    queries (reference MatchingNetLayer / FullyContextualEmbedding)."""

    feat_dim: int

    @nn.compact
    def __call__(self, support, query, train: bool = False):
        # support: [ns, d]; query: [nq, d]
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.feat_dim), name="g_fwd")
        # keep_order=True: flax returns reversed-scan outputs in reversed
        # order by default, which would add position i's forward state to
        # position n-1-i's backward state
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.feat_dim), name="g_bwd",
                     reverse=True, keep_order=True)
        out_f = fwd(support[None])[0]
        out_b = bwd(support[None])[0]
        g = support + out_f + out_b

        k = support.shape[0]
        scan = nn.scan(
            _FCEStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=k,
        )
        h0, c0 = query, jnp.zeros_like(query)
        (f, _, _, _), _ = scan(feat_dim=self.feat_dim, name="fce")(
            (h0, c0, query, g), None
        )
        return g, f


@CLASSIFIERS.register("DMatchingNet")
class DMatchingNet(MethodBase):
    model_type = ModelType.META

    def __init__(self, emb_func, inner_param=None, feat_dim: int = 1600,
                 ifsl_param: Optional[Dict] = None, way_num: int = 5, **kwargs):
        super().__init__(emb_func, **kwargs)
        p = dict(ifsl_param or {})
        self.n_splits = int(p.get("n_splits", 4))
        self.temp = float(p.get("temp", 10.0))
        self.class_num = int(p.get("class_num", p.get("num_classes", 25)))
        self.d_feature = str(p.get("d_feature", "pd"))
        self.logit_fusion = str(p.get("logit_fusion", "product"))
        self.use_counterfactual = bool(p.get("use_counterfactual", True))
        self.use_x_only = bool(p.get("use_x_only", False))
        self.way_num = way_num
        self.modules["pretrain_cls"] = nn.Dense(self.class_num)
        # block modules are sized lazily at init (split dim depends on feats)
        self._blocks_built = False

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        d = feats.shape[-1]
        assert d % self.n_splits == 0, (d, self.n_splits)
        self.split_dim = d // self.n_splits
        self.d_dim = self.class_num if self.d_feature == "pd" else self.split_dim
        sub = self.modules["pretrain_cls"].init(rngs["params"], feats[:1])
        self._merge_init(variables, "pretrain_cls", sub)
        for j in range(self.n_splits):
            xb = MatchingNetLayer(feat_dim=self.split_dim)
            db = MatchingNetLayer(feat_dim=self.d_dim)
            self.modules[f"x_block{j}"] = xb
            self.modules[f"d_block{j}"] = db
            # the split blocks are structurally identical, so flax's
            # path-folded keys collide across them — fold the block index
            # in or the whole ensemble starts with bit-identical weights
            # (the torch reference draws fresh init per module)
            kx = jax.random.fold_in(rngs["params"], 2 * j)
            kd = jax.random.fold_in(rngs["params"], 2 * j + 1)
            sub = xb.init(
                {"params": kx},
                jnp.zeros((2, self.split_dim)), jnp.zeros((3, self.split_dim)),
            )
            self._merge_init(variables, f"x_block{j}", sub)
            sub = db.init(
                {"params": kd},
                jnp.zeros((2, self.d_dim)), jnp.zeros((3, self.d_dim)),
            )
            self._merge_init(variables, f"d_block{j}", sub)

    def _fuse_proba(self, p1, p2):
        s = jax.nn.sigmoid
        if self.logit_fusion == "linear_sum":
            return p1 + p2
        if self.logit_fusion == "sum":
            return jnp.log(s(p1 + p2))
        if self.logit_fusion == "harmonic":
            p = s(p1) * s(p2)
            return jnp.log(p / (1 + p))
        return jnp.log(jnp.maximum(s(p1) * s(p2), 1e-12))  # "product"

    def _episode_logprobs(self, variables, sup, qry, way, shot):
        """sup [ns,D], qry [nq,D] → [nq, way] log-probs."""
        params = variables["params"]
        ns = sup.shape[0]
        d_sup = jax.nn.softmax(
            self.modules["pretrain_cls"].apply({"params": params["pretrain_cls"]}, sup),
            axis=-1,
        )
        d_qry = jax.nn.softmax(
            self.modules["pretrain_cls"].apply({"params": params["pretrain_cls"]}, qry),
            axis=-1,
        )
        split_scores = []
        for j in range(self.n_splits):
            lo, hi = j * self.split_dim, (j + 1) * self.split_dim
            sx, qx = sup[:, lo:hi], qry[:, lo:hi]
            g_x, f_x = self.modules[f"x_block{j}"].apply(
                {"params": params[f"x_block{j}"]}, sx, qx
            )
            x_score = nn.relu(_l2n(f_x) @ _l2n(g_x).T)
            if self.use_x_only:
                score = x_score * self.temp
                c_score = jnp.ones_like(x_score) * self.temp
            else:
                g_d, f_d = self.modules[f"d_block{j}"].apply(
                    {"params": params[f"d_block{j}"]}, d_sup, d_qry
                )
                d_score = nn.relu(_l2n(f_d) @ _l2n(g_d).T)
                score = self._fuse_proba(x_score, d_score) * self.temp
                c_score = self._fuse_proba(jnp.ones_like(x_score), d_score) * self.temp
            if self.use_counterfactual:
                score = score - c_score
            split_scores.append(jax.nn.softmax(score, axis=-1))
        proba = jnp.mean(jnp.stack(split_scores), axis=0)  # [nq, ns]
        labels = jax.nn.one_hot(
            jnp.repeat(jnp.arange(way), shot), way
        )  # [ns, way]
        return jnp.log(proba @ labels + 1e-6)

    def _run(self, variables, batch, setting, train, rng=None):
        sup_f, qry_f, updates = self.embed(variables, batch, train=train, rng=rng)
        fn = lambda s, q: self._episode_logprobs(
            variables, s, q, setting.way, setting.shot
        )
        return jax.vmap(fn)(sup_f, qry_f), updates

    def loss(self, variables, batch, setting, rng):
        seg_logits, updates = self._run(variables, batch, setting, True, rng)
        targets = segment_targets(batch)
        mask = batch.query_mask
        nll = -jnp.take_along_axis(seg_logits, targets[..., None], axis=-1)[..., 0]
        loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        seg_logits, _ = self._run(variables, batch, setting, False)
        return seg_logits


from .finetuning import FinetuningBase
from .proto_net import proto_logits


@CLASSIFIERS.register("IfslPretrain")
class IfslPretrain(FinetuningBase):
    """Pretrainer for DMatchingNet's interventional classifier (reference
    matchingnetifsl_pretrain.py): plain global CE + euclid-proto meta-val."""

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        return proto_logits(qry, sup, setting.way, setting.shot, "euclidean")
