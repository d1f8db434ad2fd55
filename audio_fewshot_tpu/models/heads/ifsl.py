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

The pretrained linear head loads from ``ifsl_param.cls_path`` (a
``save_part`` msgpack of IfslPretrain's ``classifier``, mirroring the
reference's torch-state-dict load at matchingnet_ifsl.py:19-20); absent the
knob it initializes randomly.
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
    # the reference's IFSLUtils.normalize is x / (‖x‖ + 1e-5)
    # (matchingnet_ifsl.py:44-47) — additive eps, not clamped
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-5)


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
    # the reference runs convert_maml_module on itself
    # (matchingnet_ifsl.py:241): every BatchNorm2d always uses batch
    # statistics — but ONLY BatchNorm2d (maml_module.py:138-141); the
    # Conv64F logits-head BN1d stays standard, so under eval() it runs
    # running stats while the conv BNs run batch stats
    requires_batch_stat_bn = True
    backbone_kwarg_defaults = {"logits_bn_running_statistics": True}

    def __init__(self, emb_func, inner_param=None, feat_dim: int = 1600,
                 ifsl_param: Optional[Dict] = None, way_num: int = 5, **kwargs):
        super().__init__(emb_func, **kwargs)
        import inspect

        # can the backbone mask padded rows out of its BN batch statistics?
        self._mask_kw = "sample_mask" in inspect.signature(
            type(emb_func).__call__
        ).parameters
        p = dict(ifsl_param or {})
        self.n_splits = int(p.get("n_splits", 4))
        self.temp = float(p.get("temp", 10.0))
        self.class_num = int(p.get("class_num", p.get("num_classes", 25)))
        self.d_feature = str(p.get("d_feature", "pd"))
        self.logit_fusion = str(p.get("logit_fusion", "product"))
        self.use_counterfactual = bool(p.get("use_counterfactual", True))
        self.use_x_only = bool(p.get("use_x_only", False))
        # single = one fused [split ‖ d] block list (the shipped reproduce
        # configs run this branch); use_x_only forces the dual branch
        # (matchingnet_ifsl.py:228-232)
        self.single = bool(p.get("single", False)) and not self.use_x_only
        self.fusion = str(p.get("fusion", "concat"))
        self.x_zero = bool(p.get("x_zero", False))
        self.preprocess_before_split = str(
            p.get("preprocess_before_split", "none")
        )
        self.preprocess_after_split = str(
            p.get("preprocess_after_split", "none")
        )
        self.normalize_before_center = bool(
            p.get("normalize_before_center", False)
        )
        self.normalize_d = bool(p.get("normalize_d", False))
        self.normalize_ed = bool(p.get("normalize_ed", False))
        self.feature_path = p.get("feature_path")
        # pretrained interventional classifier (IFSLUtils loads cls_path
        # into self.linear, matchingnet_ifsl.py:19-20) — here a save_part
        # msgpack of IfslPretrain's classifier (classifier_best.pth)
        self.cls_path = p.get("cls_path")
        for m in (self.preprocess_before_split, self.preprocess_after_split):
            if m not in ("none", "l2n", "cl2n"):
                # "dl2n" indexes the batch-expanded center by SPLIT index
                # (get_split_features, :108-112) — shape-broken as
                # snapshotted; reject loudly
                raise ValueError(f"unsupported preprocess mode {m!r}")
        self.way_num = way_num
        self.modules["pretrain_cls"] = nn.Dense(self.class_num)
        # block modules are sized lazily at init (split dim depends on feats)
        self._blocks_built = False

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        import numpy as np

        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        d = feats.shape[-1]
        assert d % self.n_splits == 0, (d, self.n_splits)
        self.split_dim = d // self.n_splits
        self.d_dim = self.class_num if self.d_feature == "pd" else self.split_dim
        # pretrain class-mean features (IFSLUtils, matchingnet_ifsl.py:22-25,
        # 38-42): the IfslPretrain 'featuring' artifact; zeros when absent
        if self.feature_path:
            feats_np = np.load(self.feature_path).astype(np.float32)
            assert feats_np.shape == (self.class_num, d), feats_np.shape
        else:
            feats_np = np.zeros((self.class_num, d), np.float32)
        if self.normalize_d:
            feats_np = feats_np / (
                np.linalg.norm(feats_np, axis=1, keepdims=True) + 1e-5
            )
        self.features = jnp.asarray(feats_np)
        self.mean_features = self.features.mean(axis=0)
        sub = self.modules["pretrain_cls"].init(rngs["params"], feats[:1])
        if self.cls_path:
            # part files store the sub-tree under the SOURCE part name
            # ("classifier", checkpoint.save_model:70-76); retarget it to
            # this head's "pretrain_cls" slot
            from ...utils.checkpoint import load_variables

            tmpl = {"params": {"classifier": sub["params"]}}
            loaded = load_variables(self.cls_path, tmpl)
            sub = {"params": loaded["params"]["classifier"]}
        self._merge_init(variables, "pretrain_cls", sub)

        if self.single:
            # fused per-split width (IFSLUtils.get_feat_dim, :69-77)
            if self.d_feature == "pd":
                fused = self.split_dim + self.class_num
            elif self.fusion == "concat":
                fused = 2 * self.split_dim
            else:
                fused = self.split_dim
            specs = [(f"block{j}", fused) for j in range(self.n_splits)]
        else:
            specs = []
            for j in range(self.n_splits):
                specs.append((f"x_block{j}", self.split_dim))
                specs.append((f"d_block{j}", self.d_dim))
        for idx, (name, dim) in enumerate(specs):
            blk = MatchingNetLayer(feat_dim=dim)
            self.modules[name] = blk
            # the split blocks are structurally identical, so flax's
            # path-folded keys collide across them — fold the block index
            # in or the whole ensemble starts with bit-identical weights
            # (the torch reference draws fresh init per module)
            sub = blk.init(
                {"params": jax.random.fold_in(rngs["params"], idx)},
                jnp.zeros((2, dim)), jnp.zeros((3, dim)),
            )
            self._merge_init(variables, name, sub)

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

    def _fuse_features(self, x1, x2):
        """IFSLUtils.fuse_features (matchingnet_ifsl.py:61-67)."""
        if self.fusion == "concat":
            return jnp.concatenate([x1, x2], axis=-1)
        if self.fusion == "+":
            return x1 + x2
        return x1 - x2  # "-"

    def _nn_preprocess(self, x, center, method):
        """IFSLUtils.nn_preprocess (matchingnet_ifsl.py:115-124)."""
        if method == "none":
            return x
        if method == "l2n":
            return _l2n(x)
        # cl2n
        if self.normalize_before_center:
            x = _l2n(x)
        return _l2n(x - center)

    def _get_feature(self, variables, x):
        """IFSLUtils.get_feature (matchingnet_ifsl.py:148-157): the
        d-branch ('pd' = pretrained-classifier probabilities, 'ed' = their
        projection onto the class-mean features, per split), plus the
        preprocessed x splits.  x [n, D] → ([n_splits, n, split_dim],
        [n_splits, n, d_dim])."""
        params = variables["params"]
        # calc_pd runs under torch.no_grad() in the reference
        # (matchingnet_ifsl.py:126-129): the pretrained classifier is a
        # frozen feature-er — no gradient flows into it or back through
        # pd/ed into the backbone
        pd = jax.lax.stop_gradient(
            jax.nn.softmax(
                self.modules["pretrain_cls"].apply(
                    {"params": params["pretrain_cls"]}, x
                ),
                axis=-1,
            )
        )
        if self.d_feature == "pd":
            x_d = jnp.broadcast_to(
                pd[None], (self.n_splits,) + pd.shape
            )
        else:  # "ed" (get_d_feature, :131-146)
            ed = pd @ self.features  # [n, D]
            x_d = jnp.stack([
                ed[:, j * self.split_dim:(j + 1) * self.split_dim]
                for j in range(self.n_splits)
            ])
        if self.normalize_ed:
            x_d = _l2n(x_d)
        pmean = self.mean_features
        x = self._nn_preprocess(x, pmean, self.preprocess_before_split)
        splits = jnp.stack([
            self._nn_preprocess(
                x[:, j * self.split_dim:(j + 1) * self.split_dim],
                pmean[j * self.split_dim:(j + 1) * self.split_dim],
                self.preprocess_after_split,
            )
            for j in range(self.n_splits)
        ])
        return splits, x_d

    def _episode_logprobs(self, variables, sup, qry, way, shot):
        """sup [ns,D], qry [nq,D] → [nq, way] log-probs
        (set_forward/set_forward_loss episode body,
        matchingnet_ifsl.py:253-299)."""
        params = variables["params"]
        split_s, d_s = self._get_feature(variables, sup)
        split_q, d_q = self._get_feature(variables, qry)
        split_scores = []
        if self.single:
            fused_s = self._fuse_features(split_s, d_s)
            fused_q = self._fuse_features(split_q, d_q)
            if self.x_zero:
                c_split_q = jnp.zeros_like(split_q)
            else:
                c_split_q = jnp.broadcast_to(
                    split_s.mean(axis=1, keepdims=True), split_q.shape
                )
            c_fused_q = self._fuse_features(c_split_q, d_q)
            for j in range(self.n_splits):
                blk = self.modules[f"block{j}"]
                bp = {"params": params[f"block{j}"]}
                g, f = blk.apply(bp, fused_s[j], fused_q[j])
                _, c_f = blk.apply(bp, fused_s[j], c_fused_q[j])
                score = nn.relu(_l2n(f) @ _l2n(g).T) * self.temp
                c_score = nn.relu(_l2n(c_f) @ _l2n(g).T) * self.temp
                if self.use_counterfactual:
                    score = score - c_score
                split_scores.append(jax.nn.softmax(score, axis=-1))
        else:
            for j in range(self.n_splits):
                g_x, f_x = self.modules[f"x_block{j}"].apply(
                    {"params": params[f"x_block{j}"]}, split_s[j], split_q[j]
                )
                x_score = nn.relu(_l2n(f_x) @ _l2n(g_x).T)
                if self.use_x_only:
                    score = x_score * self.temp
                    c_score = jnp.ones_like(x_score) * self.temp
                else:
                    g_d, f_d = self.modules[f"d_block{j}"].apply(
                        {"params": params[f"d_block{j}"]}, d_s[j], d_q[j]
                    )
                    d_score = nn.relu(_l2n(f_d) @ _l2n(g_d).T)
                    score = self._fuse_proba(x_score, d_score) * self.temp
                    c_score = self._fuse_proba(
                        jnp.ones_like(x_score), d_score
                    ) * self.temp
                if self.use_counterfactual:
                    score = score - c_score
                split_scores.append(jax.nn.softmax(score, axis=-1))
        proba = jnp.mean(jnp.stack(split_scores), axis=0)  # [nq, ns]
        labels = jax.nn.one_hot(
            jnp.repeat(jnp.arange(way), shot), way
        )  # [ns, way]
        return jnp.log(proba @ labels + 1e-6)

    def _embed_split(self, variables, x, train, rng=None, sample_mask=None):
        """Embed ONE role (support or query) of ONE episode — the reference
        embeds support and query in separate ``emb_func`` calls per episode
        (IFSLUtils.fusing, matchingnet_ifsl.py:79-81), and its maml-converted
        BN takes batch statistics from each call separately."""
        kw = {"sample_mask": sample_mask} if (
            sample_mask is not None and self._mask_kw
        ) else {}
        feats, updates = self.apply_module(
            variables, "emb_func", x, train=train, rng=rng, **kw
        )
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        return feats, updates

    def _run(self, variables, batch, setting, train, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def episode_fn(sup_x, qry_x, qry_mask, ep_rng):
            sup_f, upd_s = self._embed_split(variables, sup_x, train, ep_rng)
            # the reference's train-mode BN1d updates its running stats on
            # BOTH embed calls, SEQUENTIALLY (IFSLUtils.fusing embeds
            # support then query): fold the support-step EMA in before the
            # query embed so the query step compounds on it —
            # (1−m)²s0 + m(1−m)b_sup + m·b_qry, exactly torch's trajectory
            vars_q = self.merge_updates(variables, upd_s) if upd_s else variables
            qry_f, upd_q = self._embed_split(
                vars_q, qry_x, train, ep_rng, sample_mask=qry_mask > 0
            )
            upd = upd_q or upd_s
            lp = self._episode_logprobs(
                variables, sup_f, qry_f, setting.way, setting.shot
            )
            return lp, upd

        e = batch.support.shape[0]
        ep_rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(e))
        seg_logits, updates = jax.vmap(episode_fn)(
            batch.support, batch.query, batch.query_mask, ep_rngs
        )
        if updates:
            # per-episode batch-stat EMAs → one tree (mean across episodes;
            # the torch reference accumulates sequentially — same fixed
            # point for stationary inputs, and eval-side parity depends only
            # on both frameworks sharing the CONVERTED stats)
            updates = jax.tree_util.tree_map(lambda u: u.mean(axis=0), updates)
        return seg_logits, updates or None

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
    matchingnetifsl_pretrain.py): plain global CE + euclid-proto meta-val.
    The reference's own ``set_forward`` is a stub (returns ``(0, 0)``,
    :32-38) — its live surface is the training path plus the 'featuring'
    class-mean dump below (``ifsl_pretrain_param.featuring: true`` →
    ``Trainer.run_featuring``)."""

    def __init__(self, emb_func, ifsl_pretrain_param=None,
                 emb_func_path=None, emd_func_path=None,
                 cls_classifier_path=None, **kwargs):
        super().__init__(emb_func, **kwargs)
        p = dict(ifsl_pretrain_param or {})
        # reference setattr-loop (matchingnetifsl_pretrain.py:15-16)
        self.norm = bool(p.get("norm", False))
        self.featuring = bool(p.get("featuring", False))
        self.feature_path = p.get("feature_path")
        # the reference loads torch state dicts at construction
        # (matchingnetifsl_pretrain.py:17-19; the shipped YAML spells the
        # backbone knob 'emd_func_path').  Here the emb_func side goes
        # through the standard ``pretrain_path`` part flow; the classifier
        # side loads a save_part msgpack (classifier_best.pth) via this
        # knob (use tools/convert_torch_checkpoint.py for torch files).
        if emb_func_path or emd_func_path:
            import warnings

            warnings.warn(
                "IfslPretrain ignores emb_func_path/emd_func_path — load "
                "the backbone part through the top-level `pretrain_path` "
                "config key instead",
                stacklevel=2,
            )
        self.cls_classifier_path = cls_classifier_path

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        super()._init_head(variables, rngs, feats, example_batch, setting)
        if self.cls_classifier_path:
            from ...utils.checkpoint import load_part

            loaded = load_part(
                self.cls_classifier_path, variables, part="classifier"
            )
            variables.update(loaded)

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        return proto_logits(qry, sup, setting.way, setting.shot, "euclidean")

    def compute_class_features(self, variables, data, targets,
                               normalize: bool = True) -> jnp.ndarray:
        """IFSL 'featuring' pass (reference matchingnetifsl_pretrain.py:
        56-67): per-class mean embeddings over a labeled set, optionally
        L2-normalized first (``x/(‖x‖+1e-5)``, :40-43).  The result is the
        ``feature_path`` artifact DMatchingNet's IFSLUtils loads
        (matchingnet_ifsl.py:38-42); classes unseen in ``data`` keep zero
        rows, as the reference's zero-initialized accumulator does."""
        feats, _ = self.apply_module(variables, "emb_func", data, train=False)
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        if normalize:
            feats = feats / (
                jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-5
            )
        onehot = jax.nn.one_hot(targets, self.num_class, dtype=feats.dtype)
        counts = jnp.sum(onehot, axis=0)
        means = (onehot.T @ feats) / jnp.maximum(counts, 1.0)[:, None]
        return means
