"""Backbone pretrainers: global-CE training with metric meta-validation.

Reference: libfewshot_core/model/finetuning/{metabaseline_pretrain,
feat_pretrain, deepbdc_pretrain, mtl_pretrain, s2m2}.py.  All share one
shape: train = global linear CE over all train classes (flat batches); val =
a prototype metric over frozen features (cosine for MetabaselinePretrain,
euclid for FEAT_Pretrain, shot-switched BDC protos for DeepBDC_Pretrain) or
a linear probe ("stl" val_type).  Their ``save_part: [emb_func]`` checkpoint
feeds the pretrain → meta-train pipeline (SURVEY §5.4).

S2M2 (s2m2.py): manifold mixup at a random hidden layer + 4-way rotation
auxiliary head; eval = cosine-head adaptation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import FlatBatch
from ...registry import CLASSIFIERS
from ..base import LossOutput
from ..losses import cross_entropy
from .deepbdc import bdc_proto_logits
from .finetuning import FinetuningBase
from .meta_baseline import cosine_proto_logits
from .proto_net import proto_logits


class GlobalPretrain(FinetuningBase):
    """Linear global head; meta-val with a metric head (no adaptation)."""

    val_metric = "cos_sim"  # "cos_sim" | "euclidean" | "bdc"

    def forward(self, variables, batch, setting):
        sup_f, qry_f, _ = self.embed(variables, batch, train=False)
        if self.val_metric == "cos_sim":
            return cosine_proto_logits(qry_f, sup_f, setting.way, setting.shot)
        if self.val_metric == "bdc":
            return bdc_proto_logits(qry_f, sup_f, setting.way, setting.shot)
        return proto_logits(qry_f, sup_f, setting.way, setting.shot, "euclidean")


@CLASSIFIERS.register("MetabaselinePretrain")
class MetabaselinePretrain(GlobalPretrain):
    """Reference metabaseline_pretrain.py — cosine-proto meta-val."""

    val_metric = "cos_sim"


@CLASSIFIERS.register("FEAT_Pretrain")
class FEATPretrain(GlobalPretrain):
    """Reference feat_pretrain.py — euclid-proto meta-val."""

    val_metric = "euclidean"


class _PreFC(nn.Module):
    """MTLPretrain's 2-layer global head (reference mtl_pretrain.py:56-60)."""

    num_class: int
    hid: int = 1000

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hid, name="fc1")(x))
        return nn.Dense(self.num_class, name="fc2")(x)


@CLASSIFIERS.register("MTLPretrain")
class MTLPretrain(GlobalPretrain):
    """Reference mtl_pretrain.py — global CE pretrain through ``pre_fc``
    (Linear→ReLU→Linear, :56-60); meta-val adapts a FRESH linear base
    learner with ``inner_param['iter']`` full-support GD steps at the
    hard-coded lr 0.01 (:134-153), then classifies the queries.

    Delta (documented): the reference kaiming-resets the learner per
    episode (:44-47); here the init is deterministic zeros so eval is
    reproducible under jit (the first GD step from zero logits is
    well-defined — uniform softmax)."""

    def __init__(self, emb_func, inner_param: Optional[Dict] = None,
                 **kwargs):
        super().__init__(emb_func, inner_param=inner_param, **kwargs)
        self.adapt_iter = int(dict(inner_param or {}).get("iter", 5))
        self.modules["classifier"] = _PreFC(self.num_class)

    def _global_logits(self, variables, feats):
        return self.modules["classifier"].apply(
            {"params": variables["params"]["classifier"]}, feats
        )

    def forward(self, variables, batch, setting):
        from ..losses import cross_entropy as _ce

        sup_f, qry_f, _ = self.embed(variables, batch, train=False)
        way = setting.way

        def adapt(s, y, q):
            w = jnp.zeros((s.shape[-1], way), s.dtype)
            b = jnp.zeros((way,), s.dtype)

            def support_loss(p):
                return _ce(s @ p[0] + p[1], y)

            def step(p, _):
                g = jax.grad(support_loss)(p)
                return (p[0] - 0.01 * g[0], p[1] - 0.01 * g[1]), None

            (w, b), _ = jax.lax.scan(
                step, (w, b), None, length=self.adapt_iter
            )
            return q @ w + b

        return jax.vmap(adapt)(sup_f, batch.support_target, qry_f)


@CLASSIFIERS.register("DeepBDC_Pretrain")
class DeepBDCPretrain(GlobalPretrain):
    """Reference deepbdc_pretrain.py — ``val_type`` 'meta' (shot-switched BDC
    protos, :105-112) or 'stl' (softmax-regression probe on support)."""

    val_metric = "bdc"

    def __init__(self, emb_func, val_type: str = "meta", penalty_C: float = 0.1,
                 is_distill: bool = False, kd_T: float = 4.0,
                 alpha: float = 0.5, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.val_type = val_type
        self.penalty_c = penalty_C
        self.is_distill = is_distill
        self.kd_T = kd_T
        self.alpha = alpha
        self.teacher_variables = None  # born-again distill generations

    def loss(self, variables, batch, setting, rng):
        loss, out = super().loss(variables, batch, setting, rng)
        if self.is_distill and self.teacher_variables is not None:
            from ..losses import distill_kl_loss

            t_feats, _ = self.apply_module(
                self.teacher_variables, "emb_func", batch.data, train=False
            )
            if t_feats.ndim > 2:
                t_feats = t_feats.reshape(t_feats.shape[0], -1)
            t_logits = self._global_logits(self.teacher_variables, t_feats)
            loss = loss + self.alpha * distill_kl_loss(
                out.seg_logits, t_logits, self.kd_T
            )
        return loss, out

    def _episode_head_logits(self, sup_f, sup_y, qry_f, n_steps, way=None):
        # reference deepbdc_pretrain.py:215-228: converged sklearn
        # LogisticRegression (C=penalty_C) on L2-normalized features
        from .finetuning import sklearn_probe_logits

        sup_f = sup_f / (jnp.linalg.norm(sup_f, axis=-1, keepdims=True) + 1e-5)
        qry_f = qry_f / (jnp.linalg.norm(qry_f, axis=-1, keepdims=True) + 1e-5)
        return sklearn_probe_logits(sup_f, sup_y, qry_f,
                                    way or self.way_num, C=self.penalty_c)

    def forward(self, variables, batch, setting):
        if self.val_type == "stl":
            return FinetuningBase.forward(self, variables, batch, setting)
        return super().forward(variables, batch, setting)


class _FRNPretrainHead(nn.Module):
    """FRN_Pretrain parameters (reference frn_pretrain.py:21-36): trainable
    ``scale``, frozen-at-zero ridge coefficients ``r = [α, β]``
    (requires_grad=False, :31), and the global category matrix M
    (``cat_mat`` ~ N(0, 1), :33-36)."""

    num_class: int
    resolution: int
    feat_dim: int

    @nn.compact
    def __call__(self, train: bool = False):
        scale = self.param("scale", lambda r: jnp.asarray(1.0, jnp.float32))
        r = self.param("r", nn.initializers.zeros, (2,))
        cat_mat = self.param(
            "cat_mat", nn.initializers.normal(1.0),
            (self.num_class, self.resolution, self.feat_dim),
        )
        # r is non-trainable in the reference; stop_gradient freezes it
        # without a custom optimizer partition
        return scale, jax.lax.stop_gradient(r), cat_mat


@CLASSIFIERS.register("FRN_Pretrain")
class FRNPretrain(FinetuningBase):
    """Reference frn_pretrain.py — FAITHFUL objective: features are scaled
    by 1/√640 (hard-coded for ANY channel count, :136/:182), every spatial
    position is ridge-reconstructed from the global category matrix
    (``get_recon_dist`` Woodbury form, :59-101 — the same math as the FRN
    head, reused from heads/frn.py), and the NLL of the position-averaged
    neg-distance logits trains backbone + cat_mat + scale (:169-190).
    Eval (``set_forward``, :127-167) reconstructs query positions from the
    episode's support pools and log-softmaxes (:37-42)."""

    model_type = FinetuningBase.model_type
    needs_feature_map = True

    def __init__(self, emb_func, num_class: int = 64, **kwargs):
        super().__init__(emb_func, num_class=num_class, **kwargs)
        # training classifies against cat_mat, not a linear head
        del self.modules["classifier"]

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        c, h, w = feats.shape[-3:]
        self.modules["frn_head"] = _FRNPretrainHead(self.num_class, h * w, c)
        sub = self.modules["frn_head"].init({"params": rngs["params"]})
        self._merge_init(variables, "frn_head", sub)

    @staticmethod
    def _rows(feats):
        """[n, c, h, w] → positions-as-rows [n, h·w, c], pre-scaled by the
        reference's hard-coded 1/√640 (frn_pretrain.py:136/182)."""
        n, c, h, w = feats.shape
        rows = feats.reshape(n, c, h * w).transpose(0, 2, 1)
        return rows / jnp.sqrt(jnp.asarray(640.0, rows.dtype))

    def loss(self, variables, batch, setting, rng):
        from .frn import frn_recon_dist

        assert isinstance(batch, FlatBatch), (
            "FRN_Pretrain trains on flat batches (frn_pretrain.py:169-190)"
        )
        feats, updates = self.apply_module(
            variables, "emb_func", batch.data, train=True, rng=rng
        )
        (scale, r, cat_mat), _ = self.apply_module(variables, "frn_head")
        rows = self._rows(feats)
        n, hw, c = rows.shape
        dist = frn_recon_dist(
            rows.reshape(1, n * hw, c), cat_mat[None], r[0], r[1]
        )
        neg = -dist.reshape(n, hw, self.num_class).mean(axis=1) * scale
        logp = jax.nn.log_softmax(neg)
        loss = -jnp.mean(
            jnp.take_along_axis(logp, batch.target[:, None], axis=1)
        )
        acc = jnp.mean(
            (jnp.argmax(neg, -1) == batch.target).astype(jnp.float32)
        ) * 100.0
        return loss, LossOutput(
            seg_logits=logp, metrics={"acc": acc}, updates=updates
        )

    def forward(self, variables, batch, setting):
        from .frn import frn_recon_dist

        sup, qry, _ = self.embed(variables, batch, train=False)
        (scale, r, _), _ = self.apply_module(variables, "frn_head")
        e, ws, c, h, w = sup.shape
        hw = h * w
        way, shot = setting.way, setting.shot
        sup_rows = self._rows(sup.reshape(e * ws, c, h, w)).reshape(
            e, way, shot * hw, c
        )
        g = qry.shape[1]
        q_rows = self._rows(qry.reshape(e * g, c, h, w)).reshape(
            e, g * hw, c
        )
        dist = frn_recon_dist(q_rows, sup_rows, r[0], r[1])
        neg = -dist.reshape(e, g, hw, way).mean(axis=2) * scale
        return jax.nn.log_softmax(neg)


@CLASSIFIERS.register("S2M2")
class S2M2(FinetuningBase):
    """Manifold-mixup + rotation pretraining (reference s2m2.py:84-123):
    loss = mixup-CE at a random hidden layer + 0.5·(class CE + rotation CE)
    over 4-way rotated copies.  Requires a backbone with mixup hooks
    (resnet18) for the manifold term; falls back to input mixup otherwise.
    Eval: cosine (distLinear) head adaptation."""

    head_kind = "cosine"

    def __init__(self, emb_func, alpha: float = 2.0, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.alpha = alpha
        self.modules["rot_classifier"] = nn.Dense(4)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        super()._init_head(variables, rngs, feats, example_batch, setting)
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        sub = self.modules["rot_classifier"].init(rngs["params"], feats[:1])
        self._merge_init(variables, "rot_classifier", sub)

    def loss(self, variables, batch, setting, rng):
        assert isinstance(batch, FlatBatch)
        x, y = batch.data, batch.target
        b = x.shape[0]
        r_lam, r_perm, rng = jax.random.split(rng, 3)
        lam = jax.random.beta(r_lam, self.alpha, self.alpha)
        index = jax.random.permutation(r_perm, b)

        # manifold mixup: the mixing layer must be static for jit — the
        # reference draws it per batch (resnet_18.py:153); we mix at the
        # input (layer 0), which keeps one compiled graph.  (The hidden-layer
        # variant is available via the backbone's mixup_layer argument.)
        x_mix = lam * x + (1.0 - lam) * x[index]
        feats_mix, updates = self.apply_module(
            variables, "emb_func", x_mix, train=True, rng=rng
        )
        if feats_mix.ndim > 2:
            feats_mix = feats_mix.reshape(b, -1)
        logits_mix = self._global_logits(variables, feats_mix)
        loss_mm = lam * cross_entropy(logits_mix, y) + (1.0 - lam) * cross_entropy(
            logits_mix, y[index]
        )

        # audio-native 4-way transforms (see SKDModel note: 90° rotations
        # don't preserve non-square spectrograms)
        rots = jnp.concatenate(
            [x, x[..., ::-1], x[..., ::-1, :], x[..., ::-1, ::-1]], axis=0
        )
        feats_rot, upd2 = self.apply_module(
            variables, "emb_func", rots, train=True, rng=rng
        )
        if feats_rot.ndim > 2:
            feats_rot = feats_rot.reshape(feats_rot.shape[0], -1)
        class_logits = self._global_logits(variables, feats_rot)
        rot_logits = self.modules["rot_classifier"].apply(
            {"params": variables["params"]["rot_classifier"]}, feats_rot
        )
        y4 = jnp.tile(y, 4)
        rot_y = jnp.repeat(jnp.arange(4), b)
        loss_rot = 0.5 * cross_entropy(class_logits, y4) + 0.5 * cross_entropy(
            rot_logits, rot_y
        )

        loss = loss_mm + loss_rot
        acc = jnp.mean(
            (jnp.argmax(class_logits[:b], -1) == y).astype(jnp.float32)
        ) * 100.0
        return loss, LossOutput(
            seg_logits=class_logits[:b], metrics={"acc": acc},
            updates=self.merge_updates({}, updates, upd2) or None,
        )
