"""Finetuning-family methods: Baseline, Baseline++, RFS, NegNet, SKD.

Reference: libfewshot_core/model/finetuning/{baseline,baseline_plus,
rfs_model,negative_margin,skd_model}.py.  Training is plain global
classification over all train classes on flat batches
(baseline.py:84-104); evaluation trains a FRESH head on each episode's
support set (``set_forward_adaptation``, baseline.py:106-132) and classifies
the query segments.

TPU re-design: the per-episode host loop + torch optimizer becomes a
``vmap`` over episodes of a ``lax.scan`` of full-batch inner steps on the
head params (zero-initialized — deterministic, and CE on a linear head is
convex so minibatch shuffling buys nothing at n_support ≤ 75).  The backbone
runs once per batch, frozen (reference wraps it in ``torch.no_grad``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ...episode import EpisodeBatch, FlatBatch, segment_targets
from ...registry import CLASSIFIERS
from ..base import EpisodeSetting, LossOutput, MethodBase, ModelType
from ..losses import cross_entropy, distill_kl_loss


def cosine_scores(feats: jnp.ndarray, weights: jnp.ndarray, scale: float,
                  normalize_weights: bool = False) -> jnp.ndarray:
    """DistLinear (reference baseline_plus.py:27-66): L2-normalize features;
    with ``class_wise_learnable_norm`` (the reference default, WeightNorm on
    the fc), logits = scale · ‖w_c‖ · cos — i.e. the UNnormalized weight row
    against normalized features, so the per-class magnitude ‖w_c‖ is the
    learnable norm.  ``normalize_weights=True`` gives the plain-cosine
    variant (used by NegNet's margin formula, which needs cos ∈ [-1, 1])."""
    f = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-5)
    w = weights
    if normalize_weights:
        w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-5)
    return scale * (f @ w.T)


def sklearn_probe_logits(sup_f: jnp.ndarray, sup_y: jnp.ndarray,
                         qry_f: jnp.ndarray, way: int, C: float,
                         iters: int = 128) -> jnp.ndarray:
    """Converged L2-penalized multinomial logistic-regression probe — the
    exact objective sklearn's ``LogisticRegression(penalty="l2", C=C,
    solver="lbfgs", multi_class="multinomial")`` minimizes (reference
    deepbdc_pretrain.py:215-228, rfs_model.py:166-180, skd_model.py:199-212):

        min_{W,b}  0.5·‖W‖²_F + C · Σᵢ CE(xᵢ·W + b, yᵢ)

    with the intercept unpenalized.  The problem is strictly convex, so any
    solver reaching the optimum gives sklearn's solution; we run optax L-BFGS
    (zoom linesearch) to convergence under jit/vmap.  Callers L2-normalize
    features first, as the reference does on both support and query."""
    d = sup_f.shape[-1]
    sup_f = sup_f.astype(jnp.float32)
    qry_f = qry_f.astype(jnp.float32)
    params = {
        "w": jnp.zeros((d, way), jnp.float32),
        "b": jnp.zeros((way,), jnp.float32),
    }

    def objective(p):
        logp = jax.nn.log_softmax(sup_f @ p["w"] + p["b"])
        ce = -jnp.sum(jnp.take_along_axis(logp, sup_y[:, None], axis=1))
        return 0.5 * jnp.sum(p["w"] ** 2) + C * ce

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(objective)

    def step(carry, _):
        p, state = carry
        value, grad = value_and_grad(p, state=state)
        updates, state = opt.update(
            grad, state, p, value=value, grad=grad, value_fn=objective
        )
        return (optax.apply_updates(p, updates), state), None

    (params, _), _ = jax.lax.scan(
        step, (params, opt.init(params)), None, length=iters
    )
    return qry_f @ params["w"] + params["b"]


def reference_matched_adaptation(
    head_kind: str,
    init_params: Dict[str, Any],
    sup_f: jnp.ndarray,
    sup_y: jnp.ndarray,
    qry_f: jnp.ndarray,
    perms,
    batch_size: int,
    lr: float,
    momentum: float,
    weight_decay: float,
    way: int,
    margin: float = 0.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Bit-matched replay of the reference's ``set_forward_adaptation``
    inner loop (baseline.py:106-132, baseline_plus.py:133-160,
    s2m2.py:124-150, negative_margin.py:90-123): minibatch SGD over the
    given permutation schedule with torch ``optim.SGD`` semantics
    (d = g + wd·p; buf = d first step else m·buf + d; p −= lr·buf).

    For users migrating from the reference who need its exact eval-time
    adaptation (rather than the framework's deterministic full-batch
    default, ``FinetuningBase._episode_head_logits``): supply the torch
    head's initial parameters and the drawn ``randperm`` schedule.

    ``head_kind``:
      - ``"linear"`` — params {weight [way,D], bias [way]}; plain logits.
      - ``"dist_linear"`` — params {weight_g [way,1], weight_v [way,D]}
        (torch WeightNorm dim=0 decomposition); logits = scale ·
        (x/(‖x‖+1e-5)) @ (g·v/‖v‖)ᵀ.
      - ``"neg_cosine"`` — params {weight [way,D]}; inner-step logits
        subtract ``margin`` from the true-class cosine before ×scale
        (NegLayer.forward with a label); query logits are plain cosine
        ×scale.
    """
    params = {k: jnp.asarray(v, jnp.float32) for k, v in init_params.items()}

    def head_logits(p, x, labels=None):
        if head_kind == "linear":
            return x @ p["weight"].T + p["bias"]
        if head_kind == "dist_linear":
            xn = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-5)
            v = p["weight_v"]
            w = p["weight_g"] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
            return scale * (xn @ w.T)
        assert head_kind == "neg_cosine", head_kind
        # F.normalize eps=1e-12 (clamp_min)
        xn = x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12
        )
        wn = p["weight"] / jnp.maximum(
            jnp.linalg.norm(p["weight"], axis=1, keepdims=True), 1e-12
        )
        cos = xn @ wn.T
        if labels is None:
            return cos * scale
        onehot = jax.nn.one_hot(labels, way, dtype=cos.dtype)
        return (cos - margin * onehot) * scale

    def loss_fn(p, xb, yb):
        logits = head_logits(p, xb, yb if head_kind == "neg_cosine" else None)
        return cross_entropy(logits, yb)

    grad_fn = jax.jit(jax.grad(loss_fn))
    bufs = {k: jnp.zeros_like(v) for k, v in params.items()}
    n = sup_f.shape[0]
    step = 0
    for perm in perms:
        perm = jnp.asarray(perm)
        for i in range(0, n, batch_size):
            sel = perm[i : i + batch_size]
            grads = grad_fn(params, sup_f[sel], sup_y[sel])
            for k in params:
                d = grads[k] + weight_decay * params[k]
                bufs[k] = d if (step == 0 and momentum) else (
                    momentum * bufs[k] + d
                )
                params[k] = params[k] - lr * (bufs[k] if momentum else d)
            step += 1
    return head_logits(params, qry_f, None)


class FinetuningBase(MethodBase):
    model_type = ModelType.FINETUNING

    #: head kind used for BOTH global training and episode adaptation
    head_kind = "linear"  # "linear" | "cosine" | "neg_cosine"

    def __init__(self, emb_func, feat_dim: Optional[int] = None,
                 num_class: int = 25, inner_param: Optional[Dict] = None,
                 way_num: int = 5, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.num_class = num_class
        self.way_num = way_num
        inner_param = dict(inner_param or {})
        self.inner_steps = int(inner_param.get("inner_train_iter", 20))
        self.inner_batch = int(inner_param.get("inner_batch_size", 4))
        opt = dict(inner_param.get("inner_optim") or {})
        self.inner_lr = float(opt.get("lr", 0.01))
        self.inner_momentum = float(opt.get("momentum", 0.9) or 0.0)
        self.inner_wd = float(opt.get("weight_decay", 1e-3) or 0.0)
        self.modules["classifier"] = nn.Dense(num_class, use_bias=(self.head_kind == "linear"))

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        sub = self.modules["classifier"].init(rngs["params"], feats[:1])
        self._merge_init(variables, "classifier", sub)

    # -- global classification head (train path) ----------------------------

    def _global_logits(self, variables, feats):
        if self.head_kind == "linear":
            return self.modules["classifier"].apply(
                {"params": variables["params"]["classifier"]}, feats
            )
        w = variables["params"]["classifier"]["kernel"].T  # [num_class, D]
        scale = 2.0 if self.num_class <= 200 else 10.0
        return cosine_scores(feats, w, scale)

    def _train_loss(self, logits, targets):
        return cross_entropy(logits, targets)

    def loss(self, variables, batch, setting, rng):
        assert isinstance(batch, FlatBatch), (
            "FINETUNING-type methods train on flat batches (reference "
            "baseline.py:84-104)"
        )
        feats, updates = self.apply_module(
            variables, "emb_func", batch.data, train=True, rng=rng
        )
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        logits = self._global_logits(variables, feats)
        loss = self._train_loss(logits, batch.target)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch.target).astype(jnp.float32)) * 100.0
        return loss, LossOutput(
            seg_logits=logits, metrics={"acc": acc}, updates=updates
        )

    # -- per-episode head adaptation (eval path) -----------------------------

    def _adapt_steps(self, n_support: int) -> int:
        """Total inner steps: iterations × minibatches-per-epoch (the
        reference runs inner_train_iter epochs of inner_batch_size
        minibatches — full-batch steps at matched count here)."""
        return self.inner_steps * max(1, -(-n_support // self.inner_batch))

    def _episode_head_logits(self, sup_f, sup_y, qry_f, n_steps: int,
                             way: Optional[int] = None):
        d = sup_f.shape[-1]
        way = way or self.way_num
        if self.head_kind == "linear":
            # zero init: CE on a linear head is convex, deterministic start
            w0 = jnp.zeros((d, way), sup_f.dtype)
        else:
            # cosine heads can't start at 0 (0/‖0‖ has no gradient) —
            # warm-start with class prototypes of the support features
            onehot = jax.nn.one_hot(sup_y, way, dtype=sup_f.dtype)
            counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
            w0 = (sup_f.T @ onehot) / counts
        head = {
            "w": w0,
            "b": jnp.zeros((way,), sup_f.dtype),
        }
        tx = optax.chain(
            optax.add_decayed_weights(self.inner_wd),
            optax.trace(decay=self.inner_momentum) if self.inner_momentum
            else optax.identity(),
            optax.scale(-self.inner_lr),
        )
        opt_state = tx.init(head)

        def head_logits(h, f):
            if self.head_kind == "linear":
                return f @ h["w"] + h["b"]
            scale = 2.0 if way <= 200 else 10.0
            return cosine_scores(f, h["w"].T, scale)

        def support_loss(h):
            return cross_entropy(head_logits(h, sup_f), sup_y)

        def step(carry, _):
            h, st = carry
            grads = jax.grad(support_loss)(h)
            updates, st = tx.update(grads, st, h)
            return (optax.apply_updates(h, updates), st), None

        (head, _), _ = jax.lax.scan(
            step, (head, opt_state), None, length=n_steps
        )
        return head_logits(head, qry_f)

    def forward(self, variables, batch: EpisodeBatch, setting: EpisodeSetting):
        sup_f, qry_f, _ = self.embed(variables, batch, train=False)
        n_steps = self._adapt_steps(sup_f.shape[1])
        return jax.vmap(
            lambda s, y, q: self._episode_head_logits(
                s, y, q, n_steps, way=setting.way
            )
        )(sup_f, batch.support_target, qry_f)


@CLASSIFIERS.register("Baseline")
class Baseline(FinetuningBase):
    """Plain linear global head + fresh linear probe at eval
    (reference baseline.py)."""


@CLASSIFIERS.register("BaselinePlus")
class BaselinePlus(FinetuningBase):
    """Cosine (DistLinear) head everywhere (reference baseline_plus.py)."""

    head_kind = "cosine"


@CLASSIFIERS.register("NegNet")
class NegNet(FinetuningBase):
    """Negative-margin cosine softmax (Liu et al., ECCV 2020; reference
    negative_margin.py:21-46): subtract ``margin`` from the true-class cosine
    logit during global training; eval adaptation is plain cosine."""

    head_kind = "cosine"

    def __init__(self, emb_func, margin: float = -0.01, scale_factor: float = 30.0,
                 **kwargs):
        super().__init__(emb_func, **kwargs)
        self.margin = margin
        self.scale_factor = scale_factor
        inner = dict(kwargs.get("inner_param") or {})
        # eval adaptation trains a fresh NegLayer with ITS OWN margin/scale
        # (negative_margin.py:90-96), not the global-train ones
        self.inner_margin = float(inner.get("inner_margin", margin))
        self.inner_scale = float(inner.get("inner_scale_factor", scale_factor))

    def _episode_head_logits(self, sup_f, sup_y, qry_f, n_steps, way=None):
        """NegLayer adaptation (reference negative_margin.py:90-123) on the
        framework's deterministic full-batch schedule: prototype warm start
        (cosine heads can't start at 0), inner steps subtract
        ``inner_margin`` from the true-class cosine before ×``inner_scale``,
        query logits are plain cosine ×``inner_scale``.  Both sides
        L2-normalize features AND weights (NegLayer.forward)."""
        way = way or self.way_num
        onehot = jax.nn.one_hot(sup_y, way, dtype=sup_f.dtype)
        counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
        w0 = ((sup_f.T @ onehot) / counts).T  # [way, D]

        def cos(w, f):
            fn = f / jnp.maximum(
                jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12
            )
            wn = w / jnp.maximum(
                jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12
            )
            return fn @ wn.T

        def support_loss(w):
            logits = self.inner_scale * (cos(w, sup_f) - self.inner_margin * onehot)
            return cross_entropy(logits, sup_y)

        tx = optax.chain(
            optax.add_decayed_weights(self.inner_wd),
            optax.trace(decay=self.inner_momentum) if self.inner_momentum
            else optax.identity(),
            optax.scale(-self.inner_lr),
        )

        def step(carry, _):
            w, st = carry
            grads = jax.grad(support_loss)(w)
            updates, st = tx.update(grads, st, w)
            return (optax.apply_updates(w, updates), st), None

        (w, _), _ = jax.lax.scan(step, (w0, tx.init(w0)), None, length=n_steps)
        return self.inner_scale * cos(w, qry_f)

    def _global_logits(self, variables, feats):
        w = variables["params"]["classifier"]["kernel"].T
        # plain cosine (normalized weights): the margin formula needs
        # cos in [-1, 1]
        return cosine_scores(feats, w, 1.0, normalize_weights=True)

    def _train_loss(self, logits, targets):
        onehot = jax.nn.one_hot(targets, logits.shape[-1])
        return cross_entropy(
            self.scale_factor * (logits - self.margin * onehot), targets
        )


@CLASSIFIERS.register("RFSModel")
class RFSModel(FinetuningBase):
    """Rethinking-Few-Shot (Tian et al., 2020; reference rfs_model.py):
    global CE pretrain with optional born-again KL distillation; eval is a
    linear probe on L2-normalized features."""

    def __init__(self, emb_func, is_distill: bool = False, kd_T: float = 4.0,
                 alpha: float = 0.5, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.is_distill = is_distill
        self.kd_T = kd_T
        self.alpha = alpha
        self.teacher_variables = None  # set by the distillation pipeline

    def loss(self, variables, batch, setting, rng):
        loss, out = super().loss(variables, batch, setting, rng)
        if self.is_distill and self.teacher_variables is not None:
            t_feats, _ = self.apply_module(
                self.teacher_variables, "emb_func", batch.data, train=False
            )
            if t_feats.ndim > 2:
                t_feats = t_feats.reshape(t_feats.shape[0], -1)
            t_logits = self._global_logits(self.teacher_variables, t_feats)
            loss = loss + self.alpha * distill_kl_loss(out.seg_logits, t_logits, self.kd_T)
        return loss, out

    def _episode_head_logits(self, sup_f, sup_y, qry_f, n_steps, way=None):
        # reference rfs_model.py:166-180: converged sklearn LogisticRegression
        # (C=1.0) on L2-normalized features, not an SGD probe
        sup_f = sup_f / (jnp.linalg.norm(sup_f, axis=-1, keepdims=True) + 1e-5)
        qry_f = qry_f / (jnp.linalg.norm(qry_f, axis=-1, keepdims=True) + 1e-5)
        return sklearn_probe_logits(sup_f, sup_y, qry_f,
                                    way or self.way_num, C=1.0)


@CLASSIFIERS.register("SKDModel")
class SKDModel(FinetuningBase):
    """Self-supervised rotation pretraining (reference skd_model.py).

    Gen-0 (``is_distill=False``, skd_model.py:186-190, 227-239):
    4 transformed copies; ``loss = γ·CE(class_logits, target×4)
    + α·BCE_with_logits(rot_classifier(class_logits), one_hot(rot))`` —
    the rotation head reads the CLASS LOGITS, and its aux loss is the
    mean sigmoid BCE against the one-hot rotation id.

    Gen-1 (``is_distill`` with a teacher, skd_model.py:181-184, 220-226):
    only {id, 180°} copies; ``loss = γ·KL(class[:b], teacher(original))
    + α·L2DistLoss(class[b:], class[:b])/3`` — rotated-vs-original logit
    consistency (mean Euclidean norm), no CE term.

    Audio delta (documented): 90° rotations don't preserve non-square
    [F, T] spectrograms, so the 4-transform set is {id, time-flip,
    freq-flip, both}; the Gen-1 "180°" copy is the both-flip.
    Eval is an L2-normalized linear probe."""

    def __init__(self, emb_func, gamma: float = 1.0, alpha: float = 1.0,
                 is_distill: bool = False, kd_T: float = 4.0, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.gamma = gamma
        self.alpha = alpha
        self.is_distill = is_distill
        self.kd_T = kd_T
        self.teacher_variables = None
        self.modules["rot_classifier"] = nn.Dense(4)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        super()._init_head(variables, rngs, feats, example_batch, setting)
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        # rot head input = class logits (reference skd_model.py:187)
        logits = self._global_logits(variables, feats)
        sub = self.modules["rot_classifier"].init(rngs["params"], logits[:1])
        self._merge_init(variables, "rot_classifier", sub)

    def loss(self, variables, batch, setting, rng):
        assert isinstance(batch, FlatBatch)
        x = batch.data
        b = x.shape[0]
        if self.is_distill and self.teacher_variables is not None:
            # Gen-1: {id, both-flip} only (reference :220-226)
            copies = jnp.concatenate([x, x[..., ::-1, ::-1]], axis=0)
            feats, updates = self.apply_module(
                variables, "emb_func", copies, train=True, rng=rng
            )
            if feats.ndim > 2:
                feats = feats.reshape(feats.shape[0], -1)
            class_logits = self._global_logits(variables, feats)
            t_feats, _ = self.apply_module(
                self.teacher_variables, "emb_func", x, train=False
            )
            if t_feats.ndim > 2:
                t_feats = t_feats.reshape(t_feats.shape[0], -1)
            t_class = self._global_logits(self.teacher_variables, t_feats)
            gamma_loss = distill_kl_loss(class_logits[:b], t_class, self.kd_T)
            from ..losses import l2_dist_loss

            alpha_loss = l2_dist_loss(class_logits[b:], class_logits[:b]) / 3.0
        else:
            # Gen-0: 4-transform self-supervision (reference :227-239)
            copies = jnp.concatenate(
                [x, x[..., ::-1], x[..., ::-1, :], x[..., ::-1, ::-1]], axis=0
            )
            feats, updates = self.apply_module(
                variables, "emb_func", copies, train=True, rng=rng
            )
            if feats.ndim > 2:
                feats = feats.reshape(feats.shape[0], -1)
            class_logits = self._global_logits(variables, feats)
            y4 = jnp.tile(batch.target, 4)
            gamma_loss = cross_entropy(class_logits, y4)
            rot_logits = self.modules["rot_classifier"].apply(
                {"params": variables["params"]["rot_classifier"]}, class_logits
            )
            rot_onehot = jax.nn.one_hot(jnp.repeat(jnp.arange(4), b), 4)
            # torch.sum(F.binary_cross_entropy_with_logits(...)) — the inner
            # call already reduces to a scalar mean (reference :188-190)
            alpha_loss = jnp.mean(
                jnp.maximum(rot_logits, 0) - rot_logits * rot_onehot
                + jnp.log1p(jnp.exp(-jnp.abs(rot_logits)))
            )
        loss = self.gamma * gamma_loss + self.alpha * alpha_loss

        acc = jnp.mean(
            (jnp.argmax(class_logits[:b], -1) == batch.target).astype(jnp.float32)
        ) * 100.0
        return loss, LossOutput(
            seg_logits=class_logits[:b], metrics={"acc": acc}, updates=updates
        )

    def _episode_head_logits(self, sup_f, sup_y, qry_f, n_steps, way=None):
        # reference skd_model.py:199-212: converged sklearn LogisticRegression
        # (default C=1.0) on L2-normalized features
        sup_f = sup_f / (jnp.linalg.norm(sup_f, axis=-1, keepdims=True) + 1e-5)
        qry_f = qry_f / (jnp.linalg.norm(qry_f, axis=-1, keepdims=True) + 1e-5)
        return sklearn_probe_logits(sup_f, sup_y, qry_f,
                                    way or self.way_num, C=1.0)
