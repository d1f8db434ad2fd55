"""MAML-family meta-learners: MAML, ANIL, BOIL.

Reference: libfewshot_core/model/meta/{maml,anil,boil}.py.  The reference
implements fast weights by monkey-attribute ``.fast`` twins of every layer
(backbone/utils/maml_module.py) and loops episodes in Python with
``torch.autograd.grad(create_graph=True)`` (maml.py:125-161, SURVEY §3.3).

TPU re-design: the inner loop is a ``jax.lax.scan`` over SGD steps on a
params pytree, ``vmap``-ed over the episode axis; outer differentiation
through the scan yields exact second-order gradients with no fast-weight
machinery.  BN inside the loop uses batch statistics (the reference's
``BatchNorm2d_fw`` momentum-1 semantics — set backbone
``use_running_statistics: false``, SURVEY §7.3).

Family deltas:
- MAML (maml.py): adapt ALL parameters, one inner LR.
- ANIL (anil.py:122-146): adapt the linear head only; backbone features are
  computed ONCE outside the loop (big win — no backbone re-forward per step).
- BOIL (boil.py:151-174): per-group LRs keyed extractor vs classifier
  (body-only when ``classifier_lr = 0``); test modes ``Directly`` /
  ``Once_update`` / ``NIL`` (boil.py:75-95).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


from ..losses import cross_entropy as _ce  # noqa: E402  (shared helper)


class MAMLBase(MethodBase):
    model_type = ModelType.META
    #: the inner loop applies the backbone with ``train=False`` and never
    #: merges batch_stats — build_method forces batch-stat BN (reference
    #: BatchNorm2d_fw semantics, maml_module.py:84-108)
    requires_batch_stat_bn = True

    def __init__(self, emb_func, inner_param: Optional[Dict] = None,
                 feat_dim: Optional[int] = None, way_num: int = 5, **kwargs):
        super().__init__(emb_func, **kwargs)
        inner_param = inner_param or {}
        self.inner_lr = float(inner_param.get("lr", 1e-2))
        self.train_iter = int(inner_param.get("train_iter", 5))
        self.test_iter = int(inner_param.get("test_iter", 10))
        self.way_num = way_num
        self.modules["classifier"] = nn.Dense(way_num)
        # can the backbone mask padded rows out of its BN batch statistics?
        import inspect
        self._mask_kw = "sample_mask" in inspect.signature(
            type(emb_func).__call__
        ).parameters

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        sub = self.modules["classifier"].init(rngs["params"], feats[:1])
        self._merge_init(variables, "classifier", sub)

    # -- pure-network application over explicit (possibly adapted) params ----

    def _net(self, params: Dict[str, Any], batch_stats, x: jnp.ndarray,
             sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        emb_vars = {"params": params["emb_func"]}
        mutable = False
        if batch_stats and "emb_func" in batch_stats:
            emb_vars["batch_stats"] = batch_stats["emb_func"]
            mutable = ["batch_stats"]
        # bucket-padded rows must not perturb the batch-stat BN statistics
        # of real rows (the reference sees only real segments — maml.py:79);
        # only backbones exposing ``sample_mask`` (Conv64F — every shipped
        # MAML-family config) can honor this, detected once in __init__
        kw = {"sample_mask": sample_mask} if (
            sample_mask is not None and self._mask_kw
        ) else {}
        out = self.emb_func.apply(emb_vars, x, train=False, mutable=mutable, **kw)
        feats = out[0] if mutable else out
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        return self._head_logits(params, feats), feats

    def _head_logits(self, params, feats):
        return self.modules["classifier"].apply(
            {"params": params["classifier"]}, feats
        )

    # -- inner loop ---------------------------------------------------------

    def _adaptable(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Subtree of params the inner loop updates.

        All parameters EXCEPT a Conv64F logits-head BatchNorm1d's
        scale/bias: the reference's ``convert_maml_module`` swaps only
        Conv2d/Linear/BatchNorm2d for fast-weight twins
        (maml_module.py:111-146), so the BatchNorm1d inside Conv64F's
        1600-d projection head (conv_four.py:87-92 — present in every
        shipped MAML config, config/classifiers/MAML.yaml is_flatten=True)
        keeps reading its ORIGINAL weight/bias during the inner loop —
        effectively frozen.  Pinned by the torch oracle
        (tests/test_maml_oracle.py)."""
        emb = params.get("emb_func", {})
        if "logits_bn" not in emb:
            return params
        return {
            **{k: v for k, v in params.items() if k != "emb_func"},
            "emb_func": {k: v for k, v in emb.items() if k != "logits_bn"},
        }

    @staticmethod
    def _merge_adapted(full: Dict[str, Any], adapted: Dict[str, Any]) -> Dict[str, Any]:
        """Overlay the (possibly partial) adapted subtree onto the full
        params — one nested level is enough (submodule → child trees)."""
        out = dict(full)
        for k, sub in adapted.items():
            if isinstance(sub, dict) and isinstance(full.get(k), dict):
                out[k] = {**full[k], **sub}
            else:
                out[k] = sub
        return out

    def _inner_lr_tree(self, adaptable: Dict[str, Any]):
        return jax.tree_util.tree_map(lambda _: self.inner_lr, adaptable)

    def _episode_logits(self, params, batch_stats, sup_x, sup_y, qry_x,
                        qry_mask, n_steps):
        """One episode: adapt on support, return query logits.  All inputs
        are single-episode ([WS,...], [WS], [G,...], [G]) — vmapped by
        callers.  Support rows are always dense; the query pass masks
        bucket padding out of the batch-stat BN statistics."""
        adaptable = self._adaptable(params)
        lr_tree = self._inner_lr_tree(adaptable)

        def support_loss(adapt_p):
            logits, _ = self._net(
                self._merge_adapted(params, adapt_p), batch_stats, sup_x
            )
            return _ce(logits, sup_y)

        def sgd_step(adapt_p, _):
            grads = jax.grad(support_loss)(adapt_p)
            new_p = jax.tree_util.tree_map(
                lambda w, g, lr: w - lr * g, adapt_p, grads, lr_tree
            )
            return new_p, None

        adapted, _ = jax.lax.scan(sgd_step, adaptable, None, length=n_steps)
        logits, _ = self._net(
            self._merge_adapted(params, adapted), batch_stats, qry_x,
            sample_mask=qry_mask > 0,
        )
        return logits

    # -- method API ---------------------------------------------------------

    def _run(self, variables, batch, setting, n_steps):
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        episode_fn = partial(self._episode_logits, params, batch_stats)
        seg_logits = jax.vmap(episode_fn, in_axes=(0, 0, 0, 0, None))(
            batch.support, batch.support_target, batch.query,
            batch.query_mask, n_steps,
        )
        return seg_logits

    def loss(self, variables, batch, setting, rng):
        seg_logits = self._run(variables, batch, setting, self.train_iter)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=None,
        )

    def forward(self, variables, batch, setting):
        return self._run(variables, batch, setting, self.test_iter)


@CLASSIFIERS.register("MAML")
class MAML(MAMLBase):
    """Full-network fast weights (reference maml.py)."""


@CLASSIFIERS.register("ANIL")
class ANIL(MAMLBase):
    """Head-only adaptation with frozen, precomputed features (reference
    anil.py:122-146) — the backbone runs ONCE per episode batch.

    Unlike MAML/BOIL, the reference converts ONLY the classifier to fast
    weights (anil.py:65 ``convert_maml_module(self.classifier)``); the
    backbone keeps standard BatchNorm — running statistics at eval — so
    the batch-stat force does not apply here (torch oracle:
    tests/test_maml_oracle.py)."""

    requires_batch_stat_bn = False

    def loss(self, variables, batch, setting, rng):
        # the backbone runs in train mode (standard BN batch stats +
        # running-stat updates, reference set_forward_loss path) — the
        # inner loop itself only touches the head
        seg_logits, updates = self._anil_logits(
            variables, batch, self.train_iter, train=True, rng=rng
        )
        loss = masked_cross_entropy(
            seg_logits, segment_targets(batch), batch.query_mask
        )
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def _run(self, variables, batch, setting, n_steps):
        seg_logits, _ = self._anil_logits(variables, batch, n_steps, train=False)
        return seg_logits

    def _anil_logits(self, variables, batch, n_steps, train, rng=None):
        sup_f, qry_f, updates = self.embed(variables, batch, train=train, rng=rng)
        params = variables["params"]

        def episode_fn(sup_feats, sup_y, qry_feats):
            head0 = {"classifier": params["classifier"]}
            lr_tree = jax.tree_util.tree_map(lambda _: self.inner_lr, head0)

            def support_loss(hp):
                return _ce(self._head_logits(hp, sup_feats), sup_y)

            def sgd_step(hp, _):
                grads = jax.grad(support_loss)(hp)
                return (
                    jax.tree_util.tree_map(
                        lambda w, g, lr: w - lr * g, hp, grads, lr_tree
                    ),
                    None,
                )

            adapted, _ = jax.lax.scan(sgd_step, head0, None, length=n_steps)
            return self._head_logits(adapted, qry_feats)

        seg_logits = jax.vmap(episode_fn)(sup_f, batch.support_target, qry_f)
        return seg_logits, updates


@CLASSIFIERS.register("BOIL")
class BOIL(MAMLBase):
    """Body-only inner loop: per-group LRs (reference boil.py:151-174;
    ``classifier_lr`` usually 0).

    Reference deltas (see PARITY.md):

    - Training takes exactly ONE inner step — the reference calls
      ``set_forward_adaptation`` once per episode with no iteration loop
      (boil.py:126-135) — so ``train_iter`` defaults to 1 here (still
      overridable via ``inner_param``).
    - The reference's per-param LR key ``"Linear" in name``
      (boil.py:170) never matches any ``named_parameters()`` path (the
      head param is ``classifier.layers.0.weight``), so as snapshotted
      EVERY param updates at ``extractor_lr``.  We key on the submodule
      (emb_func vs classifier) — the paper's intent.  The shipped config
      sets both LRs to 1e-2 (config/classifiers/BOIL.yaml), making the
      two keyings identical there; the torch oracle runs under that
      equal-LR regime (tests/test_maml_oracle.py).
    - Eval mode comes from the reference's ``testing_method`` classifier
      kwarg (BOIL.yaml ships ``NIL``); ``inner_param.test_mode`` is kept
      as an alias.
    """

    def __init__(self, emb_func, inner_param: Optional[Dict] = None,
                 testing_method: Optional[str] = None, **kwargs):
        super().__init__(emb_func, inner_param=inner_param, **kwargs)
        inner_param = inner_param or {}
        self.extractor_lr = float(inner_param.get("extractor_lr", self.inner_lr))
        self.classifier_lr = float(inner_param.get("classifier_lr", 0.0))
        self.train_iter = int(inner_param.get("train_iter", 1))
        self.test_mode = str(
            testing_method or inner_param.get("test_mode", "Once_update")
        )

    def _inner_lr_tree(self, adaptable):
        return {
            k: jax.tree_util.tree_map(
                lambda _: self.extractor_lr if k == "emb_func" else self.classifier_lr,
                sub,
            )
            for k, sub in adaptable.items()
        }

    def _nil_logits(self, variables, batch, setting):
        """NIL head: drop the classifier — cosine similarity of query
        features against adapted-body class prototypes (boil.py:86-95)."""
        params = variables["params"]
        batch_stats = variables.get("batch_stats")

        def episode_fn(sup_x, sup_y, qry_x, qry_mask):
            adaptable = self._adaptable(params)
            lr_tree = self._inner_lr_tree(adaptable)

            def support_loss(adapt_p):
                logits, _ = self._net(
                    self._merge_adapted(params, adapt_p), batch_stats, sup_x
                )
                return _ce(logits, sup_y)

            grads = jax.grad(support_loss)(adaptable)
            adapted = jax.tree_util.tree_map(
                lambda w, g, lr: w - lr * g, adaptable, grads, lr_tree
            )
            merged = self._merge_adapted(params, adapted)
            _, sup_f = self._net(merged, batch_stats, sup_x)
            _, qry_f = self._net(
                merged, batch_stats, qry_x, sample_mask=qry_mask > 0
            )
            # the EVAL-time way, not the train config's way_num — the
            # reference swaps way_num at test via reverse_setting_info, and
            # NIL drops the head so nothing else pins the class count
            onehot = jax.nn.one_hot(sup_y, setting.way, dtype=sup_f.dtype)
            proto = (onehot.T @ sup_f) / jnp.maximum(
                jnp.sum(onehot, axis=0)[:, None], 1.0
            )
            qn = qry_f / jnp.maximum(
                jnp.linalg.norm(qry_f, axis=-1, keepdims=True), 1e-12
            )
            pn = proto / jnp.maximum(
                jnp.linalg.norm(proto, axis=-1, keepdims=True), 1e-12
            )
            return qn @ pn.T

        return jax.vmap(episode_fn)(
            batch.support, batch.support_target, batch.query, batch.query_mask
        )

    def forward(self, variables, batch, setting):
        # reference test modes (boil.py:75-95): Directly = no adaptation,
        # Once_update = one body step, NIL = drop the head, cosine-match
        # query features against adapted-body class prototypes
        if self.test_mode == "Directly":
            return self._run(variables, batch, setting, 0)
        if self.test_mode == "NIL":
            return self._nil_logits(variables, batch, setting)
        return self._run(variables, batch, setting, 1)
