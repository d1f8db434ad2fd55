"""Method base classes — the functional re-design of the reference's
``AbstractModel`` hierarchy (reference libfewshot_core/model/abstract_model.py,
model/metric/metric_model.py, model/meta/meta_model.py,
model/finetuning/finetuning_model.py).

Design: a *method* is a plain Python class owning flax modules (``emb_func``
backbone + optional parametric head) and exposing pure functions:

    init_variables(rng, example_batch)               -> variables
    loss(variables, batch, setting, rng)             -> (loss, LossOutput)   [train]
    forward(variables, batch, setting)               -> seg_logits [E,G,way] [eval]

``variables`` is a single pytree ``{"params": {"emb_func": ..., "head": ...},
"batch_stats": {...}}`` — the same layout a parent linen module would
produce, so per-submodule learning rates (reference ``optimizer.other``,
trainer.py:529-565) partition on the first params level, and ``save_part``
checkpoints slice the same way.

Because methods are not modules, meta-learners (MAML/ANIL/BOIL/MeTAL) can run
``jax.grad`` over (subsets of) the variable tree inside ``loss`` — the inner
loop is a ``lax.scan`` over SGD steps, and outer differentiation through it
gives exact second-order gradients (reference fast-weight machinery,
backbone/utils/maml_module.py, becomes unnecessary).

There is no ``reverse_setting_info`` mutation (reference
abstract_model.py:414-429): the episode setting (way/shot/query) is an
explicit static argument, so train and eval settings simply produce two jit
specializations.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..episode import EpisodeBatch, segment_targets
from ..utils.aggregate import majority_vote, segment_accuracy, vote_categorical_acc


class ModelType(enum.Enum):  # reference utils/enum_type.py
    ABSTRACT = 0
    METRIC = 1
    META = 2
    FINETUNING = 3


@dataclass(frozen=True)
class EpisodeSetting:
    """Static episode geometry. Hashable → usable as a jit static arg."""

    way: int
    shot: int
    query: int


@struct.dataclass
class LossOutput:
    seg_logits: jnp.ndarray  # [E, G, way]
    metrics: Dict[str, jnp.ndarray]
    updates: Optional[Dict[str, Any]] = None  # mutated collections (batch_stats)


def masked_cross_entropy(
    seg_logits: jnp.ndarray, seg_target: jnp.ndarray, mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Mean CE over valid query segments (reference trains per-segment CE,
    e.g. proto_net.py:151)."""
    logp = jax.nn.log_softmax(seg_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, seg_target[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class MethodBase:
    model_type = ModelType.ABSTRACT
    #: whether ``embed`` should keep spatial maps ([N,C,H,W]) or flatten to [N,D]
    needs_feature_map = False

    def __init__(self, emb_func: nn.Module, **kwargs):
        self.emb_func = emb_func
        self.kwargs = kwargs
        self.modules: Dict[str, nn.Module] = {"emb_func": emb_func}

    # -- variables ----------------------------------------------------------

    def init_variables(self, rng: jax.Array, example_batch: EpisodeBatch, setting: EpisodeSetting) -> Dict[str, Any]:
        """Initialize all submodules by tracing one forward pass."""
        rngs = self._rngs(rng)
        variables: Dict[str, Any] = {"params": {}, "batch_stats": {}}

        from ..episode import FlatBatch

        if isinstance(example_batch, FlatBatch):
            x = example_batch.data
        else:
            x = self._flatten_inputs(example_batch)
        sub = self.emb_func.init(rngs, x[:1], train=True)
        self._merge_init(variables, "emb_func", sub)

        feats, _ = self.apply_module(
            variables, "emb_func",
            x[: max(2, setting.way * (setting.shot + 1))],
            train=False,
        )
        self._init_head(variables, rngs, feats, example_batch, setting)
        if not variables["batch_stats"]:
            variables.pop("batch_stats")
        return variables

    def _init_head(self, variables, rngs, feats, example_batch, setting) -> None:
        """Override in methods with parametric heads."""

    def _merge_init(self, variables: Dict[str, Any], name: str, sub: Dict[str, Any]) -> None:
        for col, tree in sub.items():
            variables.setdefault(col, {})[name] = tree

    @staticmethod
    def _rngs(rng: jax.Array) -> Dict[str, jax.Array]:
        kp, kd, kb, kn = jax.random.split(rng, 4)
        return {"params": kp, "dropout": kd, "dropblock": kb, "noise": kn}

    def sub_variables(self, variables: Dict[str, Any], name: str) -> Dict[str, Any]:
        return {col: tree[name] for col, tree in variables.items() if name in tree}

    def apply_module(
        self,
        variables: Dict[str, Any],
        name: str,
        *args,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        **kw,
    ) -> Tuple[Any, Dict[str, Any]]:
        """Apply a registered submodule; returns (output, mutated-collections)."""
        module = self.modules[name]
        sub = self.sub_variables(variables, name)
        rngs = self._rngs(rng) if rng is not None else None
        if rngs:
            rngs.pop("params")
        if "batch_stats" in sub:
            # always mutable: batch-stat-only BN (torch momentum=1 semantics,
            # e.g. RelationLayer) writes batch_stats even in eval — but only
            # train-time updates are folded back into the variable tree.
            out, mut = module.apply(sub, *args, train=train, rngs=rngs, mutable=["batch_stats"], **kw)
            if train:
                return out, {"batch_stats": {name: mut["batch_stats"]}}
            return out, {}
        out = module.apply(sub, *args, train=train, rngs=rngs, **kw)
        return out, {}

    @staticmethod
    def merge_updates(variables: Dict[str, Any], *updates: Dict[str, Any]) -> Dict[str, Any]:
        """Fold mutated collections back into the variable tree."""
        new = {col: dict(tree) for col, tree in variables.items()}
        for upd in updates:
            for col, tree in (upd or {}).items():
                new.setdefault(col, {})
                new[col] = dict(new[col])
                new[col].update(tree)
        return new

    # -- episode embedding --------------------------------------------------

    @staticmethod
    def _flatten_inputs(batch: EpisodeBatch) -> jnp.ndarray:
        e = batch.num_episodes
        seg = batch.segment_shape
        sup = batch.support.reshape((e * batch.support.shape[1],) + seg)
        qry = batch.query.reshape((e * batch.query.shape[1],) + seg)
        return jnp.concatenate([sup, qry], axis=0)

    def embed(
        self,
        variables: Dict[str, Any],
        batch: EpisodeBatch,
        train: bool,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, Any]]:
        """Embed support+query in ONE backbone call (matches the reference,
        which runs the whole flat batch through ``emb_func`` so BN batch
        statistics cover the full episode batch — e.g. proto_net.py:90).

        Returns (support_feat [E,WS,...], query_feat [E,G,...], updates).
        """
        e = batch.num_episodes
        ws = batch.support.shape[1]
        g = batch.query.shape[1]
        x = self._flatten_inputs(batch)
        feats, updates = self.apply_module(variables, "emb_func", x, train=train, rng=rng)
        if not self.needs_feature_map and feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        sup = feats[: e * ws].reshape((e, ws) + feats.shape[1:])
        qry = feats[e * ws :].reshape((e, g) + feats.shape[1:])
        return sup, qry, updates

    # -- method API ---------------------------------------------------------

    def loss(
        self,
        variables: Dict[str, Any],
        batch: EpisodeBatch,
        setting: EpisodeSetting,
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, LossOutput]:
        raise NotImplementedError

    def forward(
        self, variables: Dict[str, Any], batch: EpisodeBatch, setting: EpisodeSetting
    ) -> jnp.ndarray:
        raise NotImplementedError

    # -- shared metric plumbing --------------------------------------------

    def train_metrics(self, seg_logits, batch: EpisodeBatch) -> Dict[str, jnp.ndarray]:
        return {
            "acc": segment_accuracy(seg_logits, segment_targets(batch), batch.query_mask)
        }

    def eval_episode_accuracy(
        self, seg_logits: jnp.ndarray, batch: EpisodeBatch
    ) -> jnp.ndarray:
        """Per-episode clip-level majority-vote accuracy [E] in percent
        (reference eval protocol: majority_vote + vote_catagorical_acc)."""
        preds = majority_vote(
            seg_logits, batch.query_clip, batch.query_mask, batch.num_query_clips
        )
        return jnp.mean(
            (preds == batch.query_target).astype(jnp.float32), axis=-1
        ) * 100.0
