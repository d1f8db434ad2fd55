"""DiffKendall — few-shot classification with differentiable Kendall rank
correlation (Zheng et al., NeurIPS 2023).

Reference: libfewshot_core/model/metric/meta_baseline_kendall.py — train
with the sigmoid-smoothed correlation ``diffkendall`` (:32-48), evaluate
with the exact sign version (:50-63); both against class-mean prototypes
(MetaBaseline skeleton).  ``MetabaselineKendallPretrain``
(metabaselinekendall_pretrain.py) is the matching global-CE pretrainer.

TPU design: the reference loops episodes and materializes all channel
pairs at once.  For d channels there are d(d−1)/2 pairs (1600-d Conv64F
features → 1.28 M pairs), so the pairwise tensors are built in fixed-size
chunks inside a ``lax.scan`` — bounded memory, fully fused per chunk, no
host loops.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy
from .finetuning import FinetuningBase
from .proto_net import prototypes

_CHUNK = 8192


def _pair_indices(d: int) -> Tuple[np.ndarray, np.ndarray]:
    iu = np.triu_indices(d, k=1)
    return iu[0].astype(np.int32), iu[1].astype(np.int32)


def _pad_to_chunks(i_idx, j_idx):
    p = len(i_idx)
    n_chunks = -(-p // _CHUNK)
    pad = n_chunks * _CHUNK - p
    # pad with pair (0, 0): diff = 0 → contributes sigmoid(0)*2-1 = 0 (diff)
    # and sign 0 (exact) — harmless, but excluded from the mean via p_true
    i_pad = np.concatenate([i_idx, np.zeros(pad, np.int32)])
    j_pad = np.concatenate([j_idx, np.zeros(pad, np.int32)])
    return (
        jnp.asarray(i_pad.reshape(n_chunks, _CHUNK)),
        jnp.asarray(j_pad.reshape(n_chunks, _CHUNK)),
        p,
    )


def kendall_logits(query, proto, beta=1.0, temperature=0.0125, exact=False):
    """[E,G,d] × [E,way,d] → [E,G,way] Kendall correlation scores.

    ``exact=False``: differentiable ``2σ(β·Δq·Δs) − 1`` pair score (reference
    :32-48, divided by T).  ``exact=True``: sign agreement / num_pairs
    (reference :50-63)."""
    d = query.shape[-1]
    i_np, j_np = _pair_indices(d)
    i_chunks, j_chunks, p_true = _pad_to_chunks(i_np, j_np)

    def chunk_score(carry, idx_pair):
        i_idx, j_idx = idx_pair
        qd = jnp.take(query, i_idx, axis=-1) - jnp.take(query, j_idx, axis=-1)
        sd = jnp.take(proto, i_idx, axis=-1) - jnp.take(proto, j_idx, axis=-1)
        if exact:
            prod = jnp.einsum("egp,ewp->egw", jnp.sign(qd), jnp.sign(sd))
        else:
            # σ(β·Δq·Δs) needs the elementwise pair product per (g, w); the
            # [E,G,way,chunk] tensor is bounded by the chunk size
            prod = jnp.sum(
                2.0 * jax.nn.sigmoid(
                    beta * qd[:, :, None, :] * sd[:, None, :, :]
                ) - 1.0,
                axis=-1,
            )
        return carry + prod, None

    e, g = query.shape[:2]
    way = proto.shape[1]
    init = jnp.zeros((e, g, way), query.dtype)
    total, _ = jax.lax.scan(chunk_score, init, (i_chunks, j_chunks))
    score = total / p_true
    if not exact:
        score = score / temperature
    return score


@CLASSIFIERS.register("MetaBaselineKendall")
class MetaBaselineKendall(MethodBase):
    model_type = ModelType.METRIC

    def __init__(self, emb_func, beta: float = 1.0, temperature: float = 0.0125,
                 **kwargs):
        super().__init__(emb_func, **kwargs)
        self.beta = beta
        self.temperature = temperature

    def loss(self, variables, batch, setting, rng):
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        proto = prototypes(sup, setting.way, setting.shot)
        seg_logits = kendall_logits(qry, proto, self.beta, self.temperature,
                                    exact=False)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        proto = prototypes(sup, setting.way, setting.shot)
        return kendall_logits(qry, proto, exact=True)


# reference alias (metric/__init__.py exports DiffKendall)
CLASSIFIERS.register_alias("DiffKendall", "MetaBaselineKendall")


@CLASSIFIERS.register("MetabaselineKendallPretrain")
class MetabaselineKendallPretrain(FinetuningBase):
    """Global-CE pretrain with exact-Kendall meta-validation (reference
    metabaselinekendall_pretrain.py)."""

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        proto = prototypes(sup, setting.way, setting.shot)
        return kendall_logits(qry, proto, exact=True)
