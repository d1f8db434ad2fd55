"""DSN — adaptive subspace classifiers (Simon et al., CVPR 2020).

Reference: libfewshot_core/model/metric/dsn.py — per-class subspace from the
SVD of the centered* support matrix (top ``shot-1`` left singular vectors,
:50-63; *the reference skips explicit centering and SVDs the raw support),
logit = −‖q − P Pᵀ q‖² / d; optional discriminative penalty = squared
Frobenius overlap of class subspaces (:78-89).  The reference's 1-shot
flip-augmentation branch is broken as snapshotted (dsn.py:145-150, SURVEY
§7.3); the subspace path requires shot ≥ 2, and 1-shot here falls back to
nearest-prototype (the projection onto a 0-dim subspace is degenerate).

TPU note: batched ``jnp.linalg.svd`` over [E·way] tiny matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy
from .proto_net import proto_logits


def dsn_logits(query_feat, support_feat, way, shot, normalize=True):
    """query [E,G,d], support [E,way·shot,d] → ([E,G,way], subspaces)."""
    e, ws, d = support_feat.shape
    sup = support_feat.reshape(e, way, shot, d)
    # [E,way,d,shot] → left singular vectors [E,way,d,min(d,shot)].
    # fp32 SVD: a float64 cast would be a silent no-op with jax x64 disabled
    # (the default, and the TPU configuration) — don't promise precision the
    # run doesn't get.  The shot×shot systems are tiny and well-conditioned.
    uu, _, _ = jnp.linalg.svd(
        sup.transpose(0, 1, 3, 2).astype(jnp.float32), full_matrices=False
    )
    k = max(shot - 1, 1)
    subspace = uu[..., :k].astype(query_feat.dtype)  # [E,way,d,k]
    # projection of each query onto each class subspace
    coef = jnp.einsum("ewdk,egd->ewgk", subspace, query_feat)
    proj = jnp.einsum("ewdk,ewgk->ewgd", subspace, coef)
    diff = query_feat[:, None, :, :] - proj
    dist = jnp.sum(diff * diff, axis=-1).transpose(0, 2, 1)  # [E,G,way]
    logits = -dist
    if normalize:
        logits = logits / d
    return logits, subspace


def dsn_disc_loss(subspace):
    """Discriminative subspace-overlap penalty (reference dsn.py:78-89)."""
    way = subspace.shape[1]
    overlap = jnp.einsum("ewdk,evdl->ewvkl", subspace, subspace)
    fro2 = jnp.sum(overlap ** 2, axis=(-2, -1))  # [E,way,way]
    mask = 1.0 - jnp.eye(way)
    return jnp.sum(fro2 * mask[None])


@CLASSIFIERS.register("DSN")
class DSN(MethodBase):
    model_type = ModelType.METRIC

    def __init__(self, emb_func, discriminative: bool = False,
                 disc_weight: float = 0.03, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.discriminative = discriminative
        self.disc_weight = disc_weight

    def _logits(self, qry, sup, setting):
        if setting.shot < 2:
            return proto_logits(qry, sup, setting.way, setting.shot), None
        return dsn_logits(qry, sup, setting.way, setting.shot)

    def loss(self, variables, batch, setting, rng):
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        seg_logits, subspace = self._logits(qry, sup, setting)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        if self.discriminative and subspace is not None:
            loss = loss + self.disc_weight * dsn_disc_loss(subspace)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        seg_logits, _ = self._logits(qry, sup, setting)
        return seg_logits
