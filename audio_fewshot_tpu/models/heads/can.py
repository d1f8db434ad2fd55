"""CAN — Cross Attention Networks (Hou et al., NeurIPS 2019).

Reference: libfewshot_core/model/metric/can.py — class prototypes and query
maps attend to each other through a CAM module (:124-186): position-wise
cosine correlation [hw×hw], GAP + a 1×1-conv bottleneck produce attention
logits, ``softmax(·/0.025)+1`` re-weights both sides; eval logit = scaled
cosine of GAP'd attended pairs (:199-211); training adds a global-class CE
over the attended query features through a 1×1-conv classifier (:258-266).
(The snapshot also contains an abandoned module-scope helper using ``self``
at :35-59 — not replicated; SURVEY §7.3.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy
from ..losses import cross_entropy


class CAM(nn.Module):
    """Shared cross-attention bottleneck (reference CAM :124-163,
    get_attention): the correlation map is averaged over OWN positions
    (``a.mean(3)``), squeezed through a 1×1-conv(+BN+relu) bottleneck over
    the partner-position axis (``mid_channels`` wide — the reference's
    ``HW`` kwarg), expanded back, and used to weight the partner columns;
    ``softmax(mean/0.025)+1`` over own positions is the attention.

    The reference hard-requires ``M == mid²`` (square 5×5/6×6 image maps,
    conv1 ``in_channels = mid*mid``); the Dense pair here accepts any M so
    non-square audio maps work, with ``mid`` a free bottleneck width
    (weight-convertible on square maps — tests/test_torch_parity5.py)."""

    mid: int

    @nn.compact
    def __call__(self, corr, train: bool = False):
        """corr [.., n1, n2, M_own, M_partner] → attention over own
        positions [.., n1, n2, M_own] (call twice, transposed, for the
        other side — the reference's a1/a2)."""
        from ..backbones.layers import BatchNorm

        m_partner = corr.shape[-1]
        a = corr.mean(axis=-2)  # GAP over own positions (reference a.mean(3))
        z = nn.Dense(self.mid, name="conv1")(a)
        z = BatchNorm(name="bn1")(z, train)  # reference ConvBlock BN
        z = nn.relu(z)
        z = nn.Dense(m_partner, name="conv2")(z)  # partner-position weights
        att_logits = jnp.mean(corr * z[..., None, :], axis=-1)
        return jax.nn.softmax(att_logits / 0.025, axis=-1) + 1.0


@CLASSIFIERS.register("CAN")
class CAN(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, scale_cls: float = 7.0,
                 iter_num_prob: float = 35.0 / 75, num_classes: int = 25,
                 nFeat: int = 640, HW: int = 5, **kwargs):
        # iter_num_prob belongs to the reference's commented-out
        # transductive stage (can.py:296-324); nFeat/HW are derived from the
        # feature map here — all three accepted for config parity only.
        super().__init__(emb_func, **kwargs)
        self.scale_cls = scale_cls
        self.num_classes = num_classes
        self._hw_hint = int(HW)
        self._hw = None  # sized at init
        self.modules["cam"] = None
        self.modules["global_fc"] = nn.Dense(num_classes)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        c, h, w = feats.shape[1:]
        hw = h * w
        self._hw = hw
        # reference bottleneck width (CAM(mid_channels=HW), requiring
        # hw == HW² on its square image maps); non-square audio maps get
        # mid ≈ √hw
        mid = self._hw_hint if hw == self._hw_hint ** 2 else max(
            1, int(round(hw ** 0.5))
        )
        self.modules["cam"] = CAM(mid=mid)
        corr = jnp.zeros((1, 2, 3, hw, hw), jnp.float32)
        sub = self.modules["cam"].init({"params": rngs["params"]}, corr)
        self._merge_init(variables, "cam", sub)
        sub = self.modules["global_fc"].init(rngs["params"], jnp.zeros((1, c)))
        self._merge_init(variables, "global_fc", sub)

    def _attended(self, variables, sup, qry, way, shot, train=False):
        """Cross-attended pairs.  Returns proto_att [E,G,way,c] (the
        reference GAPs prototypes before BOTH branches, can.py:245-246),
        qry_maps [E,G,way,c,hw] (UNpooled — the train losses are
        per-position, :251-266), updates."""
        e, ws, c, h, w = sup.shape
        g = qry.shape[1]
        hw = h * w
        proto = sup.reshape(e, way, shot, c, hw).mean(axis=2)  # [E,way,c,hw]
        q = qry.reshape(e, g, c, hw)

        pn = proto / jnp.maximum(jnp.linalg.norm(proto, axis=2, keepdims=True), 1e-12)
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=2, keepdims=True), 1e-12)
        # corr[e, way, g, hw_p, hw_q]
        corr = jnp.einsum("ewcx,egcy->ewgxy", pn, qn)

        a_p, upd1 = self.apply_module(variables, "cam", corr, train=train)
        a_q, upd2 = self.apply_module(
            variables, "cam", jnp.swapaxes(corr, -1, -2), train=train
        )

        proto_att = jnp.einsum("ewcx,ewgx->egwc", proto, a_p) / hw
        qry_maps = jnp.einsum("egcy,ewgy->egwcy", q, a_q)  # [E,G,way,c,hw]
        updates = self.merge_updates({}, upd1, upd2) if (upd1 or upd2) else {}
        return proto_att, qry_maps, updates

    def _sims(self, proto_att, qry_att):
        pn = proto_att / jnp.maximum(
            jnp.linalg.norm(proto_att, axis=-1, keepdims=True), 1e-12
        )
        qn = qry_att / jnp.maximum(
            jnp.linalg.norm(qry_att, axis=-1, keepdims=True), 1e-12
        )
        return self.scale_cls * jnp.sum(pn * qn, axis=-1)  # [E,G,way]

    def loss(self, variables, batch, setting, rng):
        """Reference training objective (can.py:466-472): per-position
        global CE (1×1-conv classifier on the true-class attended map) +
        0.5 × per-position metric CE (cosine of per-position query features
        vs the GAP'd prototype)."""
        sup, qry, updates = self.embed(variables, batch, train=True, rng=rng)
        proto_att, qry_maps, upd2 = self._attended(
            variables, sup, qry, setting.way, setting.shot, train=True
        )
        updates = self.merge_updates({}, updates, upd2) if (updates or upd2) else None
        targets = segment_targets(batch)
        mask = batch.query_mask

        # per-position metric CE (reference cls_scores, :251-256)
        pn = proto_att / jnp.maximum(
            jnp.linalg.norm(proto_att, axis=-1, keepdims=True), 1e-12
        )
        qmn = qry_maps / jnp.maximum(
            jnp.linalg.norm(qry_maps, axis=3, keepdims=True), 1e-12
        )
        pos_scores = self.scale_cls * jnp.einsum("egwcy,egwc->egwy", qmn, pn)
        logp = jax.nn.log_softmax(pos_scores, axis=2)  # over way, per position
        picked = jnp.take_along_axis(
            logp, targets[:, :, None, None], axis=2
        )[:, :, 0, :]  # [E,G,hw]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        metric_loss = -jnp.sum(jnp.mean(picked, axis=-1) * mask) / denom

        # summed-over-positions scores drive metrics/vote (reference :473-476)
        seg_logits = jnp.sum(pos_scores, axis=-1)
        loss = 0.5 * metric_loss

        if batch.global_target is not None:
            # per-position global CE on the true-class attended map
            # (reference :258-266 — our Dense per position == their 1×1 conv)
            true_maps = jnp.take_along_axis(
                qry_maps, targets[:, :, None, None, None], axis=2
            )[:, :, 0]  # [E,G,c,hw]
            glogits = self.modules["global_fc"].apply(
                {"params": variables["params"]["global_fc"]},
                jnp.swapaxes(true_maps, -1, -2),  # [E,G,hw,c]
            )  # [E,G,hw,num_classes]
            g_qry = batch.global_target[:, sup.shape[1]:]
            # a silent skip here would train without the aux term and
            # without a sound — fail loudly on a wrong global_target layout
            assert glogits.shape[:2] == g_qry.shape, (
                f"CAN global-CE layout mismatch: attended logits "
                f"{glogits.shape[:2]} vs query global targets {g_qry.shape} "
                "(global_target must be [support ‖ query] along axis 1)"
            )
            glogp = jax.nn.log_softmax(glogits, axis=-1)
            gpicked = jnp.take_along_axis(
                glogp, g_qry[:, :, None, None], axis=-1
            )[..., 0]  # [E,G,hw]
            global_loss = -jnp.sum(jnp.mean(gpicked, axis=-1) * mask) / denom
            loss = loss + global_loss
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        proto_att, qry_maps, _ = self._attended(
            variables, sup, qry, setting.way, setting.shot
        )
        # eval pools both sides (reference val(), can.py:205-211)
        return self._sims(proto_att, qry_maps.mean(axis=-1))
