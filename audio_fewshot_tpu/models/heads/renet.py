"""RENet — Relational Embedding Networks (Kang et al., ICCV 2021).

Reference: libfewshot_core/model/finetuning/renet.py — SCR (:131-233): 5×5
self-correlation of L2-normalized features refined by a small conv stack and
added residually; CCA (:235-343): 4-D correlation between 1×1-reduced
query/support maps, refined by a conv module, gaussian-normalized, softmaxed
into bidirectional attentions that re-weight the embeddings; logits = cosine
of attended pooled embeddings / temperature.  Training combines the episodic
CE with global-classification auxiliary losses (:404-451,
``loss = λ_epi·epi + aux + abs``).

The reference trains this episodically with global targets despite its
FINETUNING family tag; here it is a metric-typed method consuming episodic
batches (global targets ride in ``EpisodeBatch.global_target``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..backbones.layers import BatchNorm
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy
from ..losses import cross_entropy


class SCRLayer(nn.Module):
    """Self-correlation + refinement (reference SCR/SelfCorrelationComputation)."""

    channels: int = 64
    kernel: int = 5

    @nn.compact
    def __call__(self, x, train: bool):
        # x: [N, H, W, C] NHWC
        n, h, w, c = x.shape
        ident = nn.relu(x)
        ident = ident / jnp.maximum(
            jnp.linalg.norm(ident, axis=-1, keepdims=True), 1e-12
        )
        k = self.kernel
        pad = k // 2
        padded = jnp.pad(ident, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        # neighborhood products: [N,H,W,C,k,k]
        patches = jnp.stack(
            [
                jnp.stack(
                    [padded[:, du:du + h, dv:dv + w, :] for dv in range(k)], axis=-1
                )
                for du in range(k)
            ],
            axis=-2,
        )  # [N,H,W,C,k,k]
        corr = patches * ident[..., None, None]

        # refinement: 1x1 in → two (k_u,k_v) convs over the (u,v) plane →
        # 1x1 out; treat (N·H·W) as batch, (u,v) as the spatial plane
        y = corr.reshape(n * h * w, c, self.kernel, self.kernel)
        y = y.transpose(0, 2, 3, 1)  # [NHW, u, v, C]
        y = nn.relu(BatchNorm(name="bn_in")(
            nn.Conv(self.channels, (1, 1), use_bias=False, name="conv_in")(y), train))
        y = nn.relu(BatchNorm(name="bn1")(
            nn.Conv(self.channels, (3, 3), padding="VALID", use_bias=False,
                    name="conv1")(y), train))
        y = nn.relu(BatchNorm(name="bn2")(
            nn.Conv(self.channels, (3, 3), padding="VALID", use_bias=False,
                    name="conv2")(y), train))
        y = y.reshape(n, h, w, self.channels)
        y = BatchNorm(name="bn_out")(
            nn.Conv(c, (1, 1), use_bias=False, name="conv_out")(y), train)
        return nn.relu(x + y)


class SepConv4d(nn.Module):
    """Separable 4-D conv (reference SepConv4d, renet.py:60-129): a (k,k,1)
    conv over the FIRST plane + BN, relu, a (1,k,k) conv over the SECOND
    plane + BN, then a 1×1 channel projection + BN when channels change.
    Layout here: ``x [B, U, V, H, W, C]``; all convs channel-preserving
    until the projection (matching the reference exactly)."""

    in_planes: int
    out_planes: int
    k: int = 3
    #: batch-stat-only by default (the layer runs vmapped over episodes,
    #: where running-stat updates are ill-defined — file convention);
    #: True restores reference running-stat eval (oracle tests)
    use_running_statistics: bool = False

    @nn.compact
    def __call__(self, x, train: bool, sample_mask=None):
        # sample_mask: [b] bool — rows contributing to batch statistics
        # (bucket-padded eval batches; see BatchNorm.mask)
        b, u, v, h, w, c = x.shape
        urs = self.use_running_statistics
        pad = ((self.k // 2, self.k // 2),) * 2

        def bn_mask(rows_per_sample):
            if sample_mask is None:
                return None
            m = jnp.repeat(sample_mask, rows_per_sample)
            return m[:, None, None, None]

        # conv over (u, v), shared across (h, w) — reference conv2
        y = x.transpose(0, 3, 4, 1, 2, 5).reshape(b * h * w, u, v, c)
        y = nn.Conv(c, (self.k, self.k), padding=pad, use_bias=False,
                    name="conv_uv")(y)
        y = BatchNorm(use_running_statistics=urs, name="bn_uv")(
            y, train, mask=bn_mask(h * w))
        y = y.reshape(b, h, w, u, v, c).transpose(0, 3, 4, 1, 2, 5)
        y = nn.relu(y)
        # conv over (h, w), shared across (u, v) — reference conv1
        z = y.reshape(b * u * v, h, w, c)
        z = nn.Conv(c, (self.k, self.k), padding=pad, use_bias=False,
                    name="conv_hw")(z)
        z = BatchNorm(use_running_statistics=urs, name="bn_hw")(
            z, train, mask=bn_mask(u * v))
        if self.in_planes != self.out_planes:
            z = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                        name="proj")(z)
            z = BatchNorm(use_running_statistics=urs, name="bn_proj")(
                z, train, mask=bn_mask(u * v))
        return z.reshape(b, u, v, h, w, -1)


class CCAModule(nn.Module):
    """4-D correlation refinement (reference CCA, renet.py:29-57):
    SepConv4d(1→16) → relu → SepConv4d(16→1), symmetrized as
    ``f(x) + f(xᵀ)ᵀ`` (the support↔query plane transpose)."""

    use_running_statistics: bool = False

    @nn.compact
    def __call__(self, corr, train: bool, sample_mask=None):
        # corr: [B, Hs, Ws, Hq, Wq]; sample_mask [B] — see SepConv4d
        layer1 = SepConv4d(1, 16, name="sep1",
                           use_running_statistics=self.use_running_statistics)
        layer2 = SepConv4d(16, 1, name="sep2",
                           use_running_statistics=self.use_running_statistics)

        def f(x):
            y = layer1(x[..., None], train, sample_mask=sample_mask)
            y = nn.relu(y)
            return layer2(y, train, sample_mask=sample_mask)[..., 0]

        sym = jnp.transpose(corr, (0, 3, 4, 1, 2))
        return f(corr) + jnp.transpose(f(sym), (0, 3, 4, 1, 2))


class CCALayer(nn.Module):
    feat_dim: int
    temperature: float = 2.0
    temperature_attn: float = 5.0

    @nn.compact
    def __call__(self, spt, qry, way, shot, train: bool, qry_mask=None):
        """spt [ns, c, h, w], qry [nq, c, h, w] → ([nq, way] sims,
        [nq, c] pooled query).  ``qry_mask`` [nq] marks real (non-padded)
        query rows; the batch-stat BNs restrict their statistics to them
        so eval logits are bucket-padding-invariant (the reference never
        pads — renet.py:378-404 is dense-only)."""
        ns, c, h, w = spt.shape
        nq = qry.shape[0]
        if h * w < 2:
            # the reference's own shipped audio config (last_pool: true over
            # the 3x3-stride-3 pool stack) collapses maps to 1x1, where its
            # gaussian_normalize — UNBIASED var over the h*w spatial axis
            # (renet.py:253-257) — is 0/0 = NaN and training silently dies.
            # Fail loudly instead: RENet requires spatial feature maps.
            raise ValueError(
                f"RENet CCA needs spatial feature maps, got {h}x{w}: "
                "gaussian-normalizing over a single spatial position is "
                "0/0 (ref renet.py:253-257 unbiased var). Set the backbone's "
                "last_pool: false (see config/kos_fixture/renet_5shot.yaml)"
            )
        spt = spt - spt.mean(axis=1, keepdims=True)
        qry = qry - qry.mean(axis=1, keepdims=True)

        r1x1_conv = nn.Conv(64, (1, 1), use_bias=False, name="cca_1x1")
        # batch statistics in train AND eval: this module runs vmapped over
        # episodes, where per-episode running-stat updates are ill-defined
        # (and were previously discarded) — batch-stat-only keeps train and
        # eval consistent
        r1x1_bn = BatchNorm(use_running_statistics=False, name="cca_bn")

        def reduce_shared(x, row_mask=None):
            y = x.transpose(0, 2, 3, 1)
            m = None if row_mask is None else row_mask[:, None, None, None]
            y = nn.relu(r1x1_bn(r1x1_conv(y), train, mask=m))
            return y.transpose(0, 3, 1, 2)

        s_r = reduce_shared(spt)
        q_r = reduce_shared(qry, qry_mask)
        s_r = s_r / jnp.maximum(jnp.linalg.norm(s_r, axis=1, keepdims=True), 1e-8)
        q_r = q_r / jnp.maximum(jnp.linalg.norm(q_r, axis=1, keepdims=True), 1e-8)
        corr = jnp.einsum("scij,qckl->qsijkl", s_r, q_r)  # [nq,ns,h,w,h,w]

        pair_mask = None if qry_mask is None else jnp.repeat(qry_mask, ns)
        refined = CCAModule(name="cca_module")(
            corr.reshape(nq * ns, h, w, h, w), train, sample_mask=pair_mask
        ).reshape(nq, ns, h, w, h, w)

        def gauss_norm(x, axes):
            m = jnp.mean(x, axis=axes, keepdims=True)
            # torch.var defaults to the UNBIASED (N-1) estimator
            # (reference gaussian_normalize, renet.py:253-257)
            v = jnp.var(x, axis=axes, keepdims=True, ddof=1)
            return (x - m) / jnp.sqrt(v + 1e-5)

        corr_s = gauss_norm(refined.reshape(nq, ns, h * w, h, w), (2,))
        corr_s = jax.nn.softmax(corr_s / self.temperature_attn, axis=2)
        corr_q = gauss_norm(refined.reshape(nq, ns, h, w, h * w), (4,))
        corr_q = jax.nn.softmax(corr_q / self.temperature_attn, axis=4)

        attn_s = corr_s.reshape(nq, ns, h, w, h, w).sum(axis=(4, 5))  # [nq,ns,h,w]
        attn_q = corr_q.reshape(nq, ns, h, w, h, w).sum(axis=(2, 3))

        spt_att = attn_s[:, :, None] * spt[None]  # [nq,ns,c,h,w]
        qry_att = attn_q[:, :, None] * qry[:, None]

        if shot > 1:
            spt_att = spt_att.reshape(nq, way, shot, c, h, w).mean(axis=2)
            qry_att = qry_att.reshape(nq, way, shot, c, h, w).mean(axis=2)
        spt_att = spt_att.mean(axis=(-1, -2))  # [nq,way,c]
        qry_att = qry_att.mean(axis=(-1, -2))
        qry_pooled = qry.mean(axis=(-1, -2))

        sn = spt_att / jnp.maximum(jnp.linalg.norm(spt_att, axis=-1, keepdims=True), 1e-8)
        qn = qry_att / jnp.maximum(jnp.linalg.norm(qry_att, axis=-1, keepdims=True), 1e-8)
        sims = jnp.sum(sn * qn, axis=-1) / self.temperature
        return sims, qry_pooled


@CLASSIFIERS.register("RENet")
class RENet(MethodBase):
    model_type = ModelType.METRIC
    needs_feature_map = True

    def __init__(self, emb_func, feat_dim: int = 640, num_class: int = 25,
                 num_classes: Optional[int] = None,
                 lambda_epi: float = 0.25, temperature: float = 0.2,
                 temperature_attn: float = 5.0, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.lambda_epi = lambda_epi
        # the reference kwarg is ``num_classes`` (renet.py:347) — honor it
        self.num_class = num_classes if num_classes is not None else num_class
        self.modules["scr"] = SCRLayer()
        self.modules["cca"] = CCALayer(
            feat_dim=feat_dim, temperature=temperature,
            temperature_attn=temperature_attn,
        )
        self.modules["fc"] = nn.Dense(self.num_class)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        c, h, w = feats.shape[1:]
        nhwc = jnp.zeros((2, h, w, c), jnp.float32)
        sub = self.modules["scr"].init({"params": rngs["params"]}, nhwc, train=False)
        self._merge_init(variables, "scr", sub)
        spt = jnp.zeros((setting.way * setting.shot, c, h, w), jnp.float32)
        qry = jnp.zeros((3, c, h, w), jnp.float32)
        sub = self.modules["cca"].init(
            {"params": rngs["params"]}, spt, qry, setting.way, setting.shot,
            train=False,
        )
        self._merge_init(variables, "cca", sub)
        sub = self.modules["fc"].init(rngs["params"], jnp.zeros((1, c)))
        self._merge_init(variables, "fc", sub)

    def _refined(self, variables, batch, setting, train, rng):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        e, ws, c, h, w = sup.shape
        g = qry.shape[1]
        flat = jnp.concatenate(
            [sup.reshape(-1, c, h, w), qry.reshape(-1, c, h, w)], axis=0
        ).transpose(0, 2, 3, 1)
        refined, upd2 = self.apply_module(variables, "scr", flat, train=train, rng=rng)
        refined = refined.transpose(0, 3, 1, 2)
        sup_r = refined[: e * ws].reshape(e, ws, c, h, w)
        qry_r = refined[e * ws:].reshape(e, g, c, h, w)
        merged = self.merge_updates({}, updates, upd2) if (updates or upd2) else None
        return sup_r, qry_r, merged

    def _episode_sims(self, variables, sup, qry, way, shot, train, rng,
                      qry_mask=None):
        fn = lambda s, q, m: self.apply_module(
            variables, "cca", s, q, way, shot, train=train, rng=rng,
            qry_mask=m,
        )[0]
        if qry_mask is None:
            qry_mask = jnp.ones(qry.shape[:2], bool)
        return jax.vmap(fn)(sup, qry, qry_mask)

    def loss(self, variables, batch, setting, rng):
        """``loss = λ_epi·epi + abs + aux`` (reference renet.py:441-447):
        episodic CE over the CCA similarities, the *absolute* global CE on
        the pooled query features, and — when the second (global flat)
        dataloader is paired in (``dataloader_num: 2``,
        config/renet.yaml:78, trainer.py:159-188) — the auxiliary global CE
        ``CE(fc(GAP(encode(g_images))), g_global_targets)``."""
        from ...episode import DualBatch

        flat = None
        if isinstance(batch, DualBatch):
            flat = batch.flat
            batch = batch.episode
        sup, qry, updates = self._refined(variables, batch, setting, True, rng)
        sims, qry_pooled = self._episode_sims(
            variables, sup, qry, setting.way, setting.shot, True, rng,
            qry_mask=batch.query_mask > 0,
        )
        epi_loss = masked_cross_entropy(sims, segment_targets(batch), batch.query_mask)

        loss = self.lambda_epi * epi_loss
        if batch.global_target is None:
            raise ValueError(
                "RENet training requires global targets for its absolute "
                "global CE (reference renet.py:440-441) — the episodic "
                "loader must populate EpisodeBatch.global_target"
            )
        g_qry = batch.global_target[:, sup.shape[1]:]
        logits_abs = self.modules["fc"].apply(
            {"params": variables["params"]["fc"]}, qry_pooled
        )
        # global targets are per-clip; train batches are dense (one segment
        # per clip) so the pooled-query and target layouts must line up —
        # a silent skip here would train without the abs term and without
        # a sound (same convention as heads/can.py)
        if logits_abs.shape[:2] != g_qry.shape:
            raise ValueError(
                f"RENet abs loss layout mismatch: pooled query logits "
                f"{logits_abs.shape[:2]} vs global query targets "
                f"{g_qry.shape} — RENet trains on dense episodic batches "
                f"(one segment per clip; reference renet.py:420-441)"
            )
        loss = loss + cross_entropy(
            logits_abs.reshape(-1, self.num_class), g_qry.reshape(-1)
        )

        if flat is not None:
            # auxiliary global CE over the flat batch, through the same
            # encode (emb_func → SCR residual) and fc (renet.py:443-447).
            # The reference runs the episodic and flat forwards
            # SEQUENTIALLY through the same in-place modules, so BN
            # running stats update twice per step with compounding
            # momentum — start the flat pass from the episodic pass's
            # updated collections; the final merge then composes rather
            # than overwrites.
            vars_seq = (
                self.merge_updates(variables, updates) if updates else variables
            )
            g_feat, upd_g = self.apply_module(
                vars_seq, "emb_func", flat.data, train=True, rng=rng
            )
            g_ref, upd_s = self.apply_module(
                vars_seq, "scr", g_feat.transpose(0, 2, 3, 1), train=True,
                rng=rng,
            )
            g_pooled = g_ref.mean(axis=(1, 2))  # GAP over (h, w) — NHWC
            logits_aux = self.modules["fc"].apply(
                {"params": variables["params"]["fc"]}, g_pooled
            )
            loss = loss + cross_entropy(
                logits_aux.reshape(-1, self.num_class),
                flat.target.reshape(-1),
            )
            updates = self.merge_updates({}, updates, upd_g, upd_s) \
                if (updates or upd_g or upd_s) else None
        return loss, LossOutput(
            seg_logits=sims,
            metrics=self.train_metrics(sims, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self._refined(variables, batch, setting, False, None)
        sims, _ = self._episode_sims(
            variables, sup, qry, setting.way, setting.shot, False, None,
            qry_mask=batch.query_mask > 0,
        )
        return sims
