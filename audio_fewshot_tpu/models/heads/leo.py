"""LEO — latent embedding optimization (Rusu et al., ICLR 2019).

Reference: libfewshot_core/model/meta/leo.py — encoder (linear + pairwise
relation net over support, :69-113) produces a per-class latent
distribution; inner loop does gradient steps ON THE LATENT via
``loss.backward`` + manual update (:230-248); decoder maps latents to a
classifier-weight distribution; a second inner loop fine-tunes the sampled
weights (:250-270); training adds KL, encoder-penalty (‖z−z₀‖²) and
decoder-orthogonality regularizers (:219-226).  Backbone features are
computed under ``no_grad`` (frozen pretrained emb).

TPU re-design: both inner loops are ``lax.scan``s of ``jax.grad`` steps over
the latent / weight pytrees — differentiable end-to-end.

Documented delta: the reference samples ``mean + var·z`` with the RAW
second half as the scale (leo.py:29-33 — sign-indefinite; a negative
"var" just mirrors the noise), while ``gaussian_sample`` here uses the
standard log-variance parameterization ``mean + exp(½·logvar)·z`` (always
positive scale, KL in closed form).  Both learn the same family; the
latent parameterization differs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy
from ..losses import cross_entropy


def gaussian_sample(rng, mean_logvar, dim):
    mean, logvar = mean_logvar[..., :dim], mean_logvar[..., dim:]
    eps = jax.random.normal(rng, mean.shape)
    return mean + eps * jnp.exp(0.5 * logvar), mean, logvar


class LEOEncoder(nn.Module):
    hid_dim: int

    @nn.compact
    def __call__(self, support_feat, way, shot, train: bool = False):
        """support_feat [E, way·shot, D] → per-class [E, way, 2·hid]."""
        e = support_feat.shape[0]
        out = nn.Dense(self.hid_dim, name="encoder")(support_feat)
        out = out.reshape(e, way, shot, self.hid_dim)
        # all (way·shot)² pairs per class row (reference :94-99)
        t1 = jnp.repeat(out, shot, axis=2)
        t1 = jnp.repeat(t1, way, axis=1)
        t2 = jnp.tile(out, (1, way, shot, 1))
        x = jnp.concatenate([t1, t2], axis=-1)
        for i in range(3):
            x = nn.relu(nn.Dense(2 * self.hid_dim, use_bias=False,
                                 name=f"relation{i}")(x))
        x = x.reshape(e, way, way * shot * shot, -1)
        return jnp.mean(x, axis=2)  # [E, way, 2·hid]


class LEODecoder(nn.Module):
    feat_dim: int

    @nn.compact
    def __call__(self, latent, train: bool = False):
        return nn.Dense(2 * self.feat_dim, name="decoder")(latent)


@CLASSIFIERS.register("LEO")
class LEO(MethodBase):
    model_type = ModelType.META

    def __init__(self, emb_func, inner_para: Optional[Dict] = None,
                 feat_dim: int = 1600, hid_dim: int = 64,
                 kl_weight: float = 0.001, encoder_penalty_weight: float = 1e-9,
                 orthogonality_penalty_weight: float = 1e-3, **kwargs):
        super().__init__(emb_func, **kwargs)
        p = dict(inner_para or {})
        self.inner_iter = int(p.get("iter", 5))
        self.inner_lr = float(p.get("lr", 1.0))
        self.ft_iter = int(p.get("finetune_iter", 5))
        self.ft_lr = float(p.get("finetune_lr", 0.001))
        self.hid_dim = hid_dim
        self.kl_weight = kl_weight
        self.encoder_penalty_weight = encoder_penalty_weight
        self.orthogonality_penalty_weight = orthogonality_penalty_weight
        self.modules["encoder"] = LEOEncoder(hid_dim=hid_dim)
        self.modules["decoder"] = LEODecoder(feat_dim=0)  # feat_dim set at init

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        d = feats.shape[-1]
        self.feat_dim = d
        self.modules["decoder"] = LEODecoder(feat_dim=d)
        sup = jnp.zeros((1, setting.way * setting.shot, d), jnp.float32)
        sub = self.modules["encoder"].init(
            {"params": rngs["params"]}, sup, setting.way, setting.shot
        )
        self._merge_init(variables, "encoder", sub)
        z = jnp.zeros((1, setting.way, self.hid_dim), jnp.float32)
        sub = self.modules["decoder"].init({"params": rngs["params"]}, z)
        self._merge_init(variables, "decoder", sub)

    # -- adaptation ---------------------------------------------------------

    def _decode_weight(self, variables, latent, rng):
        dec, _ = self.apply_module(variables, "decoder", latent)
        w, _, _ = gaussian_sample(rng, dec, self.feat_dim)
        return w.transpose(0, 2, 1)  # [E, D, way]

    def _adapt(self, variables, sup, sup_y, setting, rng):
        r_enc, r_dec = jax.random.split(rng)
        enc_out, _ = self.apply_module(
            variables, "encoder", sup, setting.way, setting.shot
        )
        latent0, mean, logvar = gaussian_sample(r_enc, enc_out, self.hid_dim)
        kl = 0.5 * jnp.mean(mean ** 2 + jnp.exp(logvar) - logvar - 1.0)

        def support_loss_latent(z):
            w = self._decode_weight(variables, z, r_dec)
            logits = jnp.einsum("end,edw->enw", sup, w)
            return cross_entropy(logits.reshape(-1, setting.way), sup_y.reshape(-1))

        def latent_step(z, _):
            return z - self.inner_lr * jax.grad(support_loss_latent)(z), None

        latent, _ = jax.lax.scan(latent_step, latent0, None, length=self.inner_iter)
        encoder_penalty = jnp.mean((latent0 - latent) ** 2)

        weight = self._decode_weight(variables, latent, r_dec)

        def support_loss_weight(w):
            logits = jnp.einsum("end,edw->enw", sup, w)
            return cross_entropy(logits.reshape(-1, setting.way), sup_y.reshape(-1))

        def weight_step(w, _):
            return w - self.ft_lr * jax.grad(support_loss_weight)(w), None

        weight, _ = jax.lax.scan(weight_step, weight, None, length=self.ft_iter)
        return weight, kl, encoder_penalty

    def _orthogonality(self, variables):
        """Row-correlation penalty on the decoder kernel (reference :55-67)."""
        w = variables["params"]["decoder"]["decoder"]["kernel"].T  # [2D, hid]
        wn = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        corr = wn @ wn.T
        return jnp.mean((corr - jnp.eye(corr.shape[0])) ** 2)

    # -- method API ---------------------------------------------------------

    def loss(self, variables, batch, setting, rng):
        sup, qry, _ = self.embed(variables, batch, train=False)  # frozen emb (ref no_grad)
        sup = jax.lax.stop_gradient(sup)
        qry = jax.lax.stop_gradient(qry)
        weight, kl, enc_pen = self._adapt(
            variables, sup, batch.support_target, setting, rng
        )
        seg_logits = jnp.einsum("egd,edw->egw", qry, weight)
        pred = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        loss = (
            pred
            + self.kl_weight * kl
            + self.encoder_penalty_weight * enc_pen
            + self.orthogonality_penalty_weight * self._orthogonality(variables)
        )
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=None,
        )

    def forward(self, variables, batch, setting):
        sup, qry, _ = self.embed(variables, batch, train=False)
        weight, _, _ = self._adapt(
            variables, sup, batch.support_target, setting, jax.random.PRNGKey(0)
        )
        return jnp.einsum("egd,edw->egw", qry, weight)
