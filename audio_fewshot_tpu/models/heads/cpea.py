"""CPEANet — Class-token Patch-Embedding Adaptation (Hao et al., ICCV 2023).

Reference: libfewshot_core/model/metric/cpea_net.py — CPEALayer (:81-133):
ViT token sequences [1+L, C] are refined by an MLP over the mean token
(residual), LayerNormed; patch tokens + 2·class-token; L2-normalized and
channel-centered; per (query, class) the [L×L] patch-similarity matrix is
squared and scored by an MLP (L² → 256 → 1).  Pairs with the class-aware
``vit_tiny``/``vit_small`` backbones (vit_class_aware.py).  The reference
hard-codes fc2's input to 72² (:88); here L derives from the backbone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy


class CPEALayer(nn.Module):
    in_dim: int = 384

    @nn.compact
    def __call__(self, feat_query, feat_shot, way, shot, train: bool = False):
        """feat_query [G, 1+L, C], feat_shot [W·S, 1+L, C] → [G, way]."""
        g, n, c = feat_query.shape

        fc1_hidden = nn.Dense(self.in_dim // 4, name="fc1_hidden")
        fc1_out = nn.Dense(c, name="fc1_out")

        def mlp1(x):  # shared between query and shot (reference self.fc1)
            return fc1_out(nn.gelu(fc1_hidden(x), approximate=False))

        fq = mlp1(jnp.mean(feat_query, axis=1, keepdims=True)) + feat_query
        fs = mlp1(jnp.mean(feat_shot, axis=1, keepdims=True)) + feat_shot
        ln = nn.LayerNorm(name="fc_norm1", epsilon=1e-5)  # torch LN eps
        fq, fs = ln(fq), ln(fs)

        q_img = fq[:, 1:, :] + 2.0 * fq[:, :1, :]  # [G, L, C]
        s_img = fs[:, 1:, :] + 2.0 * fs[:, :1, :]  # [W·S, L, C]

        q_img = q_img / jnp.maximum(
            jnp.linalg.norm(q_img, axis=-1, keepdims=True), 1e-12
        )
        q_img = q_img - jnp.mean(q_img, axis=-1, keepdims=True)

        l = s_img.shape[1]
        s_img = s_img.reshape(way, shot, l, c).mean(axis=1)  # class-avg [way, L, C]
        s_img = s_img / jnp.maximum(
            jnp.linalg.norm(s_img, axis=-1, keepdims=True), 1e-12
        )
        s_img = s_img - jnp.mean(s_img, axis=-1, keepdims=True)

        sim = jnp.einsum("wlc,gmc->gwlm", s_img, q_img)  # [G, way, L, L]
        sim2 = (sim ** 2).reshape(g, way, l * l)
        h = nn.gelu(nn.Dense(256, name="fc2_hidden")(sim2), approximate=False)
        return nn.Dense(1, name="fc2_out")(h)[..., 0]  # [G, way]


@CLASSIFIERS.register("CPEANet")
class CPEANet(MethodBase):
    model_type = ModelType.METRIC
    #: backbone returns token sequences [N, 1+L, C] — no flattening
    needs_feature_map = True

    def __init__(self, emb_func, in_dim: int = 384, **kwargs):
        super().__init__(emb_func, **kwargs)
        self.modules["head"] = CPEALayer(in_dim=in_dim)

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        # feats: [N, 1+L, C] token sequences
        n_tok, c = feats.shape[1], feats.shape[2]
        q = jnp.zeros((2, n_tok, c), jnp.float32)
        s = jnp.zeros((setting.way * setting.shot, n_tok, c), jnp.float32)
        sub = self.modules["head"].init(
            {"params": rngs["params"]}, q, s, setting.way, setting.shot
        )
        self._merge_init(variables, "head", sub)

    def _logits(self, variables, batch, setting, train, rng=None):
        sup, qry, updates = self.embed(variables, batch, train=train, rng=rng)
        fn = lambda s, q: self.apply_module(
            variables, "head", q, s, setting.way, setting.shot,
            train=train, rng=rng,
        )[0]
        return jax.vmap(fn)(sup, qry), updates

    def loss(self, variables, batch, setting, rng):
        seg_logits, updates = self._logits(variables, batch, setting, True, rng)
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        seg_logits, _ = self._logits(variables, batch, setting, False)
        return seg_logits
