"""Sixth torch-oracle parity suite: the class-aware VisionTransformer (the
CPEA backbone) with fully converted weights — patch embed, cls/pos tokens,
packed-qkv attention blocks, final LayerNorm."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402


def _stub_timm():
    """vit_class_aware imports timm only for @register_model decorators;
    the package is absent here — provide a no-op stub."""
    import sys
    import types

    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn=None, **kw: (fn if fn else (lambda f: f))
    timm.models = models
    models.registry = registry
    sys.modules.update(
        {"timm": timm, "timm.models": models, "timm.models.registry": registry}
    )

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _np(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def test_class_aware_vit_forward_parity(rng):
    """Token-sequence forward parity on a square input matching the torch
    module's img_size (no positional interpolation branch),
    vit_class_aware.py:213-358."""
    _stub_timm()
    ref_mod = load_ref("libfewshot_core.model.backbone.vit_class_aware")
    from audio_fewshot_tpu.models.backbones.vit import VisionTransformer

    dim, depth, heads, p, img = 64, 3, 4, 16, 64
    head_dim = dim // heads
    tm = ref_mod.VisionTransformer(
        img_size=[img], patch_size=p, embed_dim=dim, depth=depth,
        num_heads=heads, qkv_bias=True, drop_path_rate=0.0,
        num_channels=1,
    ).eval()
    with torch.no_grad():
        tm.pos_embed.copy_(torch.randn(tm.pos_embed.shape) * 0.02)
        tm.cls_token.copy_(torch.randn(tm.cls_token.shape) * 0.02)

    x = rng.normal(size=(2, 1, img, img)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))  # [2, 1+16, dim]

    fm = VisionTransformer(
        patch_size=p, embed_dim=dim, depth=depth, num_heads=heads,
        return_tokens=True, num_channels=1, dtype=jnp.float32,
    )
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(_np(tm.patch_embed.proj.weight).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_np(tm.patch_embed.proj.bias)),
        },
        "cls_token": jnp.asarray(_np(tm.cls_token)),
        "pos_embed": jnp.asarray(_np(tm.pos_embed)),
        "norm": {
            "scale": jnp.asarray(_np(tm.norm.weight)),
            "bias": jnp.asarray(_np(tm.norm.bias)),
        },
    }
    for i, blk in enumerate(tm.blocks):
        qkv_w = _np(blk.attn.qkv.weight)  # [3*dim, dim]
        qkv_b = _np(blk.attn.qkv.bias)
        q_w, k_w, v_w = np.split(qkv_w, 3, axis=0)  # each [dim, dim]
        q_b, k_b, v_b = np.split(qkv_b, 3, axis=0)

        def mha_in(w, b):
            return {
                "kernel": jnp.asarray(w.T.reshape(dim, heads, head_dim)),
                "bias": jnp.asarray(b.reshape(heads, head_dim)),
            }

        params[f"block{i}"] = {
            "norm1": {
                "scale": jnp.asarray(_np(blk.norm1.weight)),
                "bias": jnp.asarray(_np(blk.norm1.bias)),
            },
            "norm2": {
                "scale": jnp.asarray(_np(blk.norm2.weight)),
                "bias": jnp.asarray(_np(blk.norm2.bias)),
            },
            "attn": {
                "query": mha_in(q_w, q_b),
                "key": mha_in(k_w, k_b),
                "value": mha_in(v_w, v_b),
                "out": {
                    "kernel": jnp.asarray(
                        _np(blk.attn.proj.weight).T.reshape(heads, head_dim, dim)
                    ),
                    "bias": jnp.asarray(_np(blk.attn.proj.bias)),
                },
            },
            "fc1": {
                "kernel": jnp.asarray(_np(blk.mlp.fc1.weight).T),
                "bias": jnp.asarray(_np(blk.mlp.fc1.bias)),
            },
            "fc2": {
                "kernel": jnp.asarray(_np(blk.mlp.fc2.weight).T),
                "bias": jnp.asarray(_np(blk.mlp.fc2.bias)),
            },
        }

    mine = fm.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        _np(ref_out), np.asarray(mine), atol=1e-4, rtol=1e-4
    )
