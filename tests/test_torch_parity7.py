"""Seventh torch-oracle parity suite: the Swin transformer with fully
converted weights — patch-merge linear (unfold channel ordering), packed
no-bias qkv, scalar relative-position table broadcast per head, shifted
windows + masks, pre-norm blocks."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _np(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def test_swin_forward_parity(rng):
    """Pooled-feature parity on a fully window-divisible input
    (swin_transformer.py:81-372).  The reference ships no final norm —
    ours is built with final_norm=False to compare exactly."""
    ref_mod = load_ref("libfewshot_core.model.backbone.swin_transformer")
    from audio_fewshot_tpu.models.backbones.swin import SwinTransformer

    hidden, heads, hd, ws = 16, (1, 2, 4, 8), 8, 2
    depths = (2, 2, 2, 2)
    factors = (2, 2, 2, 2)
    tm = ref_mod.SwinTransformer(
        hidden_dim=hidden, layers=depths, heads=heads, channels=1,
        head_dim=hd, window_size=ws, downscaling_factors=factors,
        relative_pos_embedding=True,
    ).eval()

    x = rng.normal(size=(2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))  # [2, hidden*8]

    fm = SwinTransformer(
        embed_dim=hidden, depths=depths, num_heads=heads,
        downscaling_factors=factors, window_size=ws, head_dim=hd,
        final_norm=False, num_channels=1, dtype=jnp.float32,
    )
    params = {}
    for s in range(4):
        stage = getattr(tm, f"stage{s + 1}")
        dim = hidden * (2 ** s)
        f = factors[s]
        in_c = 1 if s == 0 else hidden * (2 ** (s - 1))
        # PatchMerging: torch unfold flattens (c, kh, kw); ours (kh, kw, c)
        w = _np(stage.patch_partition.linear.weight)  # [dim, c*f*f]
        params[f"merge{s}"] = {
            "kernel": jnp.asarray(
                w.reshape(dim, in_c, f, f).transpose(2, 3, 1, 0).reshape(f * f * in_c, dim)
            ),
            "bias": jnp.asarray(_np(stage.patch_partition.linear.bias)),
        }
        blocks = [blk for pair in stage.layers for blk in pair]
        for b, blk in enumerate(blocks):
            attn_pre = blk.attention_block.fn  # PreNorm
            wa = attn_pre.fn  # WindowAttention
            mlp_pre = blk.mlp_block.fn
            ff = mlp_pre.fn  # FeedForward
            inner = heads[s] * hd
            # scalar [2w-1, 2w-1] table → per-head flat table; the reference
            # indexes by (j−i) (lucidrains convention) while ours uses the
            # Microsoft (i−j) convention — flip both displacement axes
            table = np.flip(_np(wa.pos_embedding), (0, 1)).reshape(-1, 1)
            params[f"stage{s}_block{b}"] = {
                "norm1": {
                    "scale": jnp.asarray(_np(attn_pre.norm.weight)),
                    "bias": jnp.asarray(_np(attn_pre.norm.bias)),
                },
                "attn": {
                    "qkv": {
                        "kernel": jnp.asarray(_np(wa.to_qkv.weight).T),
                        "bias": jnp.zeros((3 * inner,), jnp.float32),
                    },
                    "proj": {
                        "kernel": jnp.asarray(_np(wa.to_out.weight).T),
                        "bias": jnp.asarray(_np(wa.to_out.bias)),
                    },
                    "rel_pos_bias": jnp.asarray(
                        np.tile(table, (1, heads[s]))
                    ),
                },
                "norm2": {
                    "scale": jnp.asarray(_np(mlp_pre.norm.weight)),
                    "bias": jnp.asarray(_np(mlp_pre.norm.bias)),
                },
                "fc1": {
                    "kernel": jnp.asarray(_np(ff.net[0].weight).T),
                    "bias": jnp.asarray(_np(ff.net[0].bias)),
                },
                "fc2": {
                    "kernel": jnp.asarray(_np(ff.net[2].weight).T),
                    "bias": jnp.asarray(_np(ff.net[2].bias)),
                },
            }

    mine = fm.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        _np(ref_out), np.asarray(mine), atol=2e-4, rtol=1e-3
    )


def test_swin_library_converter_matches(rng):
    """The shipped converter (utils/torch_convert._convert_swin) reproduces
    the reference forward from a raw state dict."""
    ref_mod = load_ref("libfewshot_core.model.backbone.swin_transformer")
    from audio_fewshot_tpu.models.backbones.swin import SwinTransformer
    from audio_fewshot_tpu.utils import torch_convert as tc

    hidden, heads, hd, ws = 16, (1, 2, 4, 8), 8, 2
    depths = (2, 2, 2, 2)
    factors = (2, 2, 2, 2)
    tm = ref_mod.SwinTransformer(
        hidden_dim=hidden, layers=depths, heads=heads, channels=1,
        head_dim=hd, window_size=ws, downscaling_factors=factors,
        relative_pos_embedding=True,
    ).eval()
    x = rng.normal(size=(2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()

    fm = SwinTransformer(
        embed_dim=hidden, depths=depths, num_heads=heads,
        downscaling_factors=factors, window_size=ws, head_dim=hd,
        final_norm=False, num_channels=1, dtype=jnp.float32,
    )
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.tree_util.tree_map(np.asarray, template["params"])
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    tc._convert_swin(state, params, {}, factors)

    mine = fm.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(ref_out, np.asarray(mine), atol=2e-4, rtol=1e-3)
