"""Fourth torch-oracle parity suite: CPEA patch-embedding adaptation and the
DeepBDC shot-switched proto metric."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _np(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def lin_w(t):
    return _np(t).transpose(1, 0)


# ---------------------------------------------------------------- CPEALayer


def test_cpea_layer_parity(rng):
    """CPEALayer vs reference (cpea_net.py:81-133) in eval mode with
    converted MLP/LayerNorm weights.  The reference's episode layout is
    POSITION-major (rearrange_data, :19-26: all class-0-slots first), ours
    is way-major — the oracle input is permuted accordingly."""
    ref_mod = load_ref("libfewshot_core.model.metric.cpea_net")
    from audio_fewshot_tpu.models.heads.cpea import CPEALayer

    way, shot, g, l, c = 3, 2, 4, 9, 32
    n = 1 + l
    # way-major [W·S, n, C] for ours; shot-major for the reference
    sup_wm = rng.normal(size=(way * shot, n, c)).astype(np.float32)
    qry = rng.normal(size=(g, n, c)).astype(np.float32)
    sup_sm = (
        sup_wm.reshape(way, shot, n, c).transpose(1, 0, 2, 3).reshape(way * shot, n, c)
    )

    layer = ref_mod.CPEALayer(in_dim=c).eval()
    layer.fc2 = ref_mod.Mlp(in_features=l * l, hidden_features=256, out_features=1).eval()
    with torch.no_grad():
        ref_rows = layer(_t(qry), _t(sup_sm), shot)
        ref_out = torch.cat(ref_rows, dim=0)  # [G, way]

    mine_mod = CPEALayer(in_dim=c)
    variables = {
        "params": {
            "fc1_hidden": {
                "kernel": jnp.asarray(lin_w(layer.fc1.fc1.weight)),
                "bias": jnp.asarray(_np(layer.fc1.fc1.bias)),
            },
            "fc1_out": {
                "kernel": jnp.asarray(lin_w(layer.fc1.fc2.weight)),
                "bias": jnp.asarray(_np(layer.fc1.fc2.bias)),
            },
            "fc_norm1": {
                "scale": jnp.asarray(_np(layer.fc_norm1.weight)),
                "bias": jnp.asarray(_np(layer.fc_norm1.bias)),
            },
            "fc2_hidden": {
                "kernel": jnp.asarray(lin_w(layer.fc2.fc1.weight)),
                "bias": jnp.asarray(_np(layer.fc2.fc1.bias)),
            },
            "fc2_out": {
                "kernel": jnp.asarray(lin_w(layer.fc2.fc2.weight)),
                "bias": jnp.asarray(_np(layer.fc2.fc2.bias)),
            },
        }
    }
    mine = mine_mod.apply(
        variables, jnp.asarray(qry), jnp.asarray(sup_wm), way, shot, train=False
    )
    np.testing.assert_allclose(_np(ref_out), np.asarray(mine), atol=2e-4)


# ------------------------------------------------------- DeepBDC ProtoLayer


@pytest.mark.parametrize("shot", [1, 5])
def test_deepbdc_proto_parity(rng, shot):
    """bdc_proto_logits vs reference DeepBDC ProtoLayer — euclid for
    multi-shot, raw dot-product for 1-shot (deepbdc.py:20-54)."""
    ref_mod = load_ref("libfewshot_core.model.metric.deepbdc")
    from audio_fewshot_tpu.models.heads.deepbdc import bdc_proto_logits

    e, way, g, d = 2, 5, 7, 64
    sup = rng.normal(size=(e, way * shot, d)).astype(np.float32)
    qry = rng.normal(size=(e, g, d)).astype(np.float32)

    layer = ref_mod.ProtoLayer()
    with torch.no_grad():
        ref_out = layer(_t(qry), _t(sup), way, shot, g)

    mine = bdc_proto_logits(jnp.asarray(qry), jnp.asarray(sup), way, shot)
    np.testing.assert_allclose(
        _np(ref_out), np.asarray(mine), rtol=1e-4, atol=1e-3
    )


# ------------------------------------------------------------- Conv2dMtl


def test_mtl_conv_parity(rng):
    """MtlConv vs reference Conv2dMtl with MTL=True — frozen base kernel ×
    mtl scale + bias shift (backbone/utils/mtl_module.py:104-140)."""
    ref_mod = load_ref("libfewshot_core.model.backbone.utils.mtl_module")
    from audio_fewshot_tpu.models.backbones.resnet import MtlConv

    cin, cout, n, h = 4, 8, 3, 7
    x = rng.normal(size=(n, cin, h, h)).astype(np.float32)

    conv = ref_mod.Conv2dMtl(cin, cout, 3, stride=1, padding=1, bias=True,
                             MTL=True)
    with torch.no_grad():
        conv.mtl_weight.copy_(
            _t(rng.normal(size=(cout, cin, 1, 1)).astype(np.float32))
        )
        conv.mtl_bias.copy_(_t(rng.normal(size=(cout,)).astype(np.float32)))
        ref_out = conv(_t(x))

    mine_mod = MtlConv(features=cout, kernel_size=(3, 3), strides=(1, 1),
                       padding=[(1, 1), (1, 1)])
    variables = {
        "params": {
            "kernel": jnp.asarray(_np(conv.weight).transpose(2, 3, 1, 0)),
            "mtl_scale": jnp.asarray(
                _np(conv.mtl_weight).transpose(2, 3, 1, 0)
            ),
            # ours folds the frozen base bias + trainable mtl_bias into ONE
            # shift (equivalent: frozen-at-init offset + zero-init delta)
            "mtl_bias": jnp.asarray(_np(conv.bias) + _np(conv.mtl_bias)),
        }
    }
    mine = mine_mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        _np(ref_out), np.asarray(mine).transpose(0, 3, 1, 2), atol=1e-4
    )
