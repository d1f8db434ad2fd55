"""Fifth torch-oracle parity suite: the CAN cross-attention module (CAM) on
the reference's own square-map domain with converted weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _np(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def test_cam_attention_parity(rng):
    """CAM.get_attention vs ours in eval mode (can.py:124-163).  The
    reference requires M == mid² (square maps): mid=3, M=9."""
    ref_mod = load_ref("libfewshot_core.model.metric.can")
    from audio_fewshot_tpu.models.heads.can import CAM

    mid, m = 3, 9
    b, n1, n2 = 2, 3, 4
    corr = rng.normal(size=(b, n1, n2, m, m)).astype(np.float32)

    layer = ref_mod.CAM(mid).eval()
    with torch.no_grad():
        bn = layer.conv1.bn
        bn.running_mean.copy_(_t(rng.normal(size=(mid,)).astype(np.float32)))
        bn.running_var.copy_(_t(rng.uniform(0.5, 2.0, size=(mid,)).astype(np.float32)))
        bn.weight.copy_(_t(rng.normal(size=(mid,)).astype(np.float32)))
        bn.bias.copy_(_t(rng.normal(size=(mid,)).astype(np.float32)))
        ref_att = layer.get_attention(_t(corr))

    conv1, conv2 = layer.conv1.conv, layer.conv2
    mine = CAM(mid=mid)
    variables = {
        "params": {
            "conv1": {
                "kernel": jnp.asarray(_np(conv1.weight)[:, :, 0, 0].T),
                "bias": jnp.asarray(_np(conv1.bias)),
            },
            "bn1": {"BatchNorm_0": {
                "scale": jnp.asarray(_np(bn.weight)),
                "bias": jnp.asarray(_np(bn.bias)),
            }},
            "conv2": {
                "kernel": jnp.asarray(_np(conv2.weight)[:, :, 0, 0].T),
                "bias": jnp.asarray(_np(conv2.bias)),
            },
        },
        "batch_stats": {
            "bn1": {"BatchNorm_0": {
                "mean": jnp.asarray(_np(bn.running_mean)),
                "var": jnp.asarray(_np(bn.running_var)),
            }},
        },
    }
    mine_att = mine.apply(variables, jnp.asarray(corr), train=False)
    np.testing.assert_allclose(_np(ref_att), np.asarray(mine_att), atol=1e-5)


def test_cam_full_forward_parity(rng):
    """Full CAM.forward (both attentions + feature weighting + the /hw
    spatial mean, can.py:161-186 + CAMLayer GAP at :246-247) vs our
    _attended einsum form on identical weights."""
    ref_mod = load_ref("libfewshot_core.model.metric.can")
    from audio_fewshot_tpu.models.heads.can import CAM

    mid, h, w = 3, 3, 3
    m = h * w
    b, way, g, c = 1, 3, 4, 8
    sup = rng.normal(size=(b, way, c, h, w)).astype(np.float32)
    qry = rng.normal(size=(b, g, c, h, w)).astype(np.float32)

    layer = ref_mod.CAM(mid).eval()
    with torch.no_grad():
        f1_att, f2_att = layer(_t(sup), _t(qry))  # [b, g, way, c, h, w] ×2
        ref_proto = _np(f1_att.mean(4).mean(4))  # [b, g, way, c]
        ref_query = _np(f2_att.mean(4).mean(4))

    conv1, conv2, bn = layer.conv1.conv, layer.conv2, layer.conv1.bn
    mine = CAM(mid=mid)
    variables = {
        "params": {
            "conv1": {
                "kernel": jnp.asarray(_np(conv1.weight)[:, :, 0, 0].T),
                "bias": jnp.asarray(_np(conv1.bias)),
            },
            "bn1": {"BatchNorm_0": {
                "scale": jnp.asarray(_np(bn.weight)),
                "bias": jnp.asarray(_np(bn.bias)),
            }},
            "conv2": {
                "kernel": jnp.asarray(_np(conv2.weight)[:, :, 0, 0].T),
                "bias": jnp.asarray(_np(conv2.bias)),
            },
        },
        "batch_stats": {
            "bn1": {"BatchNorm_0": {
                "mean": jnp.asarray(_np(bn.running_mean)),
                "var": jnp.asarray(_np(bn.running_var)),
            }},
        },
    }

    # our _attended math (heads/can.py): normalized correlation, CAM twice,
    # einsum-weighted spatial mean
    proto = jnp.asarray(sup).reshape(b, way, c, m)
    q = jnp.asarray(qry).reshape(b, g, c, m)
    pn = proto / jnp.maximum(jnp.linalg.norm(proto, axis=2, keepdims=True), 1e-12)
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=2, keepdims=True), 1e-12)
    corr = jnp.einsum("ewcx,egcy->ewgxy", pn, qn)
    a_p = mine.apply(variables, corr, train=False)
    a_q = mine.apply(variables, jnp.swapaxes(corr, -1, -2), train=False)
    mine_proto = jnp.einsum("ewcx,ewgx->egwc", proto, a_p) / m
    mine_query = jnp.einsum("egcy,ewgy->egwc", q, a_q) / m

    np.testing.assert_allclose(ref_proto, np.asarray(mine_proto), atol=1e-5)
    np.testing.assert_allclose(ref_query, np.asarray(mine_query), atol=1e-5)
