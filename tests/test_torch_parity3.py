"""Third torch-oracle parity suite: the learned attention/scorer heads
(FEAT set-to-set attention, RelationNet scorer, ATLNet adaptive-threshold
layer) against the reference with fully converted weights."""

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


# ------------------------------------------------------- FEAT SetAttention


def test_feat_attention_parity(rng):
    """SetAttention vs reference MultiHeadAttention(n_head=1) in eval mode
    (feat.py:55-128)."""
    ref_mod = load_ref("libfewshot_core.model.metric.feat")
    from audio_fewshot_tpu.models.heads.feat import SetAttention

    b, n, d = 3, 5, 32
    x = rng.normal(size=(b, n, d)).astype(np.float32)

    mha = ref_mod.MultiHeadAttention(1, d, d, d, dropout=0.1).eval()
    with torch.no_grad():
        ref_out = mha(_t(x), _t(x), _t(x))

    attn = SetAttention(hdim=d)
    variables = {
        "params": {
            "w_q": {"kernel": jnp.asarray(lin_w(mha.w_qs.weight))},
            "w_k": {"kernel": jnp.asarray(lin_w(mha.w_ks.weight))},
            "w_v": {"kernel": jnp.asarray(lin_w(mha.w_vs.weight))},
            "fc": {
                "kernel": jnp.asarray(lin_w(mha.fc.weight)),
                "bias": jnp.asarray(_np(mha.fc.bias)),
            },
            "ln": {
                "scale": jnp.asarray(_np(mha.layer_norm.weight)),
                "bias": jnp.asarray(_np(mha.layer_norm.bias)),
            },
        }
    }
    mine = attn.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(_np(ref_out), np.asarray(mine), atol=1e-5)


# -------------------------------------------------------- RelationLayer


def test_relation_layer_parity(rng):
    """RelationLayer scorer vs the reference layers+fc stack
    (relation_net.py:31-60).  The reference ``forward`` is broken as
    snapshotted (debug print + hard-coded .cuda() at :52-54), so the oracle
    drives ``layer.layers`` + ``layer.fc`` directly.  Both sides are
    compared in batch-stat mode (the reference BN has momentum=1 ⇒
    batch-stats-only semantics, matching our use_running_statistics=False)."""
    ref_mod = load_ref("libfewshot_core.model.metric.relation_net")
    from audio_fewshot_tpu.models.heads.relation_net import RelationLayer

    c, h = 16, 18  # (18-2)//2=8 → (8-2)//2=3: fc sees c*3*3
    n = 6
    x = rng.normal(size=(n, 2 * c, h, h)).astype(np.float32)

    layer = ref_mod.RelationLayer(feat_dim=c, feat_height=3, feat_width=3)
    layer.train()  # batch-stat normalization
    with torch.no_grad():
        out = layer.layers(_t(x))
        ref_score = layer.fc(out.reshape(n, -1))

    mine_mod = RelationLayer(feat_dim=c)
    init_vars = mine_mod.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False
    )

    conv1, bn1 = layer.layers[0], layer.layers[1]
    conv2, bn2 = layer.layers[4], layer.layers[5]
    fc1, fc2 = layer.fc[0], layer.fc[2]
    # torch fc1 reads NCHW-flattened [c,3,3]; ours reads NHWC [3,3,c]
    fc1_k = _np(fc1.weight).reshape(8, c, 3, 3).transpose(2, 3, 1, 0).reshape(9 * c, 8)
    variables = {
        "params": {
            "conv1": {
                "kernel": jnp.asarray(_np(conv1.weight).transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(_np(conv1.bias)),
            },
            "bn1": {"BatchNorm_0": {
                "scale": jnp.asarray(_np(bn1.weight)),
                "bias": jnp.asarray(_np(bn1.bias)),
            }},
            "conv2": {
                "kernel": jnp.asarray(_np(conv2.weight).transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(_np(conv2.bias)),
            },
            "bn2": {"BatchNorm_0": {
                "scale": jnp.asarray(_np(bn2.weight)),
                "bias": jnp.asarray(_np(bn2.bias)),
            }},
            "fc1": {
                "kernel": jnp.asarray(fc1_k),
                "bias": jnp.asarray(_np(fc1.bias)),
            },
            "fc2": {
                "kernel": jnp.asarray(lin_w(fc2.weight)),
                "bias": jnp.asarray(_np(fc2.bias)),
            },
        },
        "batch_stats": init_vars["batch_stats"],
    }
    mine, _ = mine_mod.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(_np(ref_score), np.asarray(mine), atol=1e-4)


# ----------------------------------------------------------- ATL_Layer


def test_atl_layer_parity(rng):
    """ATLModule vs reference ATL_Layer in eval mode (atl_net.py:63-153),
    converted W-conv/BN and f_psi MLP weights."""
    ref_mod = load_ref("libfewshot_core.model.metric.atl_net")
    from audio_fewshot_tpu.models.heads.atl_net import ATLModule

    e, way, shot, g, c, h, w = 2, 3, 2, 4, 32, 3, 3
    sup = rng.normal(size=(e, way * shot, c, h, w)).astype(np.float32)
    qry = rng.normal(size=(e, g, c, h, w)).astype(np.float32)

    layer = ref_mod.ATL_Layer(
        feat_dim=c, scale_value=30.0, atten_scale_value=50.0,
        from_value=0.5, value_interval=0.3,
    ).eval()
    with torch.no_grad():
        bn = layer.W[1]
        bn.running_mean.copy_(_t(rng.normal(size=(c,)).astype(np.float32)))
        bn.running_var.copy_(_t(rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32)))
        bn.weight.copy_(_t(rng.normal(size=(c,)).astype(np.float32)))
        bn.bias.copy_(_t(rng.normal(size=(c,)).astype(np.float32)))
        ref_score = layer(way, shot, _t(qry), _t(sup))

    conv = layer.W[0]
    psi1, psi2 = layer.attenLayer.f_psi[0], layer.attenLayer.f_psi[2]
    module = ATLModule(feat_dim=c, scale_value=30.0, atten_scale_value=50.0,
                       from_value=0.5, value_interval=0.3)
    variables = {
        "params": {
            "w_conv": {"kernel": jnp.asarray(_np(conv.weight).transpose(2, 3, 1, 0))},
            "w_bn": {"BatchNorm_0": {
                "scale": jnp.asarray(_np(bn.weight)),
                "bias": jnp.asarray(_np(bn.bias)),
            }},
            "psi1": {
                "kernel": jnp.asarray(lin_w(psi1.weight)),
                "bias": jnp.asarray(_np(psi1.bias)),
            },
            "psi2": {
                "kernel": jnp.asarray(lin_w(psi2.weight)),
                "bias": jnp.asarray(_np(psi2.bias)),
            },
        },
        "batch_stats": {
            "w_bn": {"BatchNorm_0": {
                "mean": jnp.asarray(_np(bn.running_mean)),
                "var": jnp.asarray(_np(bn.running_var)),
            }},
        },
    }
    mine = module.apply(
        variables, jnp.asarray(qry), jnp.asarray(sup), way, shot, train=False
    )
    np.testing.assert_allclose(_np(ref_score), np.asarray(mine), atol=1e-4)
