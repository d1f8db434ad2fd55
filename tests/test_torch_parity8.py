"""Eighth torch-oracle parity suite: the IFSL/DMatchingNet sequence modules
— FullyContextualEmbedding (attention + LSTM cell loop) and the
bidirectional support encoder — with converted LSTM weights.

The reference's ``MatchingNetLayer``/``FCE`` constructors hard-code
``.cuda()`` (matchingnet_ifsl.py:194-196) and cannot be instantiated on
CPU — broken as snapshotted; the oracle instantiates
``FullyContextualEmbedding`` directly (its ctor is device-neutral) and a
plain ``nn.LSTM`` with the reference G-encoder's exact configuration."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _np(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _cell_params(weight_ih, weight_hh, bias_ih, bias_hh):
    """torch LSTM gate stacking (i|f|g|o) → flax OptimizedLSTMCell tree."""
    wi = np.split(_np(weight_ih), 4, axis=0)
    wh = np.split(_np(weight_hh), 4, axis=0)
    bi = np.split(_np(bias_ih), 4, axis=0)
    bh = np.split(_np(bias_hh), 4, axis=0)
    out = {}
    for gate, k in zip("ifgo", range(4)):
        name = {"i": "i", "f": "f", "g": "g", "o": "o"}[gate]
        out[f"i{name}"] = {"kernel": jnp.asarray(wi[k].T)}
        out[f"h{name}"] = {
            "kernel": jnp.asarray(wh[k].T),
            "bias": jnp.asarray(bi[k] + bh[k]),
        }
    return out


def test_fce_parity(rng):
    """FullyContextualEmbedding loop (matchingnet_ifsl.py:162-183) vs our
    scanned _FCEStep with a converted LSTMCell."""
    ref_mod = load_ref("libfewshot_core.model.meta.matchingnet_ifsl")
    from audio_fewshot_tpu.models.heads.ifsl import _FCEStep
    from flax import linen as nn

    d, ns, nq = 16, 6, 4
    fce = ref_mod.FullyContextualEmbedding(d).eval()
    f = rng.normal(size=(nq, d)).astype(np.float32)
    g = rng.normal(size=(ns, d)).astype(np.float32)
    with torch.no_grad():
        ref_out = fce(torch.from_numpy(f), torch.from_numpy(g))

    cell_tree = _cell_params(
        fce.lstmcell.weight_ih, fce.lstmcell.weight_hh,
        fce.lstmcell.bias_ih, fce.lstmcell.bias_hh,
    )
    scan = nn.scan(
        _FCEStep, variable_broadcast="params",
        split_rngs={"params": False}, length=ns,
    )(feat_dim=d)
    h0, c0 = jnp.asarray(f), jnp.zeros_like(jnp.asarray(f))
    (mine, _, _, _), _ = scan.apply(
        {"params": {"cell": cell_tree}},
        (h0, c0, jnp.asarray(f), jnp.asarray(g)), None,
    )
    np.testing.assert_allclose(_np(ref_out), np.asarray(mine), atol=1e-5)


def test_matchingnet_layer_parity(rng):
    """Full MatchingNetLayer semantics: bi-LSTM support encoder (G) + FCE
    (matchingnet_ifsl.py:191-207), with the G-encoder mirrored by a plain
    nn.LSTM in the reference's configuration (their layer hard-codes
    .cuda())."""
    ref_mod = load_ref("libfewshot_core.model.meta.matchingnet_ifsl")
    from audio_fewshot_tpu.models.heads.ifsl import MatchingNetLayer

    d, ns, nq = 16, 6, 4
    lstm = torch.nn.LSTM(d, d, 1, batch_first=True, bidirectional=True).eval()
    fce = ref_mod.FullyContextualEmbedding(d).eval()
    support = rng.normal(size=(ns, d)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)
    with torch.no_grad():
        out_g = lstm(torch.from_numpy(support).unsqueeze(0))[0].squeeze(0)
        g_ref = torch.from_numpy(support) + out_g[:, :d] + out_g[:, d:]
        f_ref = fce(torch.from_numpy(query), g_ref)

    params = {
        # the RNN-wrapped cells register under top-level auto names
        # (fwd = _0, bwd = _1)
        "OptimizedLSTMCell_0": _cell_params(
            lstm.weight_ih_l0, lstm.weight_hh_l0,
            lstm.bias_ih_l0, lstm.bias_hh_l0,
        ),
        "OptimizedLSTMCell_1": _cell_params(
            lstm.weight_ih_l0_reverse, lstm.weight_hh_l0_reverse,
            lstm.bias_ih_l0_reverse, lstm.bias_hh_l0_reverse,
        ),
        "fce": {"cell": _cell_params(
            fce.lstmcell.weight_ih, fce.lstmcell.weight_hh,
            fce.lstmcell.bias_ih, fce.lstmcell.bias_hh,
        )},
    }
    layer = MatchingNetLayer(feat_dim=d)
    g_mine, f_mine = layer.apply(
        {"params": params}, jnp.asarray(support), jnp.asarray(query)
    )
    np.testing.assert_allclose(_np(g_ref), np.asarray(g_mine), atol=1e-5)
    np.testing.assert_allclose(_np(f_ref), np.asarray(f_mine), atol=1e-5)
