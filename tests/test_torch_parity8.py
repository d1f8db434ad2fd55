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


def test_renet_scr_parity(rng):
    """RENet SCR self-correlation + refinement vs the reference
    SCRLayer/SCR (renet.py:131-233, residual+relu at :367-374) with
    converted conv/BN weights."""
    ref_mod = load_ref("libfewshot_core.model.finetuning.renet")
    from audio_fewshot_tpu.models.heads.renet import SCRLayer
    import jax.numpy as jnp  # noqa: F811

    c, h, w, mid = 32, 6, 6, 16
    layer = ref_mod.SCRLayer(planes=[c, mid, mid, mid, c]).eval()
    scr = layer.model[1]
    for bn in (scr.conv1x1_in[1], scr.conv1[1], scr.conv2[1], scr.conv1x1_out[1]):
        with torch.no_grad():
            bn.running_mean.copy_(torch.randn(bn.running_mean.shape) * 0.2)
            bn.running_var.copy_(torch.rand(bn.running_var.shape) + 0.5)
            bn.weight.copy_(torch.randn(bn.weight.shape) * 0.5 + 1.0)
            bn.bias.copy_(torch.randn(bn.bias.shape) * 0.2)

    x = rng.normal(size=(3, c, h, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = torch.relu(
            torch.from_numpy(x) + layer(torch.from_numpy(x))
        ).numpy()

    def bn_tree(bn):
        return (
            {"BatchNorm_0": {"scale": jnp.asarray(_np(bn.weight)),
                             "bias": jnp.asarray(_np(bn.bias))}},
            {"BatchNorm_0": {"mean": jnp.asarray(_np(bn.running_mean)),
                             "var": jnp.asarray(_np(bn.running_var))}},
        )

    p_in, s_in = bn_tree(scr.conv1x1_in[1])
    p1, s1 = bn_tree(scr.conv1[1])
    p2, s2 = bn_tree(scr.conv2[1])
    p_out, s_out = bn_tree(scr.conv1x1_out[1])
    variables = {
        "params": {
            "conv_in": {"kernel": jnp.asarray(
                _np(scr.conv1x1_in[0].weight).transpose(2, 3, 1, 0))},
            "bn_in": p_in,
            # Conv3d (1,3,3) kernels convolve only the (u,v) plane
            "conv1": {"kernel": jnp.asarray(
                _np(scr.conv1[0].weight)[:, :, 0].transpose(2, 3, 1, 0))},
            "bn1": p1,
            "conv2": {"kernel": jnp.asarray(
                _np(scr.conv2[0].weight)[:, :, 0].transpose(2, 3, 1, 0))},
            "bn2": p2,
            "conv_out": {"kernel": jnp.asarray(
                _np(scr.conv1x1_out[0].weight).transpose(2, 3, 1, 0))},
            "bn_out": p_out,
        },
        "batch_stats": {"bn_in": s_in, "bn1": s1, "bn2": s2, "bn_out": s_out},
    }
    mine_mod = SCRLayer(channels=mid, kernel=5)
    mine = mine_mod.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(
        ref_out, np.asarray(mine).transpose(0, 3, 1, 2), atol=1e-4, rtol=1e-3
    )


def test_renet_cca_parity(rng):
    """RENet CCA 4-D refinement (SepConv4d stack + symmetrized pass,
    renet.py:29-129) vs our CCAModule with converted weights in
    running-stat eval mode."""
    ref_mod = load_ref("libfewshot_core.model.finetuning.renet")
    from audio_fewshot_tpu.models.heads.renet import CCAModule
    import jax.numpy as jnp  # noqa: F811

    u = v = h = w = 5
    cca = ref_mod.CCA(kernel_sizes=[3, 3], planes=[16, 1]).eval()
    for m in cca.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape) * 0.2)
                m.running_var.copy_(torch.rand(m.running_var.shape) + 0.5)
                m.weight.copy_(torch.randn(m.weight.shape) * 0.3 + 1.0)
                m.bias.copy_(torch.randn(m.bias.shape) * 0.2)

    x = rng.normal(size=(2, 1, u, v, h, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = cca(torch.from_numpy(x)).numpy()[:, 0]

    def bn_tree(bn):
        return (
            {"BatchNorm_0": {"scale": jnp.asarray(_np(bn.weight)),
                             "bias": jnp.asarray(_np(bn.bias))}},
            {"BatchNorm_0": {"mean": jnp.asarray(_np(bn.running_mean)),
                             "var": jnp.asarray(_np(bn.running_var))}},
        )

    params, stats = {}, {}
    for name, sep in (("sep1", cca.conv[0]), ("sep2", cca.conv[2])):
        p_uv, s_uv = bn_tree(sep.conv2[1])
        p_hw, s_hw = bn_tree(sep.conv1[1])
        params[name] = {
            "conv_uv": {"kernel": jnp.asarray(
                _np(sep.conv2[0].weight)[:, :, :, :, 0].transpose(2, 3, 1, 0))},
            "bn_uv": p_uv,
            "conv_hw": {"kernel": jnp.asarray(
                _np(sep.conv1[0].weight)[:, :, 0].transpose(2, 3, 1, 0))},
            "bn_hw": p_hw,
        }
        stats[name] = {"bn_uv": s_uv, "bn_hw": s_hw}
        if sep.isproj:
            p_pr, s_pr = bn_tree(sep.proj[1])
            params[name]["proj"] = {"kernel": jnp.asarray(
                _np(sep.proj[0].weight).transpose(2, 3, 1, 0))}
            params[name]["bn_proj"] = p_pr
            stats[name]["bn_proj"] = s_pr

    mod = CCAModule(use_running_statistics=True)
    mine = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x[:, 0]), train=False,
    )
    np.testing.assert_allclose(ref_out, np.asarray(mine), atol=1e-4, rtol=1e-3)


def test_versa_deterministic_parts_parity(rng):
    """VERSA's deterministic machinery vs the reference: the ψ Predictor
    MLP with converted Linears, and the logits mean/log-variance moments
    through a noise-free VERSALayer (versa.py:25-97; the MC sampling
    itself is rng-framework-specific)."""
    ref_mod = load_ref("libfewshot_core.model.meta.versa")
    from audio_fewshot_tpu.models.heads.versa import Predictor
    import jax.numpy as jnp  # noqa: F811

    d, hid, out = 12, 16, 12
    tp = ref_mod.Predictor(d, hid, out).eval()
    x = rng.normal(size=(7, d)).astype(np.float32)
    with torch.no_grad():
        ref_out = tp(torch.from_numpy(x)).numpy()

    lins = [tp.layers[0], tp.layers[2], tp.layers[4]]
    params = {
        f"Dense_{i}": {
            "kernel": jnp.asarray(_np(l.weight).T),
            "bias": jnp.asarray(_np(l.bias)),
        }
        for i, l in enumerate(lins)
    }
    mine = Predictor(hid, out).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(ref_out, np.asarray(mine), atol=1e-5)

    # moments through a noise-free VERSALayer: averaged_prediction with
    # sample_normal patched to return mu equals the logits mean
    way, g = 3, 5
    layer = ref_mod.VERSALayer(sample_num=1)
    layer.sample_normal = lambda mu, logvar, n: mu[None]
    qf = rng.normal(size=(1, g, d)).astype(np.float32)
    wm = rng.normal(size=(1, d, way)).astype(np.float32)
    wl = rng.normal(size=(1, d, way)).astype(np.float32) * 0.1
    bm = rng.normal(size=(1, 1, way)).astype(np.float32)
    bl = rng.normal(size=(1, 1, way)).astype(np.float32) * 0.1
    with torch.no_grad():
        pred, _ = layer(
            way, torch.from_numpy(qf), torch.zeros(g, dtype=torch.long),
            torch.from_numpy(wm), torch.from_numpy(wl),
            torch.from_numpy(bm), torch.from_numpy(bl),
        )
    mean = jnp.einsum("egd,edw->egw", jnp.asarray(qf), jnp.asarray(wm)) + jnp.asarray(bm)
    logvar = jnp.log(
        jnp.einsum("egd,edw->egw", jnp.asarray(qf) ** 2, jnp.exp(jnp.asarray(wl)))
        + jnp.exp(jnp.asarray(bl))
    )
    assert np.isfinite(np.asarray(logvar)).all()
    np.testing.assert_allclose(
        _np(pred), np.asarray(mean).reshape(-1, way), atol=1e-5
    )
