"""Numerical parity against the PyTorch reference (imported as an oracle from
/root/reference — see ref_loader.py).

Each test runs the reference torch code and this framework's JAX code on
shared random inputs (and, for backbones, identical converted weights) and
asserts fp32 agreement.  This grounds the "accuracy within 0.5 pts" north
star at the operator level (VERDICT round 1, item 2)."""

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


def conv_w(t):
    """torch Conv2d [O,I,kh,kw] → flax [kh,kw,I,O]."""
    return _np(t).transpose(2, 3, 1, 0)


def lin_w(t):
    """torch Linear [O,I] → flax kernel [I,O]."""
    return _np(t).transpose(1, 0)


# ---------------------------------------------------------------- BDC pool


def test_bdc_pool_parity(rng):
    ref = load_ref("libfewshot_core.model.backbone.utils.bdc_pool")
    from audio_fewshot_tpu.ops import bdc_pool, triuvec

    x = rng.normal(size=(4, 16, 5, 6)).astype(np.float32)
    log_t = np.float32(np.log(1.0 / (2 * 5 * 6)))

    with torch.no_grad():
        ref_mat = ref.BDCovpool(_t(x), _t(np.full((1, 1), log_t)))
        ref_vec = ref.Triuvec(ref_mat)

    mine = bdc_pool(jnp.asarray(x.reshape(4, 16, 30)), jnp.asarray(log_t))
    np.testing.assert_allclose(_np(ref_mat), np.asarray(mine), atol=1e-4)
    np.testing.assert_allclose(
        _np(ref_vec), np.asarray(triuvec(mine)), atol=1e-4
    )


# ---------------------------------------------------------------- ProtoLayer


@pytest.mark.parametrize("mode", ["euclidean", "cos_sim"])
def test_proto_layer_parity(rng, mode):
    ref = load_ref("libfewshot_core.model.metric.proto_net")
    from audio_fewshot_tpu.models.heads.proto_net import proto_logits

    t, way, shot, query, c = 3, 5, 2, 4, 17
    sup = rng.normal(size=(t, way * shot, c)).astype(np.float32)
    qry = rng.normal(size=(t, way * query, c)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.ProtoLayer()(_t(qry), _t(sup), way, shot, query, mode=mode)
    mine = proto_logits(jnp.asarray(qry), jnp.asarray(sup), way, shot, mode)
    np.testing.assert_allclose(_np(ref_out), np.asarray(mine), atol=1e-4)


# ---------------------------------------------------------------- R2D2Layer


def test_r2d2_layer_parity(rng):
    ref = load_ref("libfewshot_core.model.meta.r2d2")
    from audio_fewshot_tpu.models.heads.r2d2 import ridge_logits

    t, way, shot, query, c = 2, 5, 2, 3, 12
    ns = way * shot
    sup = rng.normal(size=(t, ns, c)).astype(np.float32)
    qry = rng.normal(size=(t, way * query, c)).astype(np.float32)
    sup_y = np.tile(np.repeat(np.arange(way), shot)[None], (t, 1))

    layer = ref.R2D2Layer()
    with torch.no_grad():
        ref_logit, _ = layer(way, shot, _t(qry), _t(sup), _t(sup_y))

    onehot = jax.nn.one_hot(jnp.asarray(sup_y), way)
    mine = ridge_logits(
        jnp.asarray(qry), jnp.asarray(sup), onehot,
        alpha=1.0, beta=0.0, gamma=50.0,
    )
    np.testing.assert_allclose(_np(ref_logit), np.asarray(mine), atol=1e-4)


# ---------------------------------------------------------------- DN4Layer


def test_dn4_layer_parity(rng):
    ref = load_ref("libfewshot_core.model.metric.dn4")
    from audio_fewshot_tpu.models.heads.dn4 import dn4_logits

    t, way, shot, query, c, h, w = 2, 3, 2, 2, 9, 3, 4
    n_k = 3
    sup = rng.normal(size=(t, way * shot, c, h, w)).astype(np.float32)
    qry = rng.normal(size=(t, way * query, c, h, w)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.DN4Layer(n_k)(_t(qry), _t(sup), way, shot, query)
    mine = dn4_logits(jnp.asarray(qry), jnp.asarray(sup), way, shot, n_k)
    np.testing.assert_allclose(_np(ref_out), np.asarray(mine), atol=1e-4)


# ---------------------------------------------------------------- DistLinear


def test_dist_linear_parity(rng):
    ref = load_ref("libfewshot_core.model.finetuning.baseline_plus")
    from audio_fewshot_tpu.models.heads.finetuning import cosine_scores

    in_c, out_c, n = 16, 10, 7
    layer = ref.DistLinear(in_c, out_c)
    x = rng.normal(size=(n, in_c)).astype(np.float32)
    with torch.no_grad():
        ref_out = layer(_t(x))
        # effective fc weight under torch weight_norm(dim=0):
        # w = g * v / ||v||_row
        g = layer.fc.weight_g.detach().numpy()
        v = layer.fc.weight_v.detach().numpy()
    w_eff = g * v / np.linalg.norm(v, axis=1, keepdims=True)
    mine = cosine_scores(jnp.asarray(x), jnp.asarray(w_eff), scale=2.0)
    np.testing.assert_allclose(_np(ref_out), np.asarray(mine), atol=1e-4)


# ------------------------------------------------- vote / average aggregation


def test_vote_and_average_parity(rng):
    utils = load_ref("libfewshot_core.utils.utils")
    from audio_fewshot_tpu.utils.aggregate import average_logits, majority_vote

    way = 5
    repeats = [3, 1, 2, 4, 1, 5]
    total = sum(repeats)
    logits = rng.normal(size=(total, way)).astype(np.float32)

    with torch.no_grad():
        ref_votes = utils.majority_vote(
            torch.softmax(_t(logits), dim=1), repeats
        )
        ref_avg = utils.average_logits(_t(logits), repeats)

    clip_id = np.repeat(np.arange(len(repeats)), repeats).astype(np.int32)
    mask = np.ones(total, np.float32)
    mine_votes = majority_vote(
        jnp.asarray(logits), jnp.asarray(clip_id), jnp.asarray(mask), len(repeats)
    )
    mine_avg = average_logits(
        jnp.asarray(logits), jnp.asarray(clip_id), jnp.asarray(mask), len(repeats)
    )
    np.testing.assert_array_equal(_np(ref_votes).astype(np.int32), np.asarray(mine_votes))
    np.testing.assert_allclose(_np(ref_avg), np.asarray(mine_avg), atol=1e-5)


def test_majority_vote_tie_break_parity(rng):
    """torch.mode returns the smallest value among ties; argmax over vote
    counts picks the first (= smallest) class.  Pin it with a forced tie."""
    utils = load_ref("libfewshot_core.utils.utils")
    from audio_fewshot_tpu.utils.aggregate import majority_vote

    way = 4
    # one clip, 4 segments: votes 3,3,1,1 → tie between class 1 and 3
    logits = np.full((4, way), -10.0, np.float32)
    logits[0, 3] = 10.0
    logits[1, 3] = 10.0
    logits[2, 1] = 10.0
    logits[3, 1] = 10.0
    with torch.no_grad():
        ref_vote = utils.majority_vote(torch.softmax(_t(logits), dim=1), [4])
    mine = majority_vote(
        jnp.asarray(logits), jnp.zeros(4, jnp.int32), jnp.ones(4, jnp.float32), 1
    )
    assert int(_np(ref_vote)[0]) == int(np.asarray(mine)[0]) == 1


# ------------------------------------------------------------ Conv64F forward


def _randomize_bn(m):
    """Give torch BN layers non-trivial running stats so eval-mode parity
    actually exercises the statistics path."""
    g = torch.Generator().manual_seed(5)
    for mod in m.modules():
        if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            if mod.running_mean is not None:
                mod.running_mean.normal_(0.0, 0.5, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
            mod.weight.data.normal_(1.0, 0.2, generator=g)
            mod.bias.data.normal_(0.0, 0.2, generator=g)


def _bn_to_flax(params, stats, torch_bn):
    params["scale"] = _np(torch_bn.weight)
    params["bias"] = _np(torch_bn.bias)
    stats["mean"] = _np(torch_bn.running_mean)
    stats["var"] = _np(torch_bn.running_var)


def test_conv64f_forward_parity(rng):
    ref = load_ref("libfewshot_core.model.backbone.conv_four")
    from audio_fewshot_tpu.registry import BACKBONES

    tm = ref.Conv64F(is_flatten=True, num_channels=1).eval()
    _randomize_bn(tm)

    x = rng.normal(size=(2, 1, 128, 157)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(_t(x))

    fm = BACKBONES.build(
        "Conv64F", is_flatten=True, num_channels=1, dtype=jnp.float32
    )
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    for i in range(1, 5):
        seq = getattr(tm, f"layer{i}")
        params[f"layer{i}"]["Conv_0"]["kernel"] = conv_w(seq[0].weight)
        params[f"layer{i}"]["Conv_0"]["bias"] = _np(seq[0].bias)
        _bn_to_flax(
            params[f"layer{i}"]["BatchNorm_0"]["BatchNorm_0"],
            stats[f"layer{i}"]["BatchNorm_0"]["BatchNorm_0"],
            seq[1],
        )
    _bn_to_flax(
        params["logits_bn"]["BatchNorm_0"], stats["logits_bn"]["BatchNorm_0"],
        tm.logits[1],
    )
    params["logits_dense"]["kernel"] = lin_w(tm.logits[2].weight)
    params["logits_dense"]["bias"] = _np(tm.logits[2].bias)

    mine = fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(
        _np(ref_out), np.asarray(mine), atol=1e-3, rtol=1e-4
    )


# ------------------------------------------------------------ resnet12 forward


def test_resnet12_forward_parity(rng):
    ref = load_ref("libfewshot_core.model.backbone.resnet_12")
    from audio_fewshot_tpu.registry import BACKBONES

    tm = ref.resnet12(num_channels=1, drop_rate=0.0).eval()
    _randomize_bn(tm)

    x = rng.normal(size=(2, 1, 84, 84)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(_t(x))

    fm = BACKBONES.build(
        "resnet12", num_channels=1, drop_rate=0.0, dtype=jnp.float32
    )
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    for i in range(1, 5):
        blk = getattr(tm, f"layer{i}")[0]
        p = params[f"layer{i}"]
        s = stats[f"layer{i}"]
        for j in range(1, 4):
            p[f"conv{j}"]["kernel"] = conv_w(getattr(blk, f"conv{j}").weight)
            _bn_to_flax(
                p[f"bn{j}"]["BatchNorm_0"], s[f"bn{j}"]["BatchNorm_0"],
                getattr(blk, f"bn{j}"),
            )
        p["downsample_conv"]["kernel"] = conv_w(blk.downsample[0].weight)
        _bn_to_flax(
            p["downsample_bn"]["BatchNorm_0"], s["downsample_bn"]["BatchNorm_0"],
            blk.downsample[1],
        )

    mine = fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(
        _np(ref_out), np.asarray(mine), atol=2e-3, rtol=1e-3
    )
