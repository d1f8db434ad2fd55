"""Round trip: reference torch backbone checkpoint → converter tool → our
``pretrain_path``/``load_part`` flow, with feature parity on real inputs."""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import audio_fewshot_tpu.models  # noqa: E402,F401  (populate registries)
from audio_fewshot_tpu.registry import BACKBONES  # noqa: E402
from audio_fewshot_tpu.utils.checkpoint import load_part  # noqa: E402
from audio_fewshot_tpu.utils.torch_convert import (  # noqa: E402
    convert_backbone_state_dict,
    strip_prefix,
)


def _randomize_bn(mod):
    g = torch.Generator().manual_seed(3)
    for m in mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d) or isinstance(m, torch.nn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("name,shape,atol", [
    ("Conv64F", (1, 128, 157), 1e-3),
    ("resnet12", (1, 84, 84), 2e-3),
])
def test_converted_state_dict_feature_parity(rng, name, shape, atol):
    ref_conv = load_ref("libfewshot_core.model.backbone.conv_four")
    ref_res = load_ref("libfewshot_core.model.backbone.resnet_12")
    tm = (
        ref_conv.Conv64F(is_flatten=True, num_channels=1)
        if name == "Conv64F"
        else ref_res.resnet12(num_channels=1, drop_rate=0.0)
    ).eval()
    _randomize_bn(tm)

    x = rng.normal(size=(2,) + shape).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))

    kwargs = {"num_channels": 1, "dtype": jnp.float32}
    if name == "Conv64F":
        kwargs["is_flatten"] = True
    else:
        kwargs["drop_rate"] = 0.0
    fm = BACKBONES.build(name, **kwargs)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = convert_backbone_state_dict(state, name, template)

    mine = fm.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        ref_out.numpy(), np.asarray(mine), atol=atol, rtol=1e-3
    )


def test_strip_prefix_extracts_emb_func():
    state = {"emb_func.layer1.0.weight": np.ones(1), "classifier.w": np.zeros(1)}
    out = strip_prefix(state)
    assert list(out) == ["layer1.0.weight"]
    passthrough = {"layer1.0.weight": np.ones(1)}
    assert list(strip_prefix(passthrough)) == ["layer1.0.weight"]


def test_tool_roundtrip_loads_via_load_part(tmp_path, rng):
    """Full CLI tool run → load_part into a method's variable tree."""
    ref_conv = load_ref("libfewshot_core.model.backbone.conv_four")
    tm = ref_conv.Conv64F(is_flatten=True, num_channels=1).eval()
    _randomize_bn(tm)
    src = tmp_path / "emb_func_best.pth"
    torch.save({"emb_func." + k: v for k, v in tm.state_dict().items()}, src)

    out = tmp_path / "converted.pth"
    res = subprocess.run(
        [sys.executable, "tools/convert_torch_checkpoint.py", str(src),
         "--backbone", "Conv64F", "--out", str(out),
         "--backbone_kwargs", "is_flatten=true", "--cpu"],
        capture_output=True, text=True, cwd=".",
    )
    assert res.returncode == 0, res.stderr
    assert out.exists()

    fm = BACKBONES.build("Conv64F", num_channels=1, is_flatten=True,
                         dtype=jnp.float32)
    x = rng.normal(size=(2, 1, 128, 157)).astype(np.float32)
    sub = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = {col: {"emb_func": tree} for col, tree in sub.items()}
    merged = load_part(str(out), variables, "emb_func")

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    mine = fm.apply(
        {col: tree["emb_func"] for col, tree in merged.items()},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(
        ref_out.numpy(), np.asarray(mine), atol=1e-3, rtol=1e-3
    )


def test_resnet12bdc_converted_feature_parity(rng):
    """Flagship backbone: reference resnet12Bdc (BasicBlockVariant trunk +
    BdcPool) state dict through the converter, forward parity on the BDC
    vectors (resnet_bdc.py:282-358)."""
    ref = load_ref("libfewshot_core.model.backbone.resnet_bdc")
    tm = ref.resnet12Bdc(num_channels=1, drop_rate=0.0, reduce_dim=64).eval()
    _randomize_bn(tm)

    x = rng.normal(size=(2, 1, 84, 84)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))

    fm = BACKBONES.build(
        "resnet12Bdc", num_channels=1, drop_rate=0.0, reduce_dim=64,
        dtype=jnp.float32,
    )
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = convert_backbone_state_dict(state, "resnet12Bdc", template)

    mine = fm.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        ref_out.numpy(), np.asarray(mine), atol=5e-3, rtol=1e-2
    )


def test_resnet18_converted_feature_parity(rng):
    """resnet18 stem + 2-block stages through the converter
    (resnet_18.py:92-160)."""
    ref = load_ref("libfewshot_core.model.backbone.resnet_18")
    tm = ref.resnet18(num_channels=1).eval()
    _randomize_bn(tm)

    x = rng.normal(size=(2, 1, 84, 84)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))

    fm = BACKBONES.build("resnet18", num_channels=1, dtype=jnp.float32)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = convert_backbone_state_dict(state, "resnet18", template)

    mine = fm.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        ref_out.numpy(), np.asarray(mine).reshape(ref_out.shape),
        atol=5e-3, rtol=1e-2,
    )


def test_resnet18bdc_converted_feature_parity(rng):
    """resnet18Bdc: reference SimpleBlock trunk + BdcPool through the
    converter, forward parity on the BDC vectors (resnet_bdc.py:141-190).
    The reference stem is 3-channel; the test feeds RGB-shaped input."""
    ref = load_ref("libfewshot_core.model.backbone.resnet_bdc")
    tm = ref.resnet18Bdc(reduce_dim=64).eval()
    _randomize_bn(tm)

    x = rng.normal(size=(2, 3, 84, 84)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))

    fm = BACKBONES.build(
        "resnet18Bdc", num_channels=3, reduce_dim=64, dtype=jnp.float32,
    )
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    from audio_fewshot_tpu.utils.torch_convert import convert_backbone_state_dict as conv

    converted = conv(state, "resnet18Bdc", template)
    mine = fm.apply(converted, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        ref_out.numpy(), np.asarray(mine), atol=5e-3, rtol=1e-2
    )
