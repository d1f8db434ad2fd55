"""Transformer/CLAP/MTL backbones + CPEA head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audio_fewshot_tpu.models  # noqa: F401
from audio_fewshot_tpu.registry import BACKBONES


def _run(name, kwargs, shape=(2, 1, 32, 48)):
    net = BACKBONES.build(name, dtype=jnp.float32, **kwargs)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "dropblock": jax.random.PRNGKey(2)}
    variables = net.init(rngs, x, train=False)
    out = net.apply(variables, x, train=False)
    return out, variables


def test_vit_cls_feature():
    out, _ = _run("ViT", {"patch_size": 8, "embed_dim": 32, "depth": 2,
                          "num_heads": 2, "num_channels": 1})
    assert out.shape == (2, 32)


def test_vit_tokens_for_cpea():
    out, _ = _run("vit_tiny", {"patch_size": 8, "num_channels": 1})
    # 4x6 patches + cls
    assert out.shape == (2, 1 + 4 * 6, 192)


def test_swin():
    out, _ = _run("swin_mini", {"window_size": 4, "num_channels": 1},
                  shape=(2, 1, 32, 48))
    assert out.ndim == 2 and out.shape[0] == 2


def test_clap_embedding_passthrough():
    net = BACKBONES.build("CLAPEmbeddingBackbone")
    x = jnp.ones((3, 512))
    v = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_clap_backbone_refuses_random_init():
    """The waveform CLAPBackbone (round 2) refuses to construct without
    weights unless allow_random_init is set — nobody silently trains
    "CLAP" from noise."""
    with pytest.raises(ValueError, match="allow_random_init"):
        BACKBONES.build("CLAPBackbone")


def test_resnet12_mtl_scale_shift():
    out, v = _run("resnet12MTLofficial", {"num_channels": 1},
                  shape=(2, 1, 80, 80))
    assert out.shape == (2, 640)
    p = v["params"]["layer1_0"]["conv1"]
    assert "mtl_scale" in p and "mtl_bias" in p
    # per (in, out) channel-pair scale (reference mtl_weight (out,in,1,1))
    assert p["mtl_scale"].shape == (1, 1, 80, 160)
    # base kernel is frozen: grads w.r.t. kernel must be zero
    net = BACKBONES.build("resnet12MTLofficial", dtype=jnp.float32,
                          num_channels=1)
    x = jnp.ones((2, 1, 80, 80))

    def loss_fn(params):
        out, _ = net.apply({**v, "params": params}, x, train=False,
                           mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads = jax.grad(loss_fn)(v["params"])
    gk = grads["layer1_0"]["conv1"]["kernel"]
    gs = grads["layer1_0"]["conv1"]["mtl_scale"]
    assert float(jnp.sum(jnp.abs(gk))) == 0.0
    assert float(jnp.sum(jnp.abs(gs))) > 0.0


def test_cpea_head():
    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.models import build_method
    from audio_fewshot_tpu.models.base import EpisodeSetting

    setting = EpisodeSetting(way=3, shot=2, query=2)
    config = {
        "backbone": {"name": "vit_tiny", "kwargs": {
            "patch_size": 8, "num_channels": 1, "depth": 2}},
        "classifier": {"name": "CPEANet", "kwargs": {"in_dim": 192}},
        "modality": "audio",
        "way_num": 3, "shot_num": 2, "query_num": 2,
        "precision": "fp32",
    }
    method = build_method(config)
    rng = np.random.default_rng(0)
    spec = (1, 32, 48)
    sup = rng.normal(size=(1, 6) + spec).astype(np.float32)
    qry = rng.normal(size=(1, 6) + spec).astype(np.float32)
    batch = make_dense_episode_batch(sup, qry, 3, 2, 2)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    loss, out = method.loss(variables, batch, setting, jax.random.PRNGKey(1))
    assert out.seg_logits.shape == (1, 6, 3)
    assert np.isfinite(float(loss))
    seg = method.forward(variables, batch, setting)
    assert seg.shape == (1, 6, 3)
