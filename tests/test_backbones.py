"""Backbone shape/behavior tests (CPU, small inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audio_fewshot_tpu.models  # noqa: F401  (populates registries)
from audio_fewshot_tpu.ops.bdc import bdc_pool, triuvec
from audio_fewshot_tpu.registry import BACKBONES


def _run(name, kwargs, shape=(2, 1, 36, 44), train=False):
    net = BACKBONES.build(name, dtype=jnp.float32, **kwargs)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "dropblock": jax.random.PRNGKey(2)},
        x, train=True,
    )
    out = net.apply(variables, x, train=train)
    return out, variables


def test_resnet12_shapes():
    out, _ = _run("resnet12", {"num_channels": 1, "avg_pool": False, "is_flatten": False})
    # 4 stride-2 pools: 36→18→9→4→2, 44→22→11→5→2
    assert out.shape == (2, 640, 2, 2)
    out, _ = _run("resnet12", {"num_channels": 1, "avg_pool": True, "is_flatten": True})
    assert out.ndim == 2 and out.shape[0] == 2


def test_resnet12wolsc_widths():
    out, v = _run("resnet12woLSC", {"num_channels": 1, "avg_pool": False, "is_flatten": False})
    assert out.shape[1] == 512
    # stage 4 has no residual → no downsample conv
    assert "downsample_conv" not in v["params"]["layer4"]


def test_resnet12_dense_map():
    out, _ = _run("resnet12_mcl", {"num_channels": 1})
    assert out.shape == (2, 640, 2, 2)


def test_resnet12bdc_output_dim():
    out, v = _run("resnet12Bdc", {"num_channels": 1, "reduce_dim": 16})
    assert out.shape == (2, 16 * 17 // 2)
    assert "log_temperature" in v["params"]["bdc_pool"]


def test_resnet18():
    out, _ = _run("resnet18", {"num_channels": 1})
    assert out.shape == (2, 512)
    out, _ = _run("resnet18", {"num_channels": 1, "is_flatten": False, "avg_pool": False, "last_block_stride": 1})
    assert out.shape[1] == 512 and out.ndim == 4


def test_wrn():
    out, _ = _run("WRN", {"depth": 10, "widen_factor": 2, "num_channels": 1})
    assert out.shape == (2, 128)


def test_dropblock_counter_tracks():
    net = BACKBONES.build("resnet12", dtype=jnp.float32, num_channels=1,
                          avg_pool=False, is_flatten=True, drop_rate=0.1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 36, 44)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "dropblock": jax.random.PRNGKey(2)}
    variables = net.init(rngs, x, train=True)
    c0 = variables["batch_stats"]["layer3"]["num_batches_tracked"]
    _, mut = net.apply(variables, x, train=True, mutable=["batch_stats"],
                       rngs={k: v for k, v in rngs.items() if k != "params"})
    c1 = mut["batch_stats"]["layer3"]["num_batches_tracked"]
    assert int(c1) == int(c0) + 1


def test_bdc_pool_math():
    """BDC op vs a literal NumPy transcription of the reference bmm chain
    (bdc_pool.py:69-92) — same results, one matmul instead of five."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 6, 10)).astype(np.float32)
    log_t = np.float32(np.log(1 / 20.0))

    out = np.asarray(bdc_pool(jnp.asarray(x), jnp.asarray(log_t)))

    # literal reference math
    b, d, m = x.shape
    gram = x @ x.transpose(0, 2, 1)
    diag = np.einsum("bii->bi", gram)
    ones = np.ones((b, d, d), np.float32)
    diag_mat = gram * np.eye(d)
    dcov = ones @ diag_mat + diag_mat @ ones - 2 * gram
    dcov = np.sqrt(np.clip(dcov, 0, None) * np.exp(log_t) + 1e-5)
    ref = (dcov - dcov @ ones / d - ones @ dcov / d
           + ones @ dcov @ ones / (d * d))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    # triuvec ordering: row-major upper triangle incl. diagonal
    v = np.asarray(triuvec(jnp.asarray(ref)))
    iu = np.triu_indices(d)
    np.testing.assert_allclose(v, ref[:, iu[0], iu[1]], rtol=1e-6)
