"""init_type weight re-initialization (reference model/init.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audio_fewshot_tpu.models  # noqa: F401
from audio_fewshot_tpu.models.init import init_weights
from audio_fewshot_tpu.registry import BACKBONES


@pytest.fixture
def params():
    net = BACKBONES.build("Conv64F", dtype=jnp.float32, num_channels=1,
                          is_flatten=False, last_pool=False, maxpool_last2=False)
    v = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "dropblock": jax.random.PRNGKey(2)},
        jnp.ones((1, 1, 32, 24)), train=True,
    )
    return v["params"]


@pytest.mark.parametrize("init_type", ["normal", "xavier", "kaiming", "orthogonal"])
def test_kernels_redrawn_biases_kept(params, init_type):
    out = init_weights(params, init_type, jax.random.PRNGKey(3))
    k0 = np.asarray(params["layer1"]["Conv_0"]["kernel"])
    k1 = np.asarray(out["layer1"]["Conv_0"]["kernel"])
    assert k0.shape == k1.shape
    assert not np.allclose(k0, k1)
    b0 = np.asarray(params["layer1"]["Conv_0"]["bias"])
    b1 = np.asarray(out["layer1"]["Conv_0"]["bias"])
    np.testing.assert_array_equal(b0, b1)


def test_orthogonal_is_orthogonal(params):
    out = init_weights(params, "orthogonal", jax.random.PRNGKey(3))
    k = np.asarray(out["layer1"]["Conv_0"]["kernel"]).reshape(-1, 64)
    # semi-orthogonal along the smaller dimension (9 rows here)
    gram = k @ k.T
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() < 1e-4


def test_unknown_init_raises(params):
    with pytest.raises(ValueError):
        init_weights(params, "bogus", jax.random.PRNGKey(0))
