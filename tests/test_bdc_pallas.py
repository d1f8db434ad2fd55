"""Pallas fused BDC kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_fewshot_tpu.ops.bdc import bdc_pool, triuvec
from audio_fewshot_tpu.ops.bdc_pallas import bdc_pool_fused


def test_fused_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64, 304)).astype(np.float32))
    log_t = jnp.asarray(np.float32(np.log(1 / 608.0)))
    ref = np.asarray(bdc_pool(x, log_t))
    out = np.asarray(bdc_pool_fused(x, log_t, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4)
    # and through triuvec
    np.testing.assert_allclose(
        np.asarray(triuvec(jnp.asarray(out))),
        np.asarray(triuvec(jnp.asarray(ref))), atol=5e-4,
    )


def test_fused_odd_shapes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 45)).astype(np.float32))
    log_t = jnp.asarray(np.float32(0.0))
    ref = np.asarray(bdc_pool(x, log_t))
    out = np.asarray(bdc_pool_fused(x, log_t, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4)
