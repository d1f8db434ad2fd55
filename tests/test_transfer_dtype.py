"""transfer_dtype wire-compression knob (parallel/mesh.py): bf16 transfer +
on-device fp32 upcast must leave int/mask leaves untouched and keep eval
logits close to the fp32-wire path (the knob changes the wire format, not
the compute precision — backbones already compute in bf16)."""

import jax
import numpy as np
import pytest

from audio_fewshot_tpu.episode import make_dense_episode_batch
from audio_fewshot_tpu.parallel.mesh import (
    get_mesh,
    resolve_transfer_dtype,
    shard_batch,
    upcast_floats,
)


def test_resolve_names():
    assert resolve_transfer_dtype(None) is None
    assert resolve_transfer_dtype("fp32") is None
    assert str(resolve_transfer_dtype("bfloat16")) == "bfloat16"
    assert str(resolve_transfer_dtype("bf16")) == "bfloat16"
    assert resolve_transfer_dtype("float16") == np.float16
    with pytest.raises(ValueError):
        resolve_transfer_dtype("int8")


def test_wire_roundtrip_close():
    rng = np.random.default_rng(0)
    sup = rng.normal(size=(8, 6, 1, 8, 9)).astype(np.float32)
    qry = rng.normal(size=(8, 6, 1, 8, 9)).astype(np.float32)
    batch = make_dense_episode_batch(sup, qry, 3, 1, 2)
    mesh = get_mesh()
    ref = shard_batch(batch, mesh)
    bf = upcast_floats(shard_batch(batch, mesh, resolve_transfer_dtype("bf16")))
    assert bf.support.dtype == np.float32
    # int leaves untouched
    assert bf.query_clip.dtype == ref.query_clip.dtype
    np.testing.assert_array_equal(np.asarray(bf.query_clip),
                                  np.asarray(ref.query_clip))
    # bf16 wire: ~3 decimal digits
    np.testing.assert_allclose(np.asarray(bf.support), np.asarray(ref.support),
                               atol=4e-3, rtol=8e-3)
    # masks survive exactly (0/1 representable)
    np.testing.assert_array_equal(np.asarray(bf.query_mask),
                                  np.asarray(ref.query_mask))
