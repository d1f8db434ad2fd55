"""Second metric-head batch: ADM, ADM_KL, ConvMNet, FEAT, FRN, DSN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.episode import make_dense_episode_batch, segment_targets
from audio_fewshot_tpu.models import build_method
from audio_fewshot_tpu.models.base import EpisodeSetting

SPEC = (1, 32, 24)
SETTING = EpisodeSetting(way=3, shot=2, query=3)


def make_batch(seed=0, e=2):
    rng = np.random.default_rng(seed)
    way, shot, query = SETTING.way, SETTING.shot, SETTING.query
    sup = rng.normal(size=(e, way * shot) + SPEC).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + SPEC).astype(np.float32)
    return make_dense_episode_batch(sup, qry, way, shot, query)


def build(classifier, **cls_kwargs):
    return build_method({
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": classifier, "kwargs": cls_kwargs or None},
        "modality": "audio",
        "way_num": SETTING.way, "shot_num": SETTING.shot,
        "query_num": SETTING.query, "precision": "fp32",
    })


@pytest.mark.parametrize("classifier,kwargs", [
    ("ADM", {"n_k": 2}),
    ("ADM_KL", {"n_k": 2}),
    ("ConvMNet", {}),
    ("FEAT", {"hdim": 128, "temperature": 64, "temperature2": 16, "balance": 0.1,
              "mode": "euclidean"}),
    ("FRN", {}),
    ("DSN", {"discriminative": True}),
])
def test_head_runs(classifier, kwargs):
    method = build(classifier, **kwargs)
    batch = make_batch()
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)
    loss, out = method.loss(variables, batch, SETTING, jax.random.PRNGKey(1))
    assert out.seg_logits.shape == (2, 9, 3), classifier
    assert np.isfinite(float(loss)), classifier
    seg_logits = method.forward(variables, batch, SETTING)
    assert seg_logits.shape == (2, 9, 3)
    assert np.all(np.isfinite(np.asarray(seg_logits))), classifier

    # gradients flow to all trainable params
    def outer(params):
        v = {**variables, "params": params}
        l, _ = method.loss(v, batch, SETTING, jax.random.PRNGKey(1))
        return l

    grads = jax.grad(outer)(variables["params"])
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0.0, classifier


def test_kl_gaussian_identity_is_zero():
    from audio_fewshot_tpu.models.heads.local_metrics import (
        _descriptor_moments, kl_gaussian_batch,
    )

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 3, 20, 6)).astype(np.float32))
    mean, cov = _descriptor_moments(feats)
    kl = np.asarray(kl_gaussian_batch(mean, cov, mean, cov))
    # KL(p‖p) = 0 on the diagonal; cross terms must be positive
    np.testing.assert_allclose(np.diagonal(kl, axis1=1, axis2=2), 0.0, atol=1e-3)
    off = kl[0][~np.eye(3, dtype=bool)]
    assert (off > 0).all()


def test_dsn_projection_property():
    """Support vectors lie (nearly) in their own class subspace when
    shot-1 >= rank, so support-as-query distances are ~0 only for k=shot
    — with k=shot-1 distances are small but class-ordering holds."""
    from audio_fewshot_tpu.models.heads.dsn import dsn_logits

    rng = np.random.default_rng(0)
    e, way, shot, d = 1, 3, 3, 8
    sup = rng.normal(size=(e, way * shot, d)).astype(np.float32)
    logits, subspace = dsn_logits(
        jnp.asarray(sup), jnp.asarray(sup), way, shot
    )
    assert subspace.shape == (e, way, d, shot - 1)
    # each support sample's best class should overwhelmingly be its own
    preds = np.argmax(np.asarray(logits)[0], axis=-1)
    labels = np.repeat(np.arange(way), shot)
    assert (preds == labels).mean() >= 2 / 3


def test_frn_perfect_reconstruction_zero_dist():
    """When queries live in the span of the support pool and λ→0, ρ=1, the
    reconstruction distance collapses toward zero."""
    from audio_fewshot_tpu.models.heads.frn import frn_recon_dist

    rng = np.random.default_rng(0)
    e, way, sr, d = 1, 2, 16, 4  # sr >> d → full-rank span
    sup = rng.normal(size=(e, way, sr, d)).astype(np.float32)
    qry = sup[:, 0, :3, :]  # queries from class 0's pool
    dist = np.asarray(frn_recon_dist(
        jnp.asarray(qry), jnp.asarray(sup),
        jnp.asarray(-10.0), jnp.asarray(0.0),
    ))
    assert dist[0, :, 0].max() < 1e-2
