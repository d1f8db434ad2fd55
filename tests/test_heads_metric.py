"""Metric-family head tests: shapes, learnability signals, reference-math
parity on tiny fixtures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.episode import make_dense_episode_batch
from audio_fewshot_tpu.models import build_method
from audio_fewshot_tpu.models.base import EpisodeSetting
from audio_fewshot_tpu.models.heads.dn4 import dn4_logits
from audio_fewshot_tpu.models.heads.r2d2 import ridge_logits

SPEC = (1, 32, 24)
SETTING = EpisodeSetting(way=3, shot=2, query=3)


def make_batch(seed=0, e=2, spec=SPEC):
    rng = np.random.default_rng(seed)
    way, shot, query = SETTING.way, SETTING.shot, SETTING.query
    sup = rng.normal(size=(e, way * shot) + spec).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + spec).astype(np.float32)
    return make_dense_episode_batch(sup, qry, way, shot, query)


def build(classifier, backbone_kwargs=None, **cls_kwargs):
    config = {
        "backbone": {
            "name": "Conv64F",
            "kwargs": dict(
                {"is_flatten": False, "last_pool": False, "maxpool_last2": False,
                 "num_channels": 1},
                **(backbone_kwargs or {}),
            ),
        },
        "classifier": {"name": classifier, "kwargs": cls_kwargs or None},
        "modality": "audio",
        "precision": "fp32",
    }
    return build_method(config)


def run_head(classifier, spec=SPEC, backbone_kwargs=None, **cls_kwargs):
    method = build(classifier, backbone_kwargs=backbone_kwargs, **cls_kwargs)
    batch = make_batch(spec=spec)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)
    loss, out = method.loss(variables, batch, SETTING, jax.random.PRNGKey(1))
    seg_logits = method.forward(variables, batch, SETTING)
    assert out.seg_logits.shape == (2, 9, 3)
    assert seg_logits.shape == (2, 9, 3)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(seg_logits)))
    return method, variables, batch, loss


def test_meta_baseline():
    method, variables, batch, _ = run_head("MetaBaseline")
    assert float(variables["params"]["head"]["temp"]) == 10.0
    # cosine logits scaled by temp ⇒ bounded by |temp|
    seg = np.asarray(method.forward(variables, batch, SETTING))
    assert np.all(np.abs(seg) <= 10.0 + 1e-4)


def test_dn4():
    run_head("DN4", n_k=2)


def test_dn4_math_tiny():
    """DN4 logits equal a literal loop over the reference formula."""
    rng = np.random.default_rng(0)
    e, way, shot, c, h, w = 1, 2, 2, 4, 2, 2
    g = 3
    q = rng.normal(size=(e, g, c, h, w)).astype(np.float32)
    s = rng.normal(size=(e, way * shot, c, h, w)).astype(np.float32)
    n_k = 2
    out = np.asarray(dn4_logits(jnp.asarray(q), jnp.asarray(s), way, shot, n_k))

    hw = h * w
    for gi in range(g):
        ql = q[0, gi].reshape(c, hw).T
        ql /= np.linalg.norm(ql, axis=1, keepdims=True)
        for wi in range(way):
            sl = s[0, wi * shot:(wi + 1) * shot].transpose(1, 0, 2, 3).reshape(c, shot * hw)
            sl /= np.linalg.norm(sl, axis=0, keepdims=True)
            rel = ql @ sl  # [hw, shot*hw]
            expect = np.sort(rel, axis=1)[:, -n_k:].sum()
            np.testing.assert_allclose(out[0, gi, wi], expect, rtol=1e-5)


def test_relation_net():
    # [96,72] → two stride-3 pools → [10,7] maps, big enough for the
    # 2-conv relation scorer
    run_head("RelationNet", spec=(1, 96, 72))


def test_r2d2():
    run_head("R2D2")


def test_r2d2_solves_ridge_exactly():
    """For γ→0 and separable support, ridge weights interpolate the one-hot
    targets on the support itself."""
    rng = np.random.default_rng(1)
    e, ns, d, way = 2, 6, 12, 3
    sup = rng.normal(size=(e, ns, d)).astype(np.float32)
    onehot = np.zeros((e, ns, way), np.float32)
    labels = np.repeat(np.arange(way), ns // way)
    onehot[:, np.arange(ns), labels[None, :].repeat(e, 0)] = 1.0
    logits = np.asarray(ridge_logits(
        jnp.asarray(sup), jnp.asarray(sup), jnp.asarray(onehot),
        1.0, 0.0, 1e-4,
    ))
    np.testing.assert_allclose(logits, onehot, atol=1e-2)


def test_deepbdc_with_bdc_backbone():
    config = {
        "backbone": {"name": "resnet12Bdc", "kwargs": {"num_channels": 1, "reduce_dim": 8}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "modality": "audio",
        "precision": "fp32",
    }
    from audio_fewshot_tpu.models import build_method as bm

    method = bm(config)
    batch = make_batch()
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)
    loss, out = method.loss(variables, batch, SETTING, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    seg_logits = method.forward(variables, batch, SETTING)
    u, ok = method.clip_uncertainty(seg_logits, batch)
    assert u.shape == (2, 9) and ok.shape == (2, 9)
    mask = method.ood_mask(u)
    # top-20% of 18 queries → 3 flagged
    assert int(np.asarray(mask).sum()) == 3


def test_deepbdc_1shot_dot_product():
    """1-shot switches to dot-product logits (reference deepbdc.py:37-53)."""
    from audio_fewshot_tpu.models.heads.deepbdc import bdc_proto_logits

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 4, 6)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(1, 3, 6)).astype(np.float32))
    out = bdc_proto_logits(q, s, way=3, shot=1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.einsum("egd,ewd->egw", q, s)), rtol=1e-6
    )


def test_calibration_threshold():
    """Calibration over a synthetic loader produces a finite threshold."""
    from audio_fewshot_tpu.data.dataset import SpectrogramDataset
    from audio_fewshot_tpu.data.loader import EpisodicLoader
    from audio_fewshot_tpu.parallel import get_mesh

    config = {
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "modality": "audio",
        "precision": "fp32",
    }
    from audio_fewshot_tpu.models import build_method as bm

    method = bm(config)
    ds = SpectrogramDataset.synthetic(num_classes=5, clips_per_class=8,
                                      segment_shape=SPEC, max_segments=2, seed=0)
    loader = EpisodicLoader(ds, way=3, shot=2, query=3, episodes_per_epoch=4,
                            episode_size=2, mode="eval", prefetch=0)
    batch = next(iter(loader.epoch(0)))
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)
    mesh = get_mesh(1)
    th = method.calibrate_threshold(variables, loader, SETTING, mesh)
    assert th is not None and np.isfinite(th)
    assert method.uncertain_global_threshold == th
