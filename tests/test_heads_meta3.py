"""Meta-family batch 3: MTL, MeTAL, DMatchingNet (IFSL), IfslPretrain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.episode import make_dense_episode_batch
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
    ("MTL", {"inner_param": {"iter": 3, "lr": 0.01}}),
    ("MeTAL", {"inner_param": {"lr": 0.01, "train_iter": 2, "test_iter": 2}}),
    ("DMatchingNet", {"ifsl_param": {"n_splits": 4, "class_num": 6,
                                     "temp": 5.0}}),
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

    def outer(params):
        v = {**variables, "params": params}
        l, _ = method.loss(v, batch, SETTING, jax.random.PRNGKey(1))
        return l

    grads = jax.grad(outer)(variables["params"])
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0.0, classifier


def test_metal_meta_loss_gets_gradients():
    """The learned loss nets must receive outer gradients through the
    inner-loop adaptation."""
    method = build("MeTAL", inner_param={"lr": 0.05, "train_iter": 2,
                                         "test_iter": 2})
    batch = make_batch()
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)

    def outer(params):
        v = {**variables, "params": params}
        l, _ = method.loss(v, batch, SETTING, jax.random.PRNGKey(1))
        return l

    grads = jax.grad(outer)(variables["params"])
    ml = sum(float(jnp.sum(g ** 2))
             for g in jax.tree_util.tree_leaves(grads["meta_loss"]))
    assert ml > 0.0


def test_ifsl_pretrain():
    from audio_fewshot_tpu.episode import FlatBatch

    method = build("IfslPretrain", num_class=6,
                   inner_param={"inner_train_iter": 1})
    batch = make_batch()
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)
    rng = np.random.default_rng(0)
    fb = FlatBatch(
        data=jnp.asarray(rng.normal(size=(8,) + SPEC).astype(np.float32)),
        target=jnp.asarray(rng.integers(0, 6, size=8).astype(np.int32)),
    )
    loss, _ = method.loss(variables, fb, SETTING, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    seg_logits = method.forward(variables, batch, SETTING)
    assert seg_logits.shape == (2, 9, 3)
