"""Meta-family batch 2: VERSA, LEO."""

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
    ("VERSA", {"sample_num": 4, "d_theta": 32}),
    ("LEO", {"hid_dim": 16,
             "inner_para": {"iter": 2, "lr": 0.5, "finetune_iter": 2,
                            "finetune_lr": 0.01},
             "kl_weight": 0.001, "encoder_penalty_weight": 1e-9,
             "orthogonality_penalty_weight": 1e-3}),
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
    # LEO freezes the backbone (reference no_grad) — check head grads only
    sub = {k: v for k, v in grads.items() if k != "emb_func"}
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(sub))
    assert np.isfinite(gnorm) and gnorm > 0.0, classifier
