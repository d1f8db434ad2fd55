"""Third metric-head batch: MCL, MetaBaselineKendall(+pretrain), ATLNet."""

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
    ("MCL", {"katz_factor": 0.5, "gamma": 20.0, "gamma2": 10.0}),
    ("MetaBaselineKendall", {}),
    ("ATLNet", {"feat_dim": 64}),
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


def test_mcl_probabilities_sum_to_one():
    from audio_fewshot_tpu.models.heads.mcl import mcl_logits

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 4, 8, 3, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(1, 6, 8, 3, 3)).astype(np.float32))
    probs = np.asarray(mcl_logits(q, s, way=3, shot=2))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    assert (probs >= 0).all()


def test_kendall_exact_matches_scipy():
    """Exact Kendall logits equal scipy's kendalltau (tau-a) on small dims."""
    from audio_fewshot_tpu.models.heads.kendall import kendall_logits

    rng = np.random.default_rng(0)
    d = 12
    q = rng.normal(size=(1, 3, d)).astype(np.float32)
    p = rng.normal(size=(1, 2, d)).astype(np.float32)
    out = np.asarray(kendall_logits(jnp.asarray(q), jnp.asarray(p), exact=True))

    from scipy.stats import kendalltau

    for g in range(3):
        for w in range(2):
            tau = kendalltau(q[0, g], p[0, w]).statistic
            np.testing.assert_allclose(out[0, g, w], tau, atol=1e-5)


def test_diffkendall_approaches_exact_at_high_beta():
    from audio_fewshot_tpu.models.heads.kendall import kendall_logits

    rng = np.random.default_rng(1)
    d = 10
    q = jnp.asarray(rng.normal(size=(1, 2, d)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(1, 2, d)).astype(np.float32))
    exact = np.asarray(kendall_logits(q, p, exact=True))
    smooth = np.asarray(kendall_logits(q, p, beta=200.0, temperature=1.0))
    np.testing.assert_allclose(smooth, exact, atol=5e-2)


def test_kendall_pretrain():
    method = build("MetabaselineKendallPretrain",
                   num_class=6, inner_param={"inner_train_iter": 1})
    batch = make_batch()
    variables = method.init_variables(jax.random.PRNGKey(0), batch, SETTING)
    seg_logits = method.forward(variables, batch, SETTING)
    assert seg_logits.shape == (2, 9, 3)
