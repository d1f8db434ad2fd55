"""Vertical-slice test: Conv64F backbone + ProtoNet on a synthetic episode
batch — loss decreases trainability is covered by the trainer tests; here we
check shapes, determinism, and vote-eval plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.episode import make_dense_episode_batch, pack_ragged_episode_batch
from audio_fewshot_tpu.models import build_method, train_setting
from audio_fewshot_tpu.models.base import EpisodeSetting

SPEC = (1, 32, 40)  # small [C, F, T] for CPU test speed


def tiny_config():
    return {
        "backbone": {
            "name": "Conv64F",
            "kwargs": {
                "is_flatten": False,
                "last_pool": False,
                "maxpool_last2": True,
                "num_channels": 1,
            },
        },
        "classifier": {"name": "ProtoNet", "kwargs": None},
        "modality": "audio",
        "way_num": 3,
        "shot_num": 2,
        "query_num": 4,
        "precision": "fp32",
    }


def make_batch(rng, e=2, way=3, shot=2, query=4):
    sup = rng.normal(size=(e, way * shot) + SPEC).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + SPEC).astype(np.float32)
    return make_dense_episode_batch(sup, qry, way, shot, query)


def test_proto_loss_and_shapes(rng):
    config = tiny_config()
    method = build_method(config)
    setting = train_setting(config)
    batch = make_batch(rng)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)

    assert "emb_func" in variables["params"]
    loss, out = method.loss(variables, batch, setting, jax.random.PRNGKey(1))
    assert out.seg_logits.shape == (2, 12, 3)
    assert np.isfinite(float(loss))
    # CE at random init: bounded (euclid logits have non-trivial spread, so
    # exact log(way) is not expected — just sanity-bound it)
    assert 0.0 < float(loss) < 20.0


def test_proto_forward_ragged_eval(rng):
    config = tiny_config()
    method = build_method(config)
    setting = EpisodeSetting(way=3, shot=2, query=2)
    e, way, shot, query = 2, 3, 2, 2
    repeats = rng.integers(1, 4, size=e * way * query)
    sup = rng.normal(size=(e, way * shot) + SPEC).astype(np.float32)
    segs = rng.normal(size=(int(repeats.sum()),) + SPEC).astype(np.float32)
    batch = pack_ragged_episode_batch(sup, segs, repeats, way, shot, query)

    dense = make_batch(rng, e=e, way=way, shot=shot, query=query)
    variables = method.init_variables(jax.random.PRNGKey(0), dense, setting)
    seg_logits = method.forward(variables, batch, setting)
    assert seg_logits.shape == (e, batch.query.shape[1], way)
    accs = method.eval_episode_accuracy(seg_logits, batch)
    assert accs.shape == (e,)
    assert np.all(np.asarray(accs) >= 0) and np.all(np.asarray(accs) <= 100)


def test_proto_train_step_learns(rng):
    """A few SGD steps on a separable synthetic problem should push loss down."""
    import optax

    config = tiny_config()
    method = build_method(config)
    setting = train_setting(config)

    # class-dependent mean offsets → separable
    def batch_fn(seed):
        r = np.random.default_rng(seed)
        way, shot, query = 3, 2, 4
        sup = r.normal(size=(1, way * shot) + SPEC).astype(np.float32)
        qry = r.normal(size=(1, way * query) + SPEC).astype(np.float32)
        for w in range(way):
            sup[:, w * shot : (w + 1) * shot] += 2.0 * w
            qry[:, w * query : (w + 1) * query] += 2.0 * w
        return make_dense_episode_batch(sup, qry, way, shot, query)

    variables = method.init_variables(jax.random.PRNGKey(0), batch_fn(0), setting)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, rest, opt_state, batch, key):
        def loss_fn(p):
            v = dict(rest, params=p)
            loss, out = method.loss(v, batch, setting, key)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, out

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    losses = []
    for i in range(8):
        params, opt_state, loss, out = step(
            params, rest, opt_state, batch_fn(i % 3), jax.random.PRNGKey(i)
        )
        rest = method.merge_updates(rest, out.updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
