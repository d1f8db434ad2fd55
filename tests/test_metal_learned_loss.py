"""MeTAL's learned task-adaptive loss must be LIVE, not dead code
(VERDICT r4 next-round #8: the zero-knockout e2e verifies only the shared
MAML machinery — this suite pins that the learned-loss surface itself does
something at non-zero weights).

Three independent kill-switch checks:
  1. outer gradients flow INTO meta_loss / meta_query_loss parameters
     (exact zero grads = the nets are disconnected from the objective);
  2. zeroing the learned-loss output layers measurably changes the adapted
     query logits (no effect = the inner loop ignores the nets);
  3. a few outer steps on separable episodes MOVE the learned-loss
     parameters (frozen params = the optimizer never sees them).

Reference surface: metal.py:150-184 (meta losses), :239-391 (per-step
LossAdapters — ours is a step-embedding-conditioned MLP, heads/metal.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_fewshot_tpu.episode import make_dense_episode_batch
from audio_fewshot_tpu.models import build_method, train_setting
from audio_fewshot_tpu.optim import build_optimizer

WAY, SHOT, QUERY = 3, 2, 3
SPEC = (1, 24, 30)


def _config():
    return {
        "backbone": {
            "name": "Conv64F",
            "kwargs": {"is_flatten": False, "last_pool": False,
                       "maxpool_last2": False, "num_channels": 1},
        },
        "classifier": {"name": "MeTAL", "kwargs": {
            "inner_param": {"lr": 0.01, "train_iter": 3, "test_iter": 3},
            "way_num": WAY,
        }},
        "modality": "audio",
        "precision": "fp32",
        "way_num": WAY, "shot_num": SHOT, "query_num": QUERY,
        "augment_times": 1,
        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3}},
    }


def _separable_batch(seed, episodes=2):
    """Class-separable synthetic episodes (class mean shifts)."""
    rng = np.random.default_rng(seed)
    means = rng.normal(0.0, 2.0, size=(WAY, 1, 1, 1))
    sup = np.stack([
        np.concatenate([
            rng.normal(means[w], 1.0, size=(SHOT,) + SPEC) for w in range(WAY)
        ]) for _ in range(episodes)
    ]).astype(np.float32)
    qry = np.stack([
        np.concatenate([
            rng.normal(means[w], 1.0, size=(QUERY,) + SPEC) for w in range(WAY)
        ]) for _ in range(episodes)
    ]).astype(np.float32)
    return make_dense_episode_batch(sup, qry, WAY, SHOT, QUERY)


def _setup():
    config = _config()
    method = build_method(config)
    setting = train_setting(config)
    batch = _separable_batch(0)
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    return config, method, setting, batch, variables


def test_outer_gradients_reach_learned_loss_params():
    _, method, setting, batch, variables = _setup()
    non_params = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        loss, _ = method.loss(
            {**non_params, "params": params}, batch, setting,
            jax.random.PRNGKey(1),
        )
        return loss

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    for name in ("meta_loss", "meta_query_loss"):
        leaves = jax.tree_util.tree_leaves(grads[name])
        assert leaves, name
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert np.isfinite(total) and total > 0.0, (
            f"{name} receives ZERO outer gradient — learned loss is dead code"
        )


def test_learned_loss_shapes_adaptation():
    _, method, setting, batch, variables = _setup()
    fwd = jax.jit(lambda v, b: method.forward(v, b, setting))
    live = np.asarray(jax.device_get(fwd(variables, batch)))

    # zero the output layers: the learned losses become constants, their
    # inner-loop gradients vanish, adaptation reduces to plain support CE
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    knocked = dict(params)
    for name in ("meta_loss", "meta_query_loss"):
        sub = jax.tree_util.tree_map(lambda x: x, params[name])
        sub["fc2"] = {
            "kernel": jnp.zeros_like(sub["fc2"]["kernel"]),
            "bias": jnp.zeros_like(sub["fc2"]["bias"]),
        }
        knocked[name] = sub
    ko = np.asarray(jax.device_get(
        fwd({**variables, "params": knocked}, batch)
    ))
    delta = float(np.max(np.abs(live - ko)))
    assert delta > 1e-5, (
        f"adapted logits identical with learned loss knocked out "
        f"(max delta {delta:.2e}) — the inner loop ignores the nets"
    )


def test_training_moves_learned_loss_params():
    config, method, setting, _, variables = _setup()
    optimizer = build_optimizer(config)
    opt_state = optimizer.init(variables["params"])
    lr_groups = optimizer.lr_tree(variables["params"], 1.0)
    init_ml = jax.device_get(variables["params"]["meta_loss"])

    @jax.jit
    def train_step(variables, opt_state, batch, rng):
        non_params = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params):
            return method.loss(
                {**non_params, "params": params}, batch, setting, rng
            )

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        params, new_opt = optimizer.apply(
            grads, opt_state, variables["params"], lr_groups
        )
        new_vars = {**non_params, "params": params}
        if out.updates:
            new_vars = method.merge_updates(new_vars, out.updates)
        return new_vars, new_opt, loss

    losses = []
    for i in range(4):
        variables, opt_state, loss = train_step(
            variables, opt_state, _separable_batch(i + 1),
            jax.random.PRNGKey(i),
        )
        losses.append(float(jax.device_get(loss)))
    assert all(np.isfinite(l) for l in losses), losses

    final_ml = jax.device_get(variables["params"]["meta_loss"])
    moved = sum(
        float(np.sum(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(init_ml),
            jax.tree_util.tree_leaves(final_ml),
        )
    )
    assert moved > 1e-6, "meta_loss parameters never moved during training"
