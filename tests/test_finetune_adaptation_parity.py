"""Behavioral pinning of the finetuning-family eval adaptation vs the torch
reference (VERDICT round 1, weak #5).

Exact numerical parity is impossible by construction — the reference's
``set_forward_adaptation`` (baseline.py:106-132) starts from a RANDOM torch
Linear init and shuffles minibatches each epoch, while ours is a
deterministic zero-init full-batch ``lax.scan`` at matched step count
(finetuning.py:107-156).  What can be pinned is behavior: on identical
episode features the two adapters must reach the same query accuracy (within
noise) across many episodes.  This is the test that would catch inner-loop
drift (wrong LR/momentum/weight-decay plumbing, wrong step count, wrong head
semantics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

WAY, SHOT, QUERY, D, EPISODES = 5, 5, 15, 64, 30
INNER_PARAM = {
    "inner_train_iter": 20,
    "inner_batch_size": 4,
    "inner_optim": {
        "name": "SGD",
        "kwargs": {"lr": 0.01, "momentum": 0.9, "weight_decay": 0.001},
    },
}


def _episodes(rng):
    """Moderately-separable Gaussian class clusters."""
    sup = np.empty((EPISODES, WAY * SHOT, D), np.float32)
    qry = np.empty((EPISODES, WAY * QUERY, D), np.float32)
    sup_y = np.tile(np.repeat(np.arange(WAY), SHOT)[None], (EPISODES, 1))
    qry_y = np.tile(np.repeat(np.arange(WAY), QUERY)[None], (EPISODES, 1))
    for e in range(EPISODES):
        means = rng.normal(size=(WAY, D)).astype(np.float32) * 1.1
        sup[e] = np.repeat(means, SHOT, 0) + rng.normal(
            size=(WAY * SHOT, D)
        ).astype(np.float32)
        qry[e] = np.repeat(means, QUERY, 0) + rng.normal(
            size=(WAY * QUERY, D)
        ).astype(np.float32)
    return sup, sup_y, qry, qry_y


def _ref_adapter(ref_cls):
    """Instantiate the reference method far enough to drive
    set_forward_adaptation (skipping the full AbstractModel setup)."""
    obj = ref_cls.__new__(ref_cls)
    torch.nn.Module.__init__(obj)
    obj.feat_dim = D
    obj.way_num = WAY
    obj.device = torch.device("cpu")
    obj.inner_param = INNER_PARAM
    obj.loss_func = torch.nn.CrossEntropyLoss()
    return obj


def _ref_accuracy(obj, sup, sup_y, qry, qry_y):
    torch.manual_seed(7)
    correct = total = 0
    with torch.enable_grad():
        for e in range(EPISODES):
            out = obj.set_forward_adaptation(
                torch.from_numpy(sup[e]),
                torch.from_numpy(sup_y[e]),
                torch.from_numpy(qry[e]),
            )
            pred = out.argmax(-1).numpy()
            correct += int((pred == qry_y[e]).sum())
            total += pred.size
    return 100.0 * correct / total


def _mine_accuracy(method, sup, sup_y, qry, qry_y):
    n_steps = method._adapt_steps(WAY * SHOT)
    logits = jax.vmap(
        lambda s, y, q: method._episode_head_logits(s, y, q, n_steps, way=WAY)
    )(jnp.asarray(sup), jnp.asarray(sup_y), jnp.asarray(qry))
    pred = np.asarray(jnp.argmax(logits, -1))
    return 100.0 * float((pred == qry_y).mean())


class _DummyEmb:  # never called — adaptation runs on pre-extracted features
    pass


@pytest.mark.parametrize("name", ["Baseline", "BaselinePlus"])
def test_adaptation_behavioral_parity(rng, name):
    ref_mod = load_ref(
        "libfewshot_core.model.finetuning."
        + {"Baseline": "baseline", "BaselinePlus": "baseline_plus"}[name]
    )
    import audio_fewshot_tpu.models.heads.finetuning as ft

    sup, sup_y, qry, qry_y = _episodes(rng)
    ref_acc = _ref_accuracy(
        _ref_adapter(getattr(ref_mod, name)), sup, sup_y, qry, qry_y
    )

    method = getattr(ft, name)(
        emb_func=_DummyEmb(), num_class=WAY, way_num=WAY,
        inner_param=INNER_PARAM,
    )
    mine_acc = _mine_accuracy(method, sup, sup_y, qry, qry_y)

    assert ref_acc > 75.0, f"oracle degenerate: {ref_acc}"
    assert mine_acc > 75.0, f"ours degenerate: {mine_acc}"
    assert abs(ref_acc - mine_acc) < 3.0, (
        f"{name} adaptation drift: reference {ref_acc:.2f} vs ours "
        f"{mine_acc:.2f} on identical episode features"
    )
