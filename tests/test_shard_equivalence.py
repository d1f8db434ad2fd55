"""Sharded-vs-single-device numerical equivalence (VERDICT round 1, item 4).

The reference's DDP all-reduces gradients across GPUs (trainer.py:504-509);
under pjit the same contraction is an XLA collective implied by the episode
axis sharding.  A wrong PartitionSpec would still *run* — these tests pin
that the 8-device mesh computes the same losses, the same parameter
trajectory, and the same eval logits as the 1-device mesh."""

import jax
import numpy as np
import pytest

from audio_fewshot_tpu.episode import make_dense_episode_batch
from audio_fewshot_tpu.models import build_method, train_setting
from audio_fewshot_tpu.optim import build_optimizer
from audio_fewshot_tpu.parallel.mesh import get_mesh, replicate, shard_batch


def _config():
    return {
        "backbone": {
            "name": "Conv64F",
            "kwargs": {"is_flatten": False, "last_pool": False,
                       "maxpool_last2": False, "num_channels": 1},
        },
        "classifier": {"name": "ProtoNet", "kwargs": None},
        "modality": "audio",
        "precision": "fp32",
        "way_num": 3, "shot_num": 2, "query_num": 2,
        "augment_times": 1,
        "optimizer": {"name": "SGD", "kwargs": {"lr": 0.05}},
    }


def _batches(n_steps, episodes=8, spec=(1, 24, 30)):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n_steps):
        sup = rng.normal(size=(episodes, 3 * 2) + spec).astype(np.float32)
        qry = rng.normal(size=(episodes, 3 * 2) + spec).astype(np.float32)
        out.append(make_dense_episode_batch(sup, qry, 3, 2, 2))
    return out


def _run(n_devices, batches, classifier=None, backbone=None):
    config = _config()
    if classifier is not None:
        config["classifier"] = classifier
    if backbone is not None:
        config["backbone"] = backbone
    method = build_method(config)
    setting = train_setting(config)
    optimizer = build_optimizer(config)
    mesh = get_mesh(n_devices)

    variables = method.init_variables(jax.random.PRNGKey(0), batches[0], setting)
    variables = jax.device_put(variables, replicate(mesh))
    opt_state = jax.device_put(optimizer.init(variables["params"]), replicate(mesh))
    lr_groups = optimizer.lr_tree(variables["params"], 1.0)

    def train_step(variables, opt_state, batch, lr_groups, step_rng):
        non_params = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params):
            return method.loss(
                {**non_params, "params": params}, batch, setting, step_rng
            )

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        params, opt_state = optimizer.apply(
            grads, opt_state, variables["params"], lr_groups
        )
        new_vars = {**non_params, "params": params}
        if out.updates:
            new_vars = method.merge_updates(new_vars, out.updates)
        return new_vars, opt_state, loss

    step = jax.jit(train_step)
    losses = []
    for i, batch in enumerate(batches):
        dev_batch = shard_batch(batch, mesh)
        variables, opt_state, loss = step(
            variables, opt_state, dev_batch, lr_groups, jax.random.PRNGKey(7)
        )
        losses.append(float(jax.device_get(loss)))

    fwd = jax.jit(lambda v, b: method.forward(v, b, setting))
    logits = np.asarray(jax.device_get(fwd(variables, shard_batch(batches[0], mesh))))
    params = jax.device_get(variables["params"])
    return losses, logits, params


def test_train_step_matches_across_mesh_sizes():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    batches = _batches(3)
    losses1, logits1, params1 = _run(1, batches)
    losses8, logits8, params8 = _run(8, batches)

    # losses are pre-update each step — tight tolerance catches a wrong
    # PartitionSpec (O(1) error) immediately
    np.testing.assert_allclose(losses1, losses8, rtol=1e-5, atol=1e-6)
    # after 3 SGD steps the only expected difference is collective
    # reduction-order fp noise (~1e-4 relative), amplified through BN stats
    np.testing.assert_allclose(logits1, logits8, rtol=1e-3, atol=1e-2)
    flat1 = jax.tree_util.tree_leaves(params1)
    flat8 = jax.tree_util.tree_leaves(params8)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        )


def test_eval_accuracy_matches_across_mesh_sizes():
    from audio_fewshot_tpu.utils.aggregate import majority_vote, vote_categorical_acc

    batches = _batches(1)
    _, logits1, _ = _run(1, batches)
    _, logits8, _ = _run(8, batches)
    b = batches[0]
    for logits in (logits1, logits8):
        pred = majority_vote(
            jax.numpy.asarray(logits), jax.numpy.asarray(b.query_clip),
            jax.numpy.asarray(b.query_mask), b.query_clip.shape[-1],
        )
        acc = vote_categorical_acc(jax.numpy.asarray(b.query_target), pred)
        assert np.isfinite(float(acc))
    np.testing.assert_array_equal(
        np.argmax(logits1, axis=-1), np.argmax(logits8, axis=-1)
    )


def test_maml_matches_across_mesh_sizes():
    """META-family on the mesh (VERDICT r4 next-round #4): MAML's
    ``lax.scan`` inner loop with second-order outer gradients and
    batch-stat BN, vmapped over a SHARDED episode axis.  Each episode
    adapts locally on its device (per-episode BN stats — no cross-episode
    reduction inside the inner loop), so 1-vs-8-device meshes must agree
    to collective-reduction fp noise.  Ref semantics: maml.py:125-161."""
    assert len(jax.devices()) >= 8
    maml = {"name": "MAML", "kwargs": {
        "inner_param": {"lr": 0.01, "train_iter": 2, "test_iter": 2},
        "way_num": 3,
    }}
    batches = _batches(3)
    losses1, logits1, params1 = _run(1, batches, classifier=maml)
    losses8, logits8, params8 = _run(8, batches, classifier=maml)

    np.testing.assert_allclose(losses1, losses8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(logits1, logits8, rtol=1e-3, atol=1e-2)
    np.testing.assert_array_equal(
        np.argmax(logits1, axis=-1), np.argmax(logits8, axis=-1)
    )
    flat1 = jax.tree_util.tree_leaves(params1)
    flat8 = jax.tree_util.tree_leaves(params8)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        )


def test_cpea_vit_matches_across_mesh_sizes():
    """Attention stack on the mesh: no transformer backbone had mesh
    evidence before round 5 (shard-equivalence covered Conv64F only).
    CPEANet's CPEALayer (ref cpea_net.py:81-133) over ViT token sequences
    (ref vit_class_aware.py) exercises patch-embedding conv, MHSA with
    learned cls/pos tokens, LayerNorms, and the L×L patch-similarity
    scorer under episode-axis sharding — shapes a wrong PartitionSpec
    could silently mis-tile (token axis vs episode axis)."""
    assert len(jax.devices()) >= 8
    vit = {"name": "VisionTransformer", "kwargs": {
        "patch_size": 8, "embed_dim": 32, "depth": 2, "num_heads": 2,
        "mlp_ratio": 2.0, "num_channels": 1,
    }}
    cpea = {"name": "CPEANet", "kwargs": {"in_dim": 32}}
    batches = _batches(3, spec=(1, 24, 32))
    losses1, logits1, params1 = _run(1, batches, classifier=cpea, backbone=vit)
    losses8, logits8, params8 = _run(8, batches, classifier=cpea, backbone=vit)

    np.testing.assert_allclose(losses1, losses8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(logits1, logits8, rtol=1e-3, atol=1e-2)
    np.testing.assert_array_equal(
        np.argmax(logits1, axis=-1), np.argmax(logits8, axis=-1)
    )
    flat1 = jax.tree_util.tree_leaves(params1)
    flat8 = jax.tree_util.tree_leaves(params8)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        )


def test_metal_per_step_matches_across_mesh_sizes():
    """MeTAL's faithful per-step path on the mesh: stacked per-step
    loss-net/adapter parameters gathered by the traced ``lax.scan`` step
    index, inside a vmapped second-order inner loop over a SHARDED episode
    axis (heads/metal.py PerStepLossNet/PerStepLossAdapter; reference
    metal.py:239-391).  A wrong PartitionSpec on the stacked step axis
    (or on the masked query-bucket reductions) would shift every inner
    gradient."""
    assert len(jax.devices()) >= 8
    metal = {"name": "MeTAL", "kwargs": {
        "inner_param": {"lr": 0.01, "train_iter": 2, "test_iter": 2,
                        "per_step_adapters": True},
        "way_num": 3,
    }}
    batches = _batches(2)
    losses1, logits1, params1 = _run(1, batches, classifier=metal)
    losses8, logits8, params8 = _run(8, batches, classifier=metal)

    np.testing.assert_allclose(losses1, losses8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(logits1, logits8, rtol=1e-3, atol=1e-2)
    np.testing.assert_array_equal(
        np.argmax(logits1, axis=-1), np.argmax(logits8, axis=-1)
    )
    flat1 = jax.tree_util.tree_leaves(params1)
    flat8 = jax.tree_util.tree_leaves(params8)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        )


def _renet_dual_batches(n_steps, episodes=8):
    from audio_fewshot_tpu.episode import DualBatch, FlatBatch

    rng = np.random.default_rng(1)
    spec = (1, 24, 30)
    out = []
    for _ in range(n_steps):
        sup = rng.normal(size=(episodes, 3 * 2) + spec).astype(np.float32)
        qry = rng.normal(size=(episodes, 3 * 2) + spec).astype(np.float32)
        gt = rng.integers(0, 6, size=(episodes, 3 * 4)).astype(np.int32)
        ep = make_dense_episode_batch(sup, qry, 3, 2, 2, global_target=gt)
        flat = FlatBatch(
            data=rng.normal(size=(16,) + spec).astype(np.float32),
            target=rng.integers(0, 6, size=(16,)).astype(np.int32),
        )
        out.append(DualBatch(episode=ep, flat=flat))
    return out


def _run_renet(n_devices, batches):
    config = _config()
    config["classifier"] = {"name": "RENet",
                            "kwargs": {"feat_dim": 64, "num_class": 6}}
    method = build_method(config)
    setting = train_setting(config)
    optimizer = build_optimizer(config)
    mesh = get_mesh(n_devices)

    init_batch = batches[0].episode
    variables = method.init_variables(jax.random.PRNGKey(0), init_batch, setting)
    variables = jax.device_put(variables, replicate(mesh))
    opt_state = jax.device_put(optimizer.init(variables["params"]), replicate(mesh))
    lr_groups = optimizer.lr_tree(variables["params"], 1.0)

    def train_step(variables, opt_state, batch, lr_groups, step_rng):
        non_params = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params):
            return method.loss(
                {**non_params, "params": params}, batch, setting, step_rng
            )

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        params, opt_state = optimizer.apply(
            grads, opt_state, variables["params"], lr_groups
        )
        new_vars = {**non_params, "params": params}
        if out.updates:
            new_vars = method.merge_updates(new_vars, out.updates)
        return new_vars, opt_state, loss

    step = jax.jit(train_step)
    losses = []
    for batch in batches:
        dev_batch = shard_batch(batch, mesh)
        variables, opt_state, loss = step(
            variables, opt_state, dev_batch, lr_groups, jax.random.PRNGKey(7)
        )
        losses.append(float(jax.device_get(loss)))
    return losses


def test_renet_dual_loader_matches_across_mesh_sizes():
    """The dual-loader (dataloader_num 2) step — episodic + flat companion
    both sharded, masked batch-stat BNs inside the CCA — must compute the
    same losses on the 8-device mesh as on 1 device (GSPMD turns the BN
    batch reductions into global collectives; a per-shard reduction would
    diverge O(1))."""
    assert len(jax.devices()) >= 8
    batches = _renet_dual_batches(2)
    losses1 = _run_renet(1, batches)
    losses8 = _run_renet(8, batches)
    np.testing.assert_allclose(losses1, losses8, rtol=2e-4, atol=1e-5)
