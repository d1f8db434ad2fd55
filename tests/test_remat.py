"""Per-block rematerialization knob (``backbone.kwargs.remat``).

TPU-first memory lever with no reference counterpart: flax ``nn.remat``
around each TransformerBlock / SwinBlock stores only block boundaries on
the forward pass and recomputes internals during backward — O(depth) less
activation HBM for ~1 extra forward of FLOPs (measured on-chip: a
[1,96,144] swin_mini train step OOMs at 8 eps/chip without it, BASELINE.md
round-5 addendum).  Remat must be a pure scheduling change: parameters,
outputs, and gradients are identical.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audio_fewshot_tpu.episode import make_dense_episode_batch
from audio_fewshot_tpu.models import build_method, train_setting


def _config(backbone_name, bk_kwargs):
    return {
        "backbone": {"name": backbone_name, "kwargs": bk_kwargs},
        "classifier": {"name": "ProtoNet", "kwargs": None},
        "modality": "audio",
        "way_num": 3, "shot_num": 2, "query_num": 2,
        "augment_times": 1,
    }


def _loss_and_grads(config, batch, seed=0):
    method = build_method(config)
    setting = train_setting(config)
    variables = method.init_variables(jax.random.PRNGKey(seed), batch, setting)

    def loss_fn(params):
        loss, _ = method.loss(
            {**{k: v for k, v in variables.items() if k != "params"},
             "params": params},
            batch, setting, jax.random.PRNGKey(7),
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    return variables, float(loss), grads


def _assert_tree_allclose(a, b, rtol, atol):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for (path, la), lb in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def _check_backbone(name, kwargs, spec):
    rng = np.random.default_rng(0)
    sup = rng.normal(size=(2, 3 * 2) + spec).astype(np.float32)
    qry = rng.normal(size=(2, 3 * 2) + spec).astype(np.float32)
    batch = make_dense_episode_batch(sup, qry, 3, 2, 2)

    base = _config(name, dict(kwargs))
    remat = _config(name, dict(kwargs, remat=True))
    v0, loss0, g0 = _loss_and_grads(base, batch)
    v1, loss1, g1 = _loss_and_grads(remat, batch)

    # remat leaves the param tree untouched (same names, same init)
    t0 = jax.tree_util.tree_structure(v0["params"])
    t1 = jax.tree_util.tree_structure(v1["params"])
    assert t0 == t1
    _assert_tree_allclose(v0["params"], v1["params"], rtol=0, atol=0)

    # pure scheduling change: same loss, same gradients (fp noise only —
    # XLA may reassociate reductions across the recompute partition)
    assert np.isclose(loss0, loss1, rtol=1e-5, atol=1e-6), (loss0, loss1)
    _assert_tree_allclose(g0, g1, rtol=1e-4, atol=1e-5)


def test_vit_remat_matches():
    # fp32: in bf16 the mathematically-zero grads (e.g. attention key bias
    # — softmax is shift-invariant) are pure rounding noise, and remat's
    # different schedule rounds differently
    _check_backbone(
        "VisionTransformer",
        {"patch_size": 8, "embed_dim": 32, "depth": 2, "num_heads": 2,
         "mlp_ratio": 2.0, "num_channels": 1, "dtype": jnp.float32},
        spec=(1, 24, 32),
    )


def test_swin_remat_matches():
    _check_backbone(
        "swin_mini",
        {"window_size": 2, "num_channels": 1, "is_flatten": True,
         "dtype": jnp.float32},
        spec=(1, 24, 24),
    )
