"""R2D2MCL torch-oracle parity (VERDICT r3 weak #2): the round-3 rewrite
(heads/r2d2.py R2D2MCL + heads/mcl.katz_query_mask) against the reference
MCLMask (libfewshot_core/model/metric/mcl.py:82-125) and the full
mask→pool→ridge pipeline of r2d2_mcl.py set_forward_loss (:176-204).

Same contract as test_torch_parity*.py: shared random inputs, identical
weights, fp32 agreement."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _np(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


KATZ, GAMMA, GAMMA2 = 0.5, 20.0, 10.0  # every shipped reproduce YAML


def test_mcl_mask_parity(rng):
    """katz_query_mask vs reference MCLMask.forward (mcl.py:82-125): the
    query nodes' Katz centrality normalized over spatial positions."""
    ref_mod = load_ref("libfewshot_core.model.metric.mcl")
    from audio_fewshot_tpu.models.heads.mcl import katz_query_mask

    b, way, shot, q, c, h, w = 2, 3, 2, 4, 8, 3, 3
    sup = rng.normal(size=(b, way * shot, c, h, w)).astype(np.float32)
    qry = rng.normal(size=(b, q, c, h, w)).astype(np.float32)

    mask_mod = ref_mod.MCLMask(KATZ, GAMMA, GAMMA2)
    with torch.no_grad():
        ref_mask = mask_mod(_t(sup), _t(qry), way, shot)  # [b, q, 1, h, w]

    mine = katz_query_mask(
        jnp.asarray(qry), jnp.asarray(sup), way, shot, KATZ, GAMMA, GAMMA2
    )  # [b, q, h*w]
    np.testing.assert_allclose(
        _np(ref_mask).reshape(b, q, h * w), np.asarray(mine), atol=1e-5
    )


def test_r2d2mcl_pipeline_parity(rng):
    """The full R2D2MCL head on shared features: MCLMask-weighted query
    pooling + GAP'd supports through the dual-form ridge (r2d2_mcl.py
    set_forward_loss :176-204, R2D2Layer :86-131) vs our R2D2MCL._logits
    composition (katz mask → einsum pool → ridge_logits)."""
    ref_mcl = load_ref("libfewshot_core.model.metric.mcl")
    ref_r2d2mcl = load_ref("libfewshot_core.model.meta.r2d2_mcl")
    from audio_fewshot_tpu.models.heads.mcl import katz_query_mask
    from audio_fewshot_tpu.models.heads.r2d2 import ridge_logits

    e, way, shot, q, c, h, w = 2, 3, 2, 5, 8, 3, 3
    alpha, beta, gamma_ridge = 1.3, -0.2, 42.0
    sup = rng.normal(size=(e, way * shot, c, h, w)).astype(np.float32)
    qry = rng.normal(size=(e, q, c, h, w)).astype(np.float32)
    # mode-2 split emits way-major support targets [0..way) repeated shot
    sup_target = np.tile(np.repeat(np.arange(way), shot)[None], (e, 1))

    # --- reference: MCLMask + pooling + R2D2Layer exactly as set_forward
    mask_mod = ref_mcl.MCLMask(KATZ, GAMMA, GAMMA2)
    layer = ref_r2d2mcl.R2D2Layer()
    with torch.no_grad():
        layer.alpha.copy_(torch.tensor([alpha]))
        layer.beta.copy_(torch.tensor([beta]))
        layer.gamma.copy_(torch.tensor([gamma_ridge]))
        t_sup, t_qry = _t(sup), _t(qry)
        query_mel = mask_mod(t_sup, t_qry, way, shot)
        q_feat = (t_qry * query_mel).view(e, q, c, h * w).sum(-1)
        s_feat = torch.nn.functional.adaptive_avg_pool2d(
            t_sup.view(-1, c, h, w), 1
        ).view(e, way * shot, c)
        ref_logits, _ = layer(way, shot, q_feat, s_feat, _t(sup_target))

    # --- ours: the same composition as R2D2MCL._logits (heads/r2d2.py)
    mask = katz_query_mask(
        jnp.asarray(qry), jnp.asarray(sup), way, shot, KATZ, GAMMA, GAMMA2
    )
    qry_vec = jnp.einsum(
        "egcx,egx->egc", jnp.asarray(qry).reshape(e, q, c, h * w), mask
    )
    sup_vec = jnp.asarray(sup).mean(axis=(-2, -1))
    onehot = jax.nn.one_hot(jnp.asarray(sup_target), way, dtype=jnp.float32)
    mine = ridge_logits(
        qry_vec, sup_vec, onehot,
        jnp.float32(alpha), jnp.float32(beta), jnp.float32(gamma_ridge),
    )
    np.testing.assert_allclose(_np(ref_logits), np.asarray(mine), atol=1e-4)


def test_r2d2mcl_head_matches_manual_composition(rng):
    """The registered R2D2MCL head's forward reproduces the manual
    mask→pool→ridge composition on its own embedded features (wiring
    guard: the head really consumes feature maps + the learned scalars)."""
    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.models import build_method
    from audio_fewshot_tpu.models.base import EpisodeSetting
    from audio_fewshot_tpu.models.heads.mcl import katz_query_mask
    from audio_fewshot_tpu.models.heads.r2d2 import ridge_logits

    way, shot, query = 3, 2, 3
    setting = EpisodeSetting(way=way, shot=shot, query=query)
    spec = (1, 32, 24)
    sup = rng.normal(size=(2, way * shot) + spec).astype(np.float32)
    qry = rng.normal(size=(2, way * query) + spec).astype(np.float32)
    batch = make_dense_episode_batch(sup, qry, way, shot, query)

    method = build_method({
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1, "use_running_statistics": False}},
        "classifier": {"name": "R2D2MCL", "kwargs": {
            "katz_factor": KATZ, "gamma": GAMMA, "gamma2": GAMMA2}},
        "modality": "audio", "way_num": way, "shot_num": shot,
        "query_num": query, "precision": "fp32",
    })
    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    logits = method.forward(variables, batch, setting)

    sup_f, qry_f, _ = method.embed(variables, batch, train=False)
    e, g, c, h, w = qry_f.shape
    (a, b_, g_), _ = method.apply_module(variables, "head")
    mask = katz_query_mask(qry_f, sup_f, way, shot, KATZ, GAMMA, GAMMA2)
    qv = jnp.einsum("egcx,egx->egc", qry_f.reshape(e, g, c, h * w), mask)
    sv = sup_f.mean(axis=(-2, -1))
    onehot = jax.nn.one_hot(batch.support_target, way, dtype=sup_f.dtype)
    manual = ridge_logits(qv, sv, onehot, a, b_, g_)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(manual), atol=1e-5
    )
