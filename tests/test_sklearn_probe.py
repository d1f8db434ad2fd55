"""sklearn oracle for the finetuning eval adaptation (VERDICT round 2, #7).

The reference evaluates RFS / SKD / DeepBDC_Pretrain(stl) by fitting an
sklearn ``LogisticRegression(penalty="l2", solver="lbfgs", max_iter=1000,
multi_class="multinomial")`` on L2-normalized support features and
predicting the query (rfs_model.py:166-189, skd_model.py:199-212,
deepbdc_pretrain.py:215-228 with C=penalty_C).  sklearn is installed, so we
pin our L-BFGS probe (finetuning.sklearn_probe_logits) against the real
thing on shared features: the objective is strictly convex, so converged
solutions must agree almost exactly — prediction-level, not just accuracy.
"""

import numpy as np
import pytest

sklearn_lm = pytest.importorskip("sklearn.linear_model")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audio_fewshot_tpu.models.heads.finetuning import (  # noqa: E402
    sklearn_probe_logits,
)

WAY, SHOT, QUERY, D, EPISODES = 5, 5, 15, 64, 12


def _episodes(rng):
    sup = np.empty((EPISODES, WAY * SHOT, D), np.float32)
    qry = np.empty((EPISODES, WAY * QUERY, D), np.float32)
    sup_y = np.tile(np.repeat(np.arange(WAY), SHOT)[None], (EPISODES, 1))
    qry_y = np.tile(np.repeat(np.arange(WAY), QUERY)[None], (EPISODES, 1))
    for e in range(EPISODES):
        means = rng.normal(size=(WAY, D)).astype(np.float32) * 1.0
        sup[e] = np.repeat(means, SHOT, 0) + rng.normal(
            size=(WAY * SHOT, D)).astype(np.float32)
        qry[e] = np.repeat(means, QUERY, 0) + rng.normal(
            size=(WAY * QUERY, D)).astype(np.float32)
    return sup, sup_y, qry, qry_y


def _l2(x):
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


@pytest.mark.parametrize("C", [0.1, 1.0])
def test_probe_matches_sklearn(rng, C):
    sup, sup_y, qry, qry_y = _episodes(rng)

    # ours: vmapped jitted probe over all episodes at once
    probe = jax.jit(jax.vmap(
        lambda s, y, q: sklearn_probe_logits(s, y, q, WAY, C=C)
    ))
    sup_n = _l2(sup)
    qry_n = _l2(qry)
    logits = np.asarray(probe(jnp.asarray(sup_n), jnp.asarray(sup_y),
                              jnp.asarray(qry_n)))
    mine_pred = logits.argmax(-1)

    agree = correct_mine = correct_ref = total = 0
    for e in range(EPISODES):
        clf = sklearn_lm.LogisticRegression(
            random_state=0, solver="lbfgs", C=C, max_iter=1000,
            penalty="l2")
        clf.fit(sup_n[e], sup_y[e])
        ref_pred = clf.predict(qry_n[e])
        agree += int((ref_pred == mine_pred[e]).sum())
        correct_mine += int((mine_pred[e] == qry_y[e]).sum())
        correct_ref += int((ref_pred == qry_y[e]).sum())
        total += ref_pred.size

    agree_pct = 100.0 * agree / total
    acc_mine = 100.0 * correct_mine / total
    acc_ref = 100.0 * correct_ref / total
    assert acc_ref > 60.0, f"oracle degenerate: {acc_ref}"
    assert agree_pct >= 99.0, (
        f"prediction agreement {agree_pct:.2f}% (ours {acc_mine:.2f} vs "
        f"sklearn {acc_ref:.2f})")
    assert abs(acc_mine - acc_ref) <= 0.5


def test_probe_matches_sklearn_decision_values(rng):
    """Beyond predictions: converged logits must match sklearn's decision
    function up to the multinomial gauge (softmax is shift-invariant per
    sample; the L2 penalty pins sklearn's W to zero row-mean, ours too by
    symmetry of the zero init — compare centered logits directly)."""
    sup, sup_y, qry, _ = _episodes(rng)
    e = 0
    sup_n, qry_n = _l2(sup[e]), _l2(qry[e])
    C = 1.0
    logits = np.asarray(
        sklearn_probe_logits(jnp.asarray(sup_n), jnp.asarray(sup_y[e]),
                             jnp.asarray(qry_n), WAY, C=C))
    clf = sklearn_lm.LogisticRegression(
        random_state=0, solver="lbfgs", C=C, max_iter=1000, penalty="l2")
    clf.fit(sup_n, sup_y[e])
    ref = clf.decision_function(qry_n)
    mine_c = logits - logits.mean(-1, keepdims=True)
    ref_c = ref - ref.mean(-1, keepdims=True)
    np.testing.assert_allclose(mine_c, ref_c, atol=2e-3, rtol=0)
