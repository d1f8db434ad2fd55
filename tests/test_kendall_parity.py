"""Kendall-correlation parity against the torch reference oracle
(libfewshot_core/model/metric/meta_baseline_kendall.py:32-63): both the
differentiable sigmoid-smoothed form (train metric) and the exact sign
form (eval metric), on shared inputs, against our chunked-scan
implementation (models/heads/kendall.py)."""

import numpy as np
import pytest
import torch

from ref_loader import load_ref  # noqa: E402

from audio_fewshot_tpu.models.heads.kendall import kendall_logits

REF = load_ref("libfewshot_core.model.metric.meta_baseline_kendall")


@pytest.fixture()
def data():
    rng = np.random.default_rng(11)
    proto = rng.normal(size=(2, 5, 40)).astype(np.float32)   # [E, way, d]
    query = rng.normal(size=(2, 7, 40)).astype(np.float32)   # [E, G, d]
    return proto, query


def test_diffkendall_parity(data):
    proto, query = data
    ref = REF.diffkendall_for_batches(
        torch.from_numpy(proto), torch.from_numpy(query), beta=1, T=0.0125
    ).numpy()
    ours = np.asarray(kendall_logits(query, proto, beta=1.0,
                                     temperature=0.0125, exact=False))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_exact_kendall_parity(data):
    proto, query = data
    ref = REF.kendall_ranking_correlation_for_batches(
        torch.from_numpy(proto), torch.from_numpy(query)
    ).numpy()
    ours = np.asarray(kendall_logits(query, proto, exact=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)
