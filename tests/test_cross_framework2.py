"""Trained-weight cross-framework e2e parity — META inner-loop family.

Extends tests/test_cross_framework.py (17 methods) to the MAML family:
models TRAINED here, weights inverse-converted into the torch reference,
and the reference's full ``set_forward`` — including its fast-weight inner
SGD (maml.py:125-161, anil.py:123-150, boil.py:126-158) and the ragged
majority-vote epilogue — driven over identical episodes.  The inner-loop
oracle (tests/test_maml_oracle.py) pins the adaptation math at init; these
pin the whole trained eval path, accuracy within 0.5 pts.
"""

import numpy as np
import pytest

from test_cross_framework import _cross_check, _train_ours, cfp

# Conv64F is_flatten engages the 1600-d projection whose input width the
# reference hard-codes to 64 (conv_four.py:87-92) — matched by (1,32,30)
# with maxpool_last2 off
BK_KWARGS = {"is_flatten": True, "last_pool": True, "maxpool_last2": False,
             "num_channels": 1}
FEAT_DIM = 1600


@pytest.mark.slow
def test_e2e_maml_trained_parity(tmp_path):
    """Trained MAML/Conv64F: full-model fast-weight SGD (3 test steps,
    2nd-order machinery live in the reference even at eval).  Inner-loop
    drift compounds over steps — rel tolerance 1e-2, prediction agreement
    0.99 (vs 0.999 for closed-form heads)."""
    trainer, config = _train_ours(
        tmp_path, "MAML", "Conv64F", dict(BK_KWARGS),
        {"inner_param": {"lr": 0.01, "train_iter": 2, "test_iter": 3},
         "feat_dim": FEAT_DIM},
        epochs=1, train_episode=6,
    )
    row = _cross_check(
        trainer, config, n_batches=8, atol=1e-2,
        head_inverter=cfp.invert_maml_head_params,
        ref_runner=cfp.run_reference_eval_inner_loop,
        agree_min=0.99,
    )
    assert row["episodes"] == 16


@pytest.mark.slow
def test_e2e_anil_trained_parity(tmp_path):
    """Trained ANIL/Conv64F: head-only inner SGD over frozen features
    (anil.py:65 converts only the classifier); the runner re-asserts eval
    mode per batch because the reference's adaptation leaks train mode
    into the next batch's UNconverted emb_func BNs."""
    trainer, config = _train_ours(
        tmp_path, "ANIL", "Conv64F", dict(BK_KWARGS),
        {"inner_param": {"lr": 0.01, "train_iter": 2, "test_iter": 3},
         "feat_dim": FEAT_DIM},
        epochs=1, train_episode=6,
    )
    _cross_check(
        trainer, config, n_batches=8, atol=5e-3,
        head_inverter=cfp.invert_maml_head_params,
        ref_runner=cfp.run_reference_eval_inner_loop,
        agree_min=0.99,
    )


@pytest.mark.slow
def test_e2e_boil_trained_parity(tmp_path):
    """Trained BOIL/Conv64F under the shipped recipe: one inner step,
    ``Once_update`` eval (boil.py:77-81); equal extractor/classifier LRs —
    the regime where the reference's '"Linear" in name' LR keying
    (boil.py:170) and our submodule keying coincide (see
    test_maml_oracle.py)."""
    trainer, config = _train_ours(
        tmp_path, "BOIL", "Conv64F", dict(BK_KWARGS),
        {"inner_param": {"extractor_lr": 0.01, "classifier_lr": 0.01},
         "feat_dim": FEAT_DIM, "testing_method": "Once_update"},
        epochs=1, train_episode=6,
    )
    _cross_check(
        trainer, config, n_batches=8, atol=1e-2,
        head_inverter=cfp.invert_maml_head_params,
        ref_runner=cfp.run_reference_eval_inner_loop,
        agree_min=0.99,
    )
