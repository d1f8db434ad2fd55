"""Loss-function parity against the torch reference oracle
(libfewshot_core/model/loss.py): L2DistLoss (mean per-sample Euclidean
norm, NaN→0), LabelSmoothCELoss, and DistillKLLoss (T²-scaled batch-mean
KL)."""

import numpy as np
import torch

from ref_loader import load_ref  # noqa: E402

from audio_fewshot_tpu.models.losses import (
    distill_kl_loss,
    l2_dist_loss,
    label_smooth_ce,
)

REF = load_ref("libfewshot_core.model.loss")


def test_l2_dist_loss_parity():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 13)).astype(np.float32)
    b = rng.normal(size=(6, 13)).astype(np.float32)
    ref = REF.L2DistLoss()(torch.from_numpy(a), torch.from_numpy(b)).item()
    ours = float(l2_dist_loss(a, b))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    # NaN guard (reference loss.py:13-15)
    a_nan = a.copy()
    a_nan[0, 0] = np.nan
    assert float(l2_dist_loss(a_nan, b)) == 0.0
    assert float(REF.L2DistLoss()(torch.from_numpy(a_nan), torch.from_numpy(b))) == 0.0


def test_label_smooth_ce_parity():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(9, 7)).astype(np.float32)
    y = rng.integers(0, 7, size=9)
    for s in (0.0, 0.1, 0.3):
        ref = REF.LabelSmoothCELoss(s)(
            torch.from_numpy(logits), torch.from_numpy(y)
        ).item()
        ours = float(label_smooth_ce(logits, y.astype(np.int32), smoothing=s))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, err_msg=f"s={s}")


def test_distill_kl_parity():
    rng = np.random.default_rng(2)
    y_s = rng.normal(size=(8, 11)).astype(np.float32)
    y_t = rng.normal(size=(8, 11)).astype(np.float32)
    for t in (1.0, 4.0):
        ref = REF.DistillKLLoss(t)(
            torch.from_numpy(y_s), torch.from_numpy(y_t)
        ).item()
        ours = float(distill_kl_loss(y_s, y_t, temperature=t))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, err_msg=f"T={t}")
