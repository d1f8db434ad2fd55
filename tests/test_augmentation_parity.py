"""Numerical parity of the deterministic TTA augmentations against the torch
reference oracle (/root/reference/libfewshot_core/audio_augmentations.py,
imported read-only via ref_loader).

The six deterministic augmentations (everything except the two random ones,
cutout + FilterAugment, which are covered by property tests in
test_augmentations.py) must agree on shared inputs — they drive the
energy-OOD TTA re-classification (reference test.py:398-410), so drift here
is accuracy drift.  Tolerance is loose only where our quantile is
bisection-based (error ≤ range/2²⁴) vs torch's exact ``torch.quantile``.
"""

import jax
import numpy as np
import pytest
import torch

from ref_loader import load_ref  # noqa: E402

import audio_fewshot_tpu.ops.audio_augmentations as ours

REF = load_ref("libfewshot_core.audio_augmentations")
KEY = jax.random.PRNGKey(0)  # deterministic augs ignore the key


@pytest.fixture()
def spec():
    rng = np.random.default_rng(7)
    # de-normalized log-mel-ish values, one [1, H, W] sample
    return (rng.normal(-15.0, 26.0, size=(1, 24, 31))).astype(np.float32)


CASES = [
    # loose: the suppression mask is sigmoid((|x|-thr)/(0.1·thr)) — the
    # 1/(0.1·thr) factor amplifies the bisection-quantile's 2⁻²⁴ range error
    ("background_noise_suppression",
     dict(noise_percentile=20, suppression_strength=0.5), 6e-3),
    ("temporal_median_background_subtraction", dict(percentile=10), 2e-4),
    ("spectral_contrast_enhancement",
     dict(contrast_factor=1.5, clip_percentile=95), 2e-4),
    ("foreground_energy_normalization", dict(top_k_percent=20), 2e-3),
    ("wiener_like_filtering",
     dict(noise_floor_percentile=15, gain_factor=2.0), 2e-3),
]


@pytest.mark.parametrize("name,kwargs,tol", CASES, ids=[c[0] for c in CASES])
def test_deterministic_aug_parity(spec, name, kwargs, tol):
    ref_fn = getattr(REF, name)
    our_fn = getattr(ours, name)
    ref_out = ref_fn(torch.from_numpy(spec), **kwargs).numpy()
    our_out = np.asarray(our_fn(KEY, spec, **{k: float(v) for k, v in kwargs.items()}))
    assert ref_out.shape == our_out.shape
    scale = np.abs(ref_out).max() + 1e-6
    np.testing.assert_allclose(our_out / scale, ref_out / scale, atol=tol,
                               err_msg=name)


def test_adaptive_noise_profile_matching_parity(spec):
    """The reference's temporal smoothing branch is BROKEN as snapshotted:
    it reflect-pads a [1,1,1,W] 4-D tensor with a 2-element pad
    (audio_augmentations.py:432-433), which torch rejects
    (NotImplementedError) whenever smoothing_window > 1 and W > window.
    Our op implements the intended same-size reflect+box smoothing
    (ops/audio_augmentations.py:146); the oracle comparison therefore runs
    at smoothing_window=1 (the only configuration the reference executes)."""
    with pytest.raises(NotImplementedError):
        REF.adaptive_noise_profile_matching(
            torch.from_numpy(spec), target_noise_level=0.1, smoothing_window=5)
    ref_out = REF.adaptive_noise_profile_matching(
        torch.from_numpy(spec), target_noise_level=0.1, smoothing_window=1
    ).numpy()
    our_out = np.asarray(ours.adaptive_noise_profile_matching(
        KEY, spec, target_noise_level=0.1, smoothing_window=1))
    scale = np.abs(ref_out).max() + 1e-6
    np.testing.assert_allclose(our_out / scale, ref_out / scale, atol=5e-3)


def test_denorm_renorm_roundtrip_parity(spec):
    """The dispatcher's de/re-normalization brackets (reference :531-605)."""
    mean, std = -15.1, 26.2
    ref_de = REF.denormalize_spectrogram(torch.from_numpy(spec), mean, std).numpy()
    np.testing.assert_allclose(spec * std + mean, ref_de, rtol=1e-6)
    ref_re = REF.normalize_spectrogram(torch.from_numpy(ref_de), mean, std).numpy()
    np.testing.assert_allclose(ref_re, spec, atol=1e-5)
