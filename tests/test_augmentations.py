"""TTA augmentation op tests + the energy-OOD TTA eval path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.ops import audio_augmentations as aug

SPEC = (1, 24, 32)


@pytest.fixture
def spec(rng):
    return jnp.asarray(rng.normal(size=SPEC).astype(np.float32))


def test_cutout_masks_region(spec):
    out = aug.random_cutout(jax.random.PRNGKey(0), spec, num_cutouts=1,
                            cutout_size_ratio=(0.3, 0.3), fill_value=0.0)
    zeros = int(np.sum(np.asarray(out) == 0.0))
    h, w = SPEC[1], SPEC[2]
    expect = int(h * 0.3) * int(w * 0.3)
    assert zeros >= expect  # at least the rectangle (plus chance zeros)
    assert out.shape == spec.shape


def test_noise_suppression_shrinks_low_energy(spec):
    out = aug.background_noise_suppression(jax.random.PRNGKey(0), spec,
                                           noise_percentile=50.0,
                                           suppression_strength=1.0)
    a = np.abs(np.asarray(spec))
    oa = np.abs(np.asarray(out))
    low = a < np.quantile(a, 0.2)
    high = a > np.quantile(a, 0.9)
    assert oa[low].mean() < a[low].mean() * 0.6
    assert oa[high].mean() > a[high].mean() * 0.9


def test_background_subtraction_nonnegative(spec):
    out = aug.temporal_median_background_subtraction(None, spec, percentile=10.0)
    assert float(np.min(np.asarray(out))) >= 0.0


def test_contrast_enhancement_spreads(spec):
    out = aug.spectral_contrast_enhancement(None, spec, contrast_factor=2.0,
                                            clip_percentile=100.0)
    assert float(jnp.std(out)) > float(jnp.std(spec)) * 1.5


def test_foreground_norm_stats(spec):
    out = aug.foreground_energy_normalization(None, spec, top_k_percent=20.0)
    a = np.asarray(out)
    # foreground bins should be ~standardized (mean≈0 over the top-k set)
    assert np.isfinite(a).all()


def test_wiener_gain_monotone(spec):
    out = aug.wiener_like_filtering(None, spec, gain_factor=1.0)
    # gain < 1 everywhere → magnitudes shrink
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(spec)) + 1e-6)


def test_linear_filter_scales_rows(spec):
    out = aug.apply_linear_filteraugment(jax.random.PRNGKey(3), spec,
                                         num_points=4, filter_strength=0.5)
    s = np.asarray(spec)[0]
    o = np.asarray(out)[0]
    # each frequency row scaled by one value in [0.5, 1.5]: recover the
    # per-row scale by least squares (robust to near-zero entries)
    row_ratio = (o * s).sum(axis=1) / (s * s).sum(axis=1)
    recon = row_ratio[:, None] * s
    np.testing.assert_allclose(o, recon, atol=1e-5)
    assert row_ratio.min() >= 0.5 - 1e-4 and row_ratio.max() <= 1.5 + 1e-4


def test_dispatcher_denorm_renorm_roundtrip(spec):
    """With an identity augmentation path (cutout with 0-size impossible →
    use noise_matching with neutral params), de/re-norm must round-trip;
    test via wiener with gain_factor s.t. gain<=1 and comparing norms."""
    out = aug.augment_spectrogram(jax.random.PRNGKey(0), spec, 2.0, 3.0,
                                  augmentation_type="background_subtraction")
    assert out.shape == spec.shape
    assert np.isfinite(np.asarray(out)).all()


def test_random_dispatch_jits():
    f = jax.jit(lambda k, s: aug.augment_spectrogram(k, s, 0.0, 1.0, "random"))
    s = jnp.ones(SPEC)
    outs = [np.asarray(f(jax.random.PRNGKey(i), s)) for i in range(6)]
    assert all(o.shape == SPEC for o in outs)


def test_batch_augment_shapes(spec):
    batch = jnp.stack([spec, spec * 2.0])
    out = aug.batch_augment_spectrogram(jax.random.PRNGKey(0), batch, 0.0, 1.0,
                                        num_augmentations=3,
                                        augmentation_type="noise_suppression")
    assert out.shape == (6,) + SPEC


@pytest.mark.slow
def test_energy_tta_eval_path(tmp_path):
    """Full Test harness with enhance_classification_via_energy on DeepBDC."""
    from audio_fewshot_tpu.eval import Test

    config = {
        "data_root": "synthetic:8:10",
        "spec_shape": (1, 32, 24),
        "modality": "audio",
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "way_num": 3, "shot_num": 2, "query_num": 3,
        "test_way": 3, "test_shot": 2, "test_query": 3,
        "episode_size": 2, "train_episode": 4, "test_episode": 4,
        "test_epoch": 1, "seed": 0, "precision": "fp32",
        "prefetch": 0, "max_segments_per_clip": 2,
        "enhance_classification_via_energy": True,
        "num_augmentations": 4,
    }
    test = Test(0, config, result_path=None)
    mean, ci = test.test_loop()
    assert np.isfinite(mean) and mean > 0.0


def test_energy_tta_eval_path_with_bpa(tmp_path):
    """use_bpa + energy TTA used to crash at trace time: BPA features live
    in the affinity space of their own [support ‖ query] set (width ws+G),
    so the raw-dim augmented embeddings could not score against the
    transformed support — the TTA path now re-applies the transform
    jointly over (raw support, augmented segments) per flagged clip."""
    from audio_fewshot_tpu.eval import Test

    config = {
        "data_root": "synthetic:8:10",
        "spec_shape": (1, 32, 24),
        "modality": "audio",
        "backbone": {"name": "Conv64F", "kwargs": {
            "is_flatten": False, "last_pool": False, "maxpool_last2": False,
            "num_channels": 1}},
        "classifier": {"name": "DeepBDC", "kwargs": {"use_bpa": True}},
        "way_num": 3, "shot_num": 2, "query_num": 3,
        "test_way": 3, "test_shot": 2, "test_query": 3,
        "episode_size": 2, "train_episode": 4, "test_episode": 4,
        "test_epoch": 1, "seed": 0, "precision": "fp32",
        "prefetch": 0, "max_segments_per_clip": 2,
        "enhance_classification_via_energy": True,
        "num_augmentations": 4,
    }
    test = Test(0, config, result_path=None)
    mean, ci = test.test_loop()
    assert np.isfinite(mean) and mean > 0.0


def test_noise_matching_zero_floor_is_identity():
    """When the estimated noise floor is ~0 the reference leaves the
    spectrogram unchanged (scale=1.0, reference audio_augmentations.py:
    437-442) — the old clipped 0.1/1e-8 ratio DOUBLED every background
    bin instead."""
    import jax
    from audio_fewshot_tpu.ops.audio_augmentations import (
        adaptive_noise_profile_matching,
    )

    rng = np.random.default_rng(0)
    spec = np.abs(rng.normal(1.0, 0.3, size=(1, 16, 12))).astype(np.float32)
    spec[:, 3, :] = 0.0  # one silent frequency row → per-frame min = 0
    out = adaptive_noise_profile_matching(
        jax.random.PRNGKey(0), jnp.asarray(spec), smoothing_window=1
    )
    np.testing.assert_allclose(np.asarray(out), spec, atol=1e-6)
