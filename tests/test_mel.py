"""Log-mel frontend tests."""

import jax.numpy as jnp
import numpy as np

from audio_fewshot_tpu.ops.mel import log_mel_spectrogram, mel_filterbank


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(64, 1024, 22050)
    assert fb.shape == (513, 64)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=0) > 0).all()


def test_log_mel_shapes_and_tone():
    sr, n_fft, hop = 22050, 1024, 512
    t = np.arange(sr * 2) / sr
    freq = 1000.0
    wave = np.sin(2 * np.pi * freq * t).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(
        jnp.asarray(wave[None]), num_mels=64, n_fft=n_fft, hop=hop,
        sample_rate=sr,
    ))
    n_frames = 1 + (len(wave) - n_fft) // hop
    assert mel.shape == (1, 64, n_frames)
    # the 1 kHz tone's mel bin dominates and is stable across frames
    peak_bins = mel[0].argmax(axis=0)
    assert np.ptp(peak_bins) <= 1
    # peak should fall around the 1 kHz filter
    fb = mel_filterbank(64, n_fft, sr)
    bin_1k = int(round(freq / (sr / n_fft)))
    expect_mel = fb[bin_1k].argmax()
    assert abs(int(peak_bins[0]) - int(expect_mel)) <= 1


def test_log_mel_batched():
    wave = np.random.default_rng(0).normal(size=(3, 2, 22050)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(wave), num_mels=32, n_fft=512, hop=256)
    assert mel.shape[:2] == (3, 2) and mel.shape[2] == 32
    assert np.isfinite(np.asarray(mel)).all()
