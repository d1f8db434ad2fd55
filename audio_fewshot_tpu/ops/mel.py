"""Waveform → log-mel spectrogram frontend as jit-able JAX ops.

The reference consumes PRE-extracted spectrograms from disk (``data_root``
points at ``*_spec`` directories — SURVEY §0); the extraction pipeline
itself is outside its snapshot.  This frontend closes the loop so raw
waveforms can be processed on-device: framing → Hann window → rFFT power →
mel filterbank matmul (MXU) → log, with the KOS geometry as defaults
(128 mel bins; 157 frames ≈ 5 s at 22.05 kHz with hop 700).

Throughput of this op is the BASELINE.md "mel-frames/sec" preprocessing
metric.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    """Slaney mel scale (librosa default, ``htk=False``): linear below
    1 kHz, logarithmic above — consistent with the Slaney area
    normalization applied to the filterbank."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f < min_log_hz, f / f_sp, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep
    )


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m < min_log_mel, m * f_sp, min_log_hz * np.exp(logstep * (m - min_log_mel))
    )


def mel_filterbank(num_mels: int, n_fft: int, sample_rate: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-style triangular mel filterbank [n_fft//2+1, num_mels]."""
    fmax = fmax or sample_rate / 2.0
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.fft.rfftfreq(n_fft, d=1.0 / sample_rate)
    fb = np.zeros((len(bins), num_mels), np.float32)
    for m in range(num_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    # Slaney normalization: each filter integrates to ~constant energy
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    return fb * enorm[None, :].astype(np.float32)


@partial(jax.jit, static_argnames=("num_mels", "n_fft", "hop", "sample_rate",
                                   "fmin", "fmax"))
def log_mel_spectrogram(
    waveform: jnp.ndarray,
    num_mels: int = 128,
    n_fft: int = 2048,
    hop: int = 700,
    sample_rate: int = 22050,
    eps: float = 1e-10,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jnp.ndarray:
    """[..., T_samples] → [..., num_mels, T_frames] log-mel spectrogram.

    Framing is a strided gather; the FFT power → mel projection is one
    matmul against the precomputed filterbank.
    """
    t = waveform.shape[-1]
    n_frames = 1 + (t - n_fft) // hop if t >= n_fft else 1
    if t < n_fft:
        waveform = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(0, n_fft - t)])
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = waveform[..., idx]  # [..., n_frames, n_fft]
    # periodic Hann (librosa/scipy sym=False), not numpy's symmetric window
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(num_mels, n_fft, sample_rate,
                                    fmin=fmin, fmax=fmax))
    mel = jnp.einsum("...tf,fm->...mt", power, fb)
    return jnp.log(mel + eps)
