"""Flax CLAP audio encoder — the waveform→512-d embedding contract.

Reference: libfewshot_core/model/backbone/clap.py wraps the external
LAION-CLAP package (``laion_clap.CLAP_Module``) and calls
``get_audio_embedding_from_data`` per waveform
(clap.py:255-336, driven from the trainer at trainer.py:179-184).  That
dependency is a soft one in the reference too; here the encoder itself is
re-implemented TPU-native so the ``is_clap`` flow can run end-to-end from
audio when converted weights are supplied — no external package, no network.

Architecture (LAION-CLAP's default audio branch, HTSAT-tiny):

1.  waveform, 48 kHz mono, padded/tiled or center-cropped to
    ``clip_samples`` (10 s = 480 000 — CLAP's fixed audio window);
2.  log-mel frontend: n_fft/window 1024, hop 480, 64 mel bins,
    fmin 50 Hz, fmax 14 kHz (ops/mel.py — one rFFT + one MXU matmul);
3.  HTSAT time-frequency folding: the [T≈1001, 64] mel map is padded to
    ``spec_size·freq_ratio = 1024`` frames and folded into a
    [spec_size, spec_size] = [256, 256] "image" by stacking
    ``freq_ratio=4`` time chunks along the frequency axis;
4.  Swin-tiny body (embed_dim 96, depths 2/2/6/2, heads 4/8/16/32,
    window 8, head_dim 24 — models/backbones/swin.py stages) with mean-pool
    → the 768-d HTSAT latent;
5.  CLAP audio projection: Linear(768→512) → ReLU → Linear(512→512),
    L2-normalized (CLAP ``get_audio_embedding`` semantics).

Weight loading: ``load_params`` reads a flat ``.npz`` of ``/``-joined flax
param paths (the format ``save_params`` writes and
tools/convert_clap_checkpoint.py produces from a torch CLAP state dict).
Without weights the encoder is a random-init skeleton — fine for pipeline
tests, clearly NOT a pretrained CLAP (the factory in clap.py enforces an
explicit opt-in).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.mel import log_mel_spectrogram
from .swin import SwinTransformer

CLAP_SAMPLE_RATE = 48_000
CLAP_CLIP_SAMPLES = 480_000  # 10 s — CLAP's fixed audio window


def fit_waveform(wave: np.ndarray, clip_samples: int = CLAP_CLIP_SAMPLES) -> np.ndarray:
    """Deterministic pad/crop to the CLAP window: short audio is tiled
    (CLAP's 'repeat' pad for non-fusion models), long audio center-cropped
    (the deterministic stand-in for CLAP's random crop at train time)."""
    wave = np.asarray(wave, dtype=np.float32).reshape(-1)
    n = wave.shape[0]
    if n == 0:
        raise ValueError("empty waveform")
    if n < clip_samples:
        wave = np.tile(wave, int(np.ceil(clip_samples / n)))[:clip_samples]
    elif n > clip_samples:
        start = (n - clip_samples) // 2
        wave = wave[start : start + clip_samples]
    return wave


def resample_linear(wave: np.ndarray, sr_in: int, sr_out: int = CLAP_SAMPLE_RATE) -> np.ndarray:
    """Linear-interpolation resample (host-side, extraction tool only).
    CLAP's own loader resamples with torchaudio; linear interp is within
    the skeleton's fidelity budget and dependency-free."""
    if sr_in == sr_out:
        return np.asarray(wave, dtype=np.float32).reshape(-1)
    wave = np.asarray(wave, dtype=np.float64).reshape(-1)
    n_out = int(round(wave.shape[0] * sr_out / sr_in))
    x_out = np.arange(n_out) * (sr_in / sr_out)
    return np.interp(x_out, np.arange(wave.shape[0]), wave).astype(np.float32)


class CLAPAudioEncoder(nn.Module):
    """Waveform [N, samples] → L2-normalized embeddings [N, embed_dim]."""

    embed_dim: int = 512
    sample_rate: int = CLAP_SAMPLE_RATE
    n_fft: int = 1024
    hop: int = 480
    num_mels: int = 64
    fmin: float = 50.0
    fmax: float = 14_000.0
    spec_size: int = 256
    freq_ratio: int = 4
    swin_embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 8
    normalize: bool = True

    def fold_spectrogram(self, mel: jnp.ndarray) -> jnp.ndarray:
        """[N, F, T] mel → [N, 1, spec_size, spec_size] HTSAT image: pad T
        to spec_size·freq_ratio, then stack freq_ratio time chunks along
        the frequency axis (HTSAT ``reshape_wav2img`` semantics)."""
        n, f, t = mel.shape
        target_t = self.spec_size * self.freq_ratio
        target_f = self.spec_size // self.freq_ratio
        if f != target_f:
            raise ValueError(f"expected {target_f} mel bins, got {f}")
        if t > target_t:
            mel = mel[:, :, :target_t]
        elif t < target_t:
            mel = jnp.pad(mel, ((0, 0), (0, 0), (0, target_t - t)))
        # HTSAT reshape_wav2img: split T chunk-major as (R, T/R), stack the
        # chunks on the FREQUENCY axis → H = (chunk, freq) of size R·F,
        # W = time-within-chunk (htsat.py permute(0,1,3,2) → reshape
        # (B,C,F,R,T/R) → permute(0,1,3,2,4) → (B,C,R·F,T/R)).  The
        # previous transpose-of-this orientation was harmless for
        # from-scratch training on the square image but would feed a
        # converted REAL HTSAT checkpoint a transposed spectrogram.
        # [N, F, R, T/R] -> [N, R, F, T/R] -> [N, R*F, T/R]
        x = mel.reshape(n, f, self.freq_ratio, self.spec_size)
        x = x.transpose(0, 2, 1, 3).reshape(n, self.spec_size, self.spec_size)
        return x[:, None, :, :]  # NCHW single channel

    @nn.compact
    def __call__(self, waveform: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if waveform.ndim == 1:
            waveform = waveform[None]
        waveform = waveform.reshape(waveform.shape[0], -1).astype(jnp.float32)
        mel = log_mel_spectrogram(
            waveform, num_mels=self.num_mels, n_fft=self.n_fft, hop=self.hop,
            sample_rate=self.sample_rate, fmin=self.fmin, fmax=self.fmax,
        )  # [N, F, T]
        img = self.fold_spectrogram(mel)
        latent = SwinTransformer(
            embed_dim=self.swin_embed_dim,
            depths=tuple(self.depths),
            num_heads=tuple(self.num_heads),
            downscaling_factors=(4, 2, 2, 2),
            window_size=self.window_size,
            head_dim=self.swin_embed_dim // self.num_heads[0],
            is_flatten=True,
            name="htsat",
        )(img, train=train)  # [N, 8*swin_embed_dim]
        x = nn.Dense(self.embed_dim, name="proj0")(latent)
        x = nn.relu(x)
        x = nn.Dense(self.embed_dim, name="proj1")(x)
        if self.normalize:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x


def mini_encoder(**kw) -> CLAPAudioEncoder:
    """A tiny variant for tests (1 s window, 64×64 folded image)."""
    cfg = dict(
        sample_rate=16_000, n_fft=256, hop=64, num_mels=16, fmin=0.0,
        fmax=8_000.0, spec_size=64, freq_ratio=4, swin_embed_dim=24,
        depths=(1, 1), num_heads=(2, 4), window_size=4,
    )
    cfg.update(kw)
    return CLAPAudioEncoder(**cfg)


# -- flat-npz param io --------------------------------------------------------

def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params(path: str, params: Any) -> None:
    np.savez(path, **_flatten(jax.device_get(params)))


def load_params(path: str) -> Dict[str, Any]:
    """Flat ``a/b/c`` npz → nested flax params dict."""
    tree: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return tree
