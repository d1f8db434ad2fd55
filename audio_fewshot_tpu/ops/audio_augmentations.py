"""Spectrogram TTA augmentations as jit-able batched JAX ops.

Reference: libfewshot_core/audio_augmentations.py — 8 augmentations applied
to DE-normalized spectrograms through per-sample/channel Python loops with
``torch.quantile`` (cited per function below).  Here every augmentation is a
pure function over ``[..., H, W]`` arrays with all reductions along the last
two axes (so one call covers any batch shape), keyed by explicit PRNG keys.
Quantiles lower to XLA sort — VPU work, fused with the surrounding
elementwise math; the per-image host loop of the reference's TTA path
(test.py:107-122) becomes one vmapped device call.

The dispatcher contract matches the reference: de-normalize → augment →
re-normalize (``augment_spectrogram``, reference :531-605), and the batch
helper produces ``num_augmentations`` versions per input (:607-657).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

AUGMENTATION_TYPES = (
    "cutout",
    "linear_filter",
    "noise_suppression",
    "noise_matching",
    "background_subtraction",
    "contrast_enhancement",
    "foreground_norm",
    "wiener_filter",
)


#: quantile implementation: "exact" (full sort, torch.quantile parity) or
#: "bisect" (24 compare+mean passes — VPU-only, no sort/scatter; error
#: ≤ range/2²⁴, immaterial for the soft-sigmoid thresholds these gate)
QUANTILE_MODE = "bisect"


def _bisect_quantile(flat: jnp.ndarray, q, iters: int = 24) -> jnp.ndarray:
    """Per-row quantile by bisection on the value range.  Each iteration is
    one vectorized compare + mean over the row — the TPU-friendly shape
    (jnp.quantile's full sort and scatter-histograms both lose badly here)."""
    lo = jnp.min(flat, axis=-1)
    hi = jnp.max(flat, axis=-1)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        frac = jnp.mean((flat <= mid[..., None]).astype(jnp.float32), axis=-1)
        below = frac < q
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def _q(x: jnp.ndarray, q) -> jnp.ndarray:
    """Per-sample scalar quantile over the trailing [H, W] plane, keepdims."""
    flat = x.reshape(x.shape[:-2] + (-1,))
    if QUANTILE_MODE == "bisect":
        return _bisect_quantile(flat, q)[..., None, None]
    return jnp.quantile(flat, q, axis=-1)[..., None, None]


# -- augmentations -----------------------------------------------------------

def random_cutout(rng, spec, num_cutouts: int = 1,
                  cutout_size_ratio=(0.1, 0.3), fill_value: float = 0.0,
                  active_count=None):
    """Mask random rectangles (reference :56-104).  The cutout is shared
    across leading axes of one sample, matching the 4D reference path.

    ``active_count`` (traced int ≤ the static ``num_cutouts``) lets the
    dispatcher draw the reference's per-call ``randint(1, 3)`` cutout count
    without recompiling: cutouts beyond it become no-ops."""
    h, w = spec.shape[-2:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    for i in range(num_cutouts):
        k1, k2, k3, k4, rng = jax.random.split(rng, 5)
        rh = jax.random.uniform(k1, (), minval=cutout_size_ratio[0],
                                maxval=cutout_size_ratio[1])
        rw = jax.random.uniform(k2, (), minval=cutout_size_ratio[0],
                                maxval=cutout_size_ratio[1])
        ch = (h * rh).astype(jnp.int32)
        cw = (w * rw).astype(jnp.int32)
        # torch random.randint is INCLUSIVE of h-ch (reference :92-93) —
        # jax maxval is exclusive, so +1 or the cutout can never sit flush
        # with the bottom/right edge
        top = jax.random.randint(k3, (), 0, jnp.maximum(h - ch + 1, 1))
        left = jax.random.randint(k4, (), 0, jnp.maximum(w - cw + 1, 1))
        inside = (
            (rows >= top) & (rows < top + ch) & (cols >= left) & (cols < left + cw)
        )
        if active_count is not None:
            inside = inside & (i < active_count)
        spec = jnp.where(inside, fill_value, spec)
    return spec


def background_noise_suppression(rng, spec, noise_percentile=20.0,
                                 suppression_strength=0.5):
    """Soft-suppress bins below the noise-floor quantile (reference
    :106-159)."""
    a = jnp.abs(spec)
    thr = _q(a, noise_percentile / 100.0)
    mask = jax.nn.sigmoid((a - thr) / (thr * 0.1 + 1e-8))
    return spec * (1.0 - suppression_strength * (1.0 - mask))


def temporal_median_background_subtraction(rng, spec, percentile=10.0):
    """Subtract the per-frequency temporal percentile, clamp at 0
    (reference :161-210)."""
    background = jnp.quantile(spec, percentile / 100.0, axis=-1, keepdims=True)
    return jnp.maximum(spec - background, 0.0)


def spectral_contrast_enhancement(rng, spec, contrast_factor=1.5,
                                  clip_percentile=95.0):
    """Scale around the mean, clip at the |·| percentile (reference
    :212-266)."""
    mean = jnp.mean(spec, axis=(-2, -1), keepdims=True)
    out = mean + (spec - mean) * contrast_factor
    max_val = _q(jnp.abs(out), clip_percentile / 100.0)
    return jnp.clip(out, -max_val, max_val)


def foreground_energy_normalization(rng, spec, top_k_percent=20.0):
    """Normalize by the statistics of the top-k% energy bins (reference
    :269-326)."""
    energy = jnp.abs(spec)
    thr = _q(energy, 1.0 - top_k_percent / 100.0)
    fg = energy >= thr
    n = jnp.maximum(jnp.sum(fg, axis=(-2, -1), keepdims=True), 1)
    fg_mean = jnp.sum(jnp.where(fg, spec, 0.0), axis=(-2, -1), keepdims=True) / n
    fg_var = jnp.sum(
        jnp.where(fg, (spec - fg_mean) ** 2, 0.0), axis=(-2, -1), keepdims=True
    ) / jnp.maximum(n - 1, 1)
    return (spec - fg_mean) / (jnp.sqrt(fg_var) + 1e-8)


def wiener_like_filtering(rng, spec, noise_floor_percentile=15.0,
                          gain_factor=2.0):
    """SNR-gated gain (reference :328-386)."""
    a = jnp.abs(spec)
    noise = _q(a, noise_floor_percentile / 100.0)
    snr = a / (noise + 1e-8)
    gain = snr / (snr + 1.0) * gain_factor
    return spec * gain


def adaptive_noise_profile_matching(rng, spec, target_noise_level=0.1,
                                    smoothing_window: int = 5):
    """Rescale noise-floor regions toward a target level (reference
    :389-465): per-frame min over frequency, box-smoothed in time, scale
    clamped to [0.5, 2], applied through a soft signal mask.

    The reference's smoothing branch is broken as snapshotted (reflect-pads
    a [1,1,1,W] tensor with a 2-element pad — torch NotImplementedError,
    audio_augmentations.py:432-433); this is the intended same-size
    smoothing, verified against the oracle at smoothing_window=1
    (tests/test_augmentation_parity.py)."""
    a = jnp.abs(spec)
    noise = jnp.min(a, axis=-2, keepdims=True)  # [..., 1, W]
    if smoothing_window > 1 and spec.shape[-1] > smoothing_window:
        pad = smoothing_window // 2
        padded = jnp.pad(
            noise, [(0, 0)] * (noise.ndim - 1) + [(pad, pad)], mode="reflect"
        )
        noise = _box_filter_1d(padded, smoothing_window)
    current = jnp.mean(noise, axis=(-2, -1), keepdims=True)
    # the reference leaves the spectrogram untouched when the estimated
    # floor is ~zero (scale=1.0 if current <= 1e-8, :437-442) — without
    # this, silent/padded inputs would have their background DOUBLED by
    # the clip ceiling
    scale = jnp.where(
        current > 1e-8,
        jnp.clip(target_noise_level / (current + 1e-8), 0.5, 2.0),
        1.0,
    )
    thr = _q(a, 0.3)
    signal_mask = jax.nn.sigmoid((a - thr) / (thr * 0.1 + 1e-8))
    return spec * (signal_mask + (1.0 - signal_mask) * scale)


def _box_filter_1d(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Valid-mode box filter along the last axis via cumsum (no conv loop)."""
    cs = jnp.cumsum(x, axis=-1)
    zeros = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    cs = jnp.concatenate([zeros, cs], axis=-1)
    return (cs[..., window:] - cs[..., :-window]) / window


def apply_linear_filteraugment(rng, spec, num_points: int = 4,
                               filter_strength: float = 0.5):
    """Linear-type FilterAugment (reference :467-529): random frequency
    breakpoints with random gains in [1±strength], linearly interpolated to a
    per-frequency curve."""
    h = spec.shape[-2]
    k1, k2 = jax.random.split(rng)
    pts = jnp.sort(jax.random.uniform(k1, (num_points,)) * (h - 1))
    vals = 1.0 + jax.random.uniform(
        k2, (num_points,), minval=-filter_strength, maxval=filter_strength
    )
    freq = jnp.arange(h, dtype=jnp.float32)
    curve = jnp.interp(freq, pts, vals)
    return spec * curve[..., :, None]


# Per-call hyperparameter sampling — the reference dispatcher draws every
# strength/percentile fresh from these ranges on each call (:559-597); a
# fixed midpoint would narrow the augmentation distribution models train
# under.  Continuous params trace straight through; structurally-static
# ones (linear-filter breakpoint count, smoothing window) pick a compiled
# branch via an inner lax.switch.


def _u(key, lo, hi):
    return jax.random.uniform(key, (), minval=lo, maxval=hi)


def _aug_cutout(rng, s):
    k_n, k = jax.random.split(rng)
    n = jax.random.randint(k_n, (), 1, 4)  # reference randint(1, 3) inclusive
    return random_cutout(k, s, num_cutouts=3, cutout_size_ratio=(0.1, 0.3),
                         active_count=n)


def _aug_linear_filter(rng, s):
    k_n, k_s, k = jax.random.split(rng, 3)
    strength = _u(k_s, 0.3, 0.7)
    idx = jax.random.randint(k_n, (), 0, 4)  # num_points randint(3, 6) incl.
    return jax.lax.switch(
        idx,
        [partial(
            lambda k, s, st, p: apply_linear_filteraugment(
                k, s, num_points=p, filter_strength=st), p=p)
         for p in (3, 4, 5, 6)],
        k, s, strength,
    )


def _aug_noise_suppression(rng, s):
    k1, k2, k = jax.random.split(rng, 3)
    return background_noise_suppression(
        k, s, noise_percentile=_u(k1, 15.0, 25.0),
        suppression_strength=_u(k2, 0.4, 0.7),
    )


def _aug_noise_matching(rng, s):
    k_w, k = jax.random.split(rng)
    idx = jax.random.randint(k_w, (), 0, 3)  # smoothing choice([3, 5, 7])
    return jax.lax.switch(
        idx,
        [partial(
            lambda k, s, w: adaptive_noise_profile_matching(
                k, s, smoothing_window=w), w=w)
         for w in (3, 5, 7)],
        k, s,
    )


def _aug_background_subtraction(rng, s):
    k1, k = jax.random.split(rng)
    return temporal_median_background_subtraction(
        k, s, percentile=_u(k1, 5.0, 15.0)
    )


def _aug_contrast(rng, s):
    k1, k2, k = jax.random.split(rng, 3)
    return spectral_contrast_enhancement(
        k, s, contrast_factor=_u(k1, 1.3, 2.0),
        clip_percentile=_u(k2, 90.0, 98.0),
    )


def _aug_foreground_norm(rng, s):
    k1, k = jax.random.split(rng)
    return foreground_energy_normalization(k, s, top_k_percent=_u(k1, 15.0, 25.0))


def _aug_wiener(rng, s):
    k1, k2, k = jax.random.split(rng, 3)
    return wiener_like_filtering(
        k, s, noise_floor_percentile=_u(k1, 10.0, 20.0),
        gain_factor=_u(k2, 1.5, 2.5),
    )


_AUG_FNS = {
    "cutout": _aug_cutout,
    "linear_filter": _aug_linear_filter,
    "noise_suppression": _aug_noise_suppression,
    "noise_matching": _aug_noise_matching,
    "background_subtraction": _aug_background_subtraction,
    "contrast_enhancement": _aug_contrast,
    "foreground_norm": _aug_foreground_norm,
    "wiener_filter": _aug_wiener,
}


def augment_spectrogram(rng, spec, mean, std, augmentation_type: str = "random"):
    """De-normalize → augment → re-normalize one sample [..., H, W]
    (reference dispatcher :531-605).  ``random`` draws the type per call via
    ``lax.switch`` — one compiled graph for all 8 branches."""
    denorm = spec * std + mean
    if augmentation_type == "random":
        k_pick, rng = jax.random.split(rng)
        idx = jax.random.randint(k_pick, (), 0, len(AUGMENTATION_TYPES))
        out = jax.lax.switch(
            idx,
            [partial(_AUG_FNS[name]) for name in AUGMENTATION_TYPES],
            rng, denorm,
        )
    else:
        out = _AUG_FNS[augmentation_type](rng, denorm)
    return (out - mean) / std


def augment_batch_one_type(rng, specs, mean, std):
    """Augment a whole batch with ONE randomly drawn type per call.

    Per-SAMPLE random types under ``vmap`` make ``lax.switch`` compute every
    branch for every sample (8× waste — measured 3.45 s vs 0.53 s per train
    step).  Drawing the type once per step keeps the scalar switch outside
    the vmap so exactly one branch runs.  Used by the train-time
    augmentation path; sample-level randomness still comes from the
    per-sample parameter keys."""
    k_pick, k_aug = jax.random.split(rng)
    idx = jax.random.randint(k_pick, (), 0, len(AUGMENTATION_TYPES))
    denorm = specs * std + mean
    keys = jax.random.split(k_aug, specs.shape[0])

    def branch(name):
        def run(keys, x):
            return jax.vmap(lambda k, s: _AUG_FNS[name](k, s))(keys, x)

        return run

    out = jax.lax.switch(
        idx, [branch(n) for n in AUGMENTATION_TYPES], keys, denorm
    )
    return (out - mean) / std


def batch_augment_spectrogram(rng, specs, mean, std, num_augmentations: int = 10,
                              augmentation_type: str = "random"):
    """[B, C, H, W] → [B·num_augmentations, C, H, W], one vmapped call
    (reference :607-657 loops the host)."""
    b = specs.shape[0]
    keys = jax.random.split(rng, b * num_augmentations)
    reps = jnp.repeat(specs, num_augmentations, axis=0)
    fn = lambda k, s: augment_spectrogram(k, s, mean, std, augmentation_type)
    return jax.vmap(fn)(keys, reps)
