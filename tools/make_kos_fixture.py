"""Generate a KOS-layout on-disk dataset fixture for end-to-end soaks.

The real KOS audio data (reference ``data_root:
/root/SC/Results/KOS_1_alpha/KOS_1_alpha_spec`` — reference
config/headers/data.yaml:1) is not shipped with the reference snapshot, so
end-to-end accuracy runs need a stand-in with the same on-disk contract
(SURVEY §0 + audio_fewshot_tpu/data/dataset.py):

    <out>/KOS_1_alpha_spec/<class>/<clip>.npy   # [128, T] float32 log-mel, T varies
    <out>/KOS_0_alpha_spec/<class>/<clip>.npy   # test classes, correlation-free twin
    <out>/KOS_fixture_splits.npy                # object array [train, val, test] names
    <out>/Fixture_Mean_Std.npy                  # (2,1,1) float32 scalar stats

The generative model mirrors the KOS benchmark's *structure* (a
spurious-correlation OOD benchmark — SURVEY §0):

- each class has a characteristic smooth spectral envelope plus 3 "event"
  templates (harmonic stacks / band-limited noise bursts) — the TRUE signal;
- every clip also carries a narrow background "hum" band — the SPURIOUS cue.
  In the ``KOS_1_alpha`` variant the hum band is class-keyed (fully
  correlated, alpha=1); in the ``KOS_0_alpha`` twin the SAME clips are
  re-rendered with a uniformly random hum band (alpha=0), so any model
  leaning on the cue loses accuracy on the OOD test split — reproducing the
  iid→ood drop the reference's ``ood`` configs are built to measure
  (reference run_test.py:14-134 path comments).

Deterministic in ``--seed``; numpy only; ~250 MB at the default size.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

NUM_MEL = 128
SEG = 157  # segment_frames (SURVEY §0: [1, 128, 157] log-mel segments)


def _smooth(rng: np.random.Generator, n: int, kernel: int) -> np.ndarray:
    x = rng.normal(size=n + kernel)
    k = np.hanning(kernel)
    return np.convolve(x, k / k.sum(), mode="same")[:n]


class ClassModel:
    """Per-class generative parameters (envelope + event templates + hum)."""

    def __init__(self, rng: np.random.Generator, hum_band: int):
        self.envelope = np.exp(0.6 * _smooth(rng, NUM_MEL, 24))  # power scale
        self.hum_band = hum_band
        self.events = []
        for _ in range(3):
            kind = rng.choice(["harmonic", "burst"])
            if kind == "harmonic":
                f0 = int(rng.integers(8, 48))
                harmonics = [
                    (min(f0 * (h + 1), NUM_MEL - 2), 1.0 / (h + 1))
                    for h in range(int(rng.integers(2, 5)))
                ]
                self.events.append(("harmonic", f0, harmonics,
                                    float(rng.uniform(20, 60))))
            else:
                lo = int(rng.integers(0, NUM_MEL - 24))
                width = int(rng.integers(8, 24))
                self.events.append(("burst", lo, width,
                                    float(rng.uniform(10, 40))))


def _render_event(power: np.ndarray, ev, t0: int, dur: int,
                  rng: np.random.Generator, gain: float) -> None:
    t = np.arange(dur)
    am = np.hanning(dur) * gain
    if ev[0] == "harmonic":
        _, f0, harmonics, _ = ev
        jitter = _smooth(rng, dur, 16) * 1.5
        for f, amp in harmonics:
            rows = np.clip(np.round(f + jitter).astype(int), 0, NUM_MEL - 1)
            power[rows, t0 + t] += amp * am * (1.0 + 0.3 * rng.normal(size=dur))
    else:
        _, lo, width, _ = ev
        band = rng.uniform(0.5, 1.5, size=(width, 1))
        power[lo : lo + width, t0 : t0 + dur] += band * am[None, :]


def render_clip(cm: ClassModel, rng: np.random.Generator, n_frames: int,
                hum_band: int, snr: float) -> np.ndarray:
    """One [128, n_frames] log-power spectrogram."""
    # pink-ish background shaped by the class envelope
    noise = rng.gamma(2.0, 0.5, size=(NUM_MEL, n_frames))
    pink = (1.0 / (1.0 + np.arange(NUM_MEL) / 16.0))[:, None]
    power = 0.5 * noise * pink * cm.envelope[:, None]
    # spurious hum: a narrow, steady band (easy cue)
    hum_rows = slice(hum_band, min(hum_band + 4, NUM_MEL))
    power[hum_rows, :] += 1.0 * (1.0 + 0.1 * rng.normal(size=(power[hum_rows].shape)))
    # true signal: 1 event per ~SEG frames, class templates
    n_events = max(1, n_frames // SEG)
    for _ in range(n_events):
        ev = cm.events[rng.integers(len(cm.events))]
        dur = int(rng.integers(40, 120))
        t0 = int(rng.integers(0, max(1, n_frames - dur)))
        _render_event(power, ev, t0, dur, rng, gain=snr * ev[3])
    db = 10.0 * np.log10(np.maximum(power, 1e-6))
    return (db + rng.normal(0.0, 0.5)).astype(np.float32)  # per-clip gain wobble


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/kos_fixture")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--clips", type=int, default=30, help="clips per class")
    ap.add_argument("--snr", type=float, default=0.6,
                    help="event gain multiplier (learnability knob)")
    ap.add_argument("--splits", default="25,5,8",
                    help="train,val,test class counts (reference "
                         "KOS_paper_splits sizes by default)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    n_train, n_val, n_test = (int(x) for x in args.splits.split(","))
    names = [f"fx_{i:02d}" for i in range(n_train + n_val + n_test)]
    splits = (names[:n_train], names[n_train : n_train + n_val],
              names[n_train + n_val :])

    # class-keyed hum bands (the alpha=1 spurious correlation) — spread out
    # so the cue is unambiguous
    bands = rng.permutation(np.linspace(4, NUM_MEL - 8, len(names)).astype(int))
    models = {n: ClassModel(rng, int(bands[i])) for i, n in enumerate(names)}

    root1 = os.path.join(args.out, "KOS_1_alpha_spec")
    root0 = os.path.join(args.out, "KOS_0_alpha_spec")
    test_set = set(splits[2])
    stats_sum, stats_sq, stats_n = 0.0, 0.0, 0
    for ci, name in enumerate(names):
        cm = models[name]
        os.makedirs(os.path.join(root1, name), exist_ok=True)
        if name in test_set:
            os.makedirs(os.path.join(root0, name), exist_ok=True)
        for k in range(args.clips):
            n_seg = 1 + min(int(rng.geometric(0.45)) - 1, 5)  # 1..6, short-skewed
            n_frames = int(n_seg * SEG * rng.uniform(0.8, 1.0))
            clip_rng = np.random.default_rng((args.seed, ci, k))
            spec = render_clip(cm, clip_rng, n_frames, cm.hum_band, args.snr)
            np.save(os.path.join(root1, name, f"clip_{k:03d}.npy"), spec)
            if name in splits[0]:
                stats_sum += float(spec.sum())
                stats_sq += float((spec.astype(np.float64) ** 2).sum())
                stats_n += spec.size
            if name in test_set:
                # alpha=0 twin: same clip content, random (uncorrelated) hum
                rand_band = int(clip_rng.integers(4, NUM_MEL - 8))
                spec0 = render_clip(cm, np.random.default_rng(
                    (args.seed, ci, k)), n_frames, rand_band, args.snr)
                np.save(os.path.join(root0, name, f"clip_{k:03d}.npy"), spec0)

    mean = stats_sum / stats_n
    std = float(np.sqrt(stats_sq / stats_n - mean * mean))
    np.save(os.path.join(args.out, "Fixture_Mean_Std.npy"),
            np.asarray([mean, std], dtype=np.float32).reshape(2, 1, 1))
    np.save(os.path.join(args.out, "KOS_fixture_splits.npy"),
            np.asarray([np.asarray(s) for s in splits], dtype=object),
            allow_pickle=True)
    print(f"fixture at {args.out}: {len(names)} classes x {args.clips} clips, "
          f"mean={mean:.3f} std={std:.3f}")


if __name__ == "__main__":
    main()
