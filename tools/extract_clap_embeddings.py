"""Offline CLAP embedding extraction — the waveform→embedding contract.

Reference flow: when ``is_clap`` is set, the reference trainer converts each
batch of audio into CLAP embeddings on the fly through the external
``laion_clap`` package (reference trainer.py:179-184 →
model/backbone/clap.py:255-336).  TPU-native equivalent: embeddings are
extracted ONCE, offline, by this tool; training/eval then consume the
pre-extracted embedding dataset through ``CLAPEmbeddingBackbone``
(reference clap.py:351-386) — no per-step host→encoder round-trips in the
hot loop.

Contract (see also models/backbones/clap_encoder.py):

- input: a KOS-layout directory of mono audio clips,
  ``<audio_root>/<class>/<clip>.wav`` (PCM int16/int32/float32) or
  ``<clip>.npy`` (1-D float waveform at ``--sample_rate``);
- each waveform is resampled to 48 kHz (linear interp), tiled or
  center-cropped to CLAP's fixed 10 s window, and encoded to an
  L2-normalized 512-d embedding;
- output mirrors the layout: ``<out>/<class>/<clip>.npy`` float32 [512] —
  directly consumable as ``data_root`` by the data layer (1-D clips are
  wrapped as single segments, data/dataset.py:segment_clip).

Weights: ``--checkpoint`` is a converted flat-npz (see
tools/convert_clap_checkpoint.py).  ``--allow-random-init`` runs the
random-weight skeleton (pipeline tests only — NOT pretrained CLAP).
"""

from __future__ import annotations

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_wav(path: str):
    """stdlib wave reader → (float32 mono waveform in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio_root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="converted flat-npz CLAP weights")
    ap.add_argument("--allow-random-init", action="store_true")
    ap.add_argument("--sample_rate", type=int, default=48000,
                    help="sample rate of .npy waveforms (wav is self-describing)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mini", action="store_true",
                    help="tiny encoder variant (tests)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS is latched "
                         "before user code on some deployments, so an env "
                         "override is not enough; tests use this to stay "
                         "off a possibly-unreachable accelerator)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from audio_fewshot_tpu.models.backbones.clap_encoder import (
        CLAPAudioEncoder,
        fit_waveform,
        load_params,
        mini_encoder,
        resample_linear,
    )

    if not args.checkpoint and not args.allow_random_init:
        raise SystemExit(
            "no --checkpoint given: pass converted CLAP weights "
            "(tools/convert_clap_checkpoint.py) or --allow-random-init "
            "for the untrained skeleton"
        )

    enc = mini_encoder() if args.mini else CLAPAudioEncoder()
    # mini variant uses a 1 s window; the real contract is CLAP's 10 s
    clip_samples = enc.sample_rate if args.mini else 480_000

    # init once on a dummy batch, then swap in checkpoint params
    dummy = jnp.zeros((1, clip_samples), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), dummy)["params"]
    if args.checkpoint:
        loaded = load_params(args.checkpoint)
        if (jax.tree_util.tree_structure(loaded)
                != jax.tree_util.tree_structure(params)):
            raise SystemExit(
                f"checkpoint {args.checkpoint} does not match the encoder "
                "param tree — was it converted for this variant?"
            )
        params = loaded

    @jax.jit
    def encode(waves):
        return enc.apply({"params": params}, waves)

    classes = sorted(
        d for d in os.listdir(args.audio_root)
        if os.path.isdir(os.path.join(args.audio_root, d))
    )
    total = 0
    for cls in classes:
        cdir = os.path.join(args.audio_root, cls)
        odir = os.path.join(args.out, cls)
        os.makedirs(odir, exist_ok=True)
        files = sorted(f for f in os.listdir(cdir)
                       if f.endswith((".wav", ".npy")))
        for i in range(0, len(files), args.batch):
            chunk = files[i : i + args.batch]
            waves = []
            for f in chunk:
                p = os.path.join(cdir, f)
                if f.endswith(".wav"):
                    x, sr = read_wav(p)
                else:
                    x, sr = np.load(p).astype(np.float32), args.sample_rate
                x = resample_linear(x, sr, enc.sample_rate)
                waves.append(fit_waveform(x, clip_samples))
            emb = np.asarray(encode(jnp.stack(waves)))
            for f, e in zip(chunk, emb):
                np.save(os.path.join(odir, os.path.splitext(f)[0] + ".npy"),
                        e.astype(np.float32))
            total += len(chunk)
    print(f"extracted {total} embeddings → {args.out} "
          f"(dim {emb.shape[-1]}, {'random-init' if not args.checkpoint else args.checkpoint})")


if __name__ == "__main__":
    main()
