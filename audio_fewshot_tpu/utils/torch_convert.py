"""Convert reference (PyTorch) backbone checkpoints to our variable trees.

The migration path for users with trained reference models: the reference's
``save_part`` emits ``emb_func_best.pth`` torch state dicts
(libfewshot_core/utils/utils.py:207-265); this module maps them onto our
flax parameter layout so they load through the normal ``pretrain_path`` /
``load_part`` flow.  Numerical agreement of the mapped weights is pinned by
tests/test_torch_parity.py (Conv64F, resnet12 forward parity) and
tests/test_checkpoint_convert.py (round trip through the tool).

Torch is only needed to *read* ``.pth`` files (tools/convert_torch_
checkpoint.py); this module operates on plain numpy state dicts.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["convert_backbone_state_dict", "strip_prefix"]


def strip_prefix(state: Dict[str, np.ndarray], prefix: str = "emb_func.") -> Dict[str, np.ndarray]:
    """Keep only ``prefix``-keys (full model checkpoints mix in classifier
    weights) and strip the prefix; pass through if no key carries it."""
    if not any(k.startswith(prefix) for k in state):
        return dict(state)
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [O,I,kh,kw] → flax [kh,kw,I,O]."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def _lin_w(w: np.ndarray) -> np.ndarray:
    return np.asarray(w).transpose(1, 0)


def _bn(params: Dict, stats: Dict, state: Dict[str, np.ndarray], key: str) -> None:
    params["scale"] = np.asarray(state[key + ".weight"])
    params["bias"] = np.asarray(state[key + ".bias"])
    stats["mean"] = np.asarray(state[key + ".running_mean"])
    stats["var"] = np.asarray(state[key + ".running_var"])


def _convert_convnf(state, params, stats):
    """Conv64F/Conv32F (reference conv_four.py: layer{i} = Sequential(conv,
    bn, relu[, pool]); optional ``logits`` head = [flatten, bn1d, linear])."""
    for i in range(1, 5):
        seq = f"layer{i}"
        params[seq]["Conv_0"]["kernel"] = _conv_w(state[f"{seq}.0.weight"])
        if f"{seq}.0.bias" in state:
            params[seq]["Conv_0"]["bias"] = np.asarray(state[f"{seq}.0.bias"])
        _bn(
            params[seq]["BatchNorm_0"]["BatchNorm_0"],
            stats[seq]["BatchNorm_0"]["BatchNorm_0"],
            state, f"{seq}.1",
        )
    if "logits_dense" in params and "logits.2.weight" in state:
        _bn(
            params["logits_bn"]["BatchNorm_0"], stats["logits_bn"]["BatchNorm_0"],
            state, "logits.1",
        )
        params["logits_dense"]["kernel"] = _lin_w(state["logits.2.weight"])
        params["logits_dense"]["bias"] = np.asarray(state["logits.2.bias"])


def _convert_resnet12(state, params, stats):
    """resnet12 family (reference resnet_12.py: layer{i} = [BasicBlock] with
    conv1..3/bn1..3 + downsample)."""
    for i in range(1, 5):
        blk = f"layer{i}.0"
        p, s = params[f"layer{i}"], stats[f"layer{i}"]
        for j in range(1, 4):
            p[f"conv{j}"]["kernel"] = _conv_w(state[f"{blk}.conv{j}.weight"])
            _bn(
                p[f"bn{j}"]["BatchNorm_0"], s[f"bn{j}"]["BatchNorm_0"],
                state, f"{blk}.bn{j}",
            )
        if f"{blk}.downsample.0.weight" in state and "downsample_conv" in p:
            p["downsample_conv"]["kernel"] = _conv_w(
                state[f"{blk}.downsample.0.weight"]
            )
            _bn(
                p["downsample_bn"]["BatchNorm_0"],
                s["downsample_bn"]["BatchNorm_0"],
                state, f"{blk}.downsample.1",
            )


def _convert_resnet12bdc(state, params, stats):
    """resnet12Bdc (reference resnet_bdc.py: BasicBlockVariant trunk + BdcPool
    head ``bdc_pool.conv_dr_block`` reduce conv/BN + ``temperature``)."""
    _convert_resnet12(state, params, stats)
    head_p, head_s = params["bdc_pool"], stats.get("bdc_pool", {})
    if "bdc_pool.conv_dr_block.0.weight" in state and "reduce_conv" in head_p:
        head_p["reduce_conv"]["kernel"] = _conv_w(
            state["bdc_pool.conv_dr_block.0.weight"]
        )
        _bn(
            head_p["reduce_bn"]["BatchNorm_0"],
            head_s["reduce_bn"]["BatchNorm_0"],
            state, "bdc_pool.conv_dr_block.1",
        )
    head_p["log_temperature"] = np.asarray(state["bdc_pool.temperature"])


def _convert_resnet18(state, params, stats):
    """resnet18 (reference resnet_18.py: conv1/bn1 stem + layer{i}.{b}
    BasicBlocks with optional downsample; ours names blocks layer{i}_{b})."""
    params["conv1"]["kernel"] = _conv_w(state["conv1.weight"])
    _bn(params["bn1"]["BatchNorm_0"], stats["bn1"]["BatchNorm_0"], state, "bn1")
    n_blocks = 0
    for i in range(1, 5):
        b = 0
        while f"layer{i}.{b}.conv1.weight" in state:
            name = f"layer{i}_{b}"
            p, s = params[name], stats[name]
            for j in (1, 2):
                p[f"conv{j}"]["kernel"] = _conv_w(
                    state[f"layer{i}.{b}.conv{j}.weight"]
                )
                _bn(
                    p[f"bn{j}"]["BatchNorm_0"], s[f"bn{j}"]["BatchNorm_0"],
                    state, f"layer{i}.{b}.bn{j}",
                )
            if f"layer{i}.{b}.downsample.0.weight" in state:
                p["downsample_conv"]["kernel"] = _conv_w(
                    state[f"layer{i}.{b}.downsample.0.weight"]
                )
                _bn(
                    p["downsample_bn"]["BatchNorm_0"],
                    s["downsample_bn"]["BatchNorm_0"],
                    state, f"layer{i}.{b}.downsample.1",
                )
            b += 1
            n_blocks += 1
    if n_blocks == 0:
        raise KeyError(
            "no resnet18 block keys found (expected layer1.0.conv1.weight) — "
            "wrong checkpoint or unexpected key prefix"
        )


def _convert_resnet18bdc(state, params, stats):
    """resnet18Bdc (reference resnet_bdc.py:141-190: trunk Sequential of
    [conv1, bn1, relu, pool] + 8 SimpleBlocks (C1/BN1/C2/BN2 +
    shortcut/BNshortcut) + BdcPool head)."""
    params["conv1"]["kernel"] = _conv_w(state["trunk.0.weight"])
    _bn(params["bn1"]["BatchNorm_0"], stats["bn1"]["BatchNorm_0"], state, "trunk.1")
    n_blocks = 0
    for s in range(4):
        for b in range(2):
            t = 4 + s * 2 + b  # trunk index past [conv, bn, relu, pool]
            if f"trunk.{t}.C1.weight" not in state:
                continue
            name = f"layer{s + 1}_{b}"
            p, st = params[name], stats[name]
            for j, (cw, bn) in enumerate((("C1", "BN1"), ("C2", "BN2")), start=1):
                p[f"conv{j}"]["kernel"] = _conv_w(state[f"trunk.{t}.{cw}.weight"])
                _bn(
                    p[f"bn{j}"]["BatchNorm_0"], st[f"bn{j}"]["BatchNorm_0"],
                    state, f"trunk.{t}.{bn}",
                )
            if f"trunk.{t}.shortcut.weight" in state:
                p["downsample_conv"]["kernel"] = _conv_w(
                    state[f"trunk.{t}.shortcut.weight"]
                )
                _bn(
                    p["downsample_bn"]["BatchNorm_0"],
                    st["downsample_bn"]["BatchNorm_0"],
                    state, f"trunk.{t}.BNshortcut",
                )
            n_blocks += 1
    if n_blocks == 0:
        raise KeyError(
            "no resnet18Bdc trunk keys found (expected trunk.4.C1.weight) — "
            "wrong checkpoint or unexpected key prefix"
        )
    head_p, head_s = params["bdc_pool"], stats.get("bdc_pool", {})
    if "bdc_pool.conv_dr_block.0.weight" in state and "reduce_conv" in head_p:
        head_p["reduce_conv"]["kernel"] = _conv_w(
            state["bdc_pool.conv_dr_block.0.weight"]
        )
        _bn(
            head_p["reduce_bn"]["BatchNorm_0"],
            head_s["reduce_bn"]["BatchNorm_0"],
            state, "bdc_pool.conv_dr_block.1",
        )
    head_p["log_temperature"] = np.asarray(state["bdc_pool.temperature"])


def _convert_swin(state, params, stats, factors):
    """Swin (reference swin_transformer.py, lucidrains-style): per stage a
    PatchMerging linear (unfold flattens (c, kh, kw); ours (kh, kw, c)) and
    [regular, shifted] block pairs with packed no-bias qkv and a SCALAR
    relative-position table indexed by (j−i) — ours is per-head, (i−j):
    broadcast across heads and flip both displacement axes."""
    converted = 0
    for s in range(4):
        pfx = f"stage{s + 1}."
        if pfx + "patch_partition.linear.weight" not in state:
            continue
        converted += 1
        w = np.asarray(state[pfx + "patch_partition.linear.weight"])
        out_dim, cff = w.shape
        f = factors[s]
        in_c = cff // (f * f)
        params[f"merge{s}"]["kernel"] = (
            w.reshape(out_dim, in_c, f, f).transpose(2, 3, 1, 0).reshape(cff, out_dim)
        )
        params[f"merge{s}"]["bias"] = np.asarray(
            state[pfx + "patch_partition.linear.bias"]
        )
        b = 0
        while f"{pfx}layers.{b // 2}.{b % 2}.attention_block.fn.fn.to_qkv.weight" in state:
            bp = f"{pfx}layers.{b // 2}.{b % 2}."
            p = params[f"stage{s}_block{b}"]
            p["norm1"]["scale"] = np.asarray(state[bp + "attention_block.fn.norm.weight"])
            p["norm1"]["bias"] = np.asarray(state[bp + "attention_block.fn.norm.bias"])
            qkv_w = np.asarray(state[bp + "attention_block.fn.fn.to_qkv.weight"])
            p["attn"]["qkv"]["kernel"] = qkv_w.T
            p["attn"]["qkv"]["bias"] = np.zeros((qkv_w.shape[0],), np.float32)
            p["attn"]["proj"]["kernel"] = _lin_w(
                state[bp + "attention_block.fn.fn.to_out.weight"]
            )
            p["attn"]["proj"]["bias"] = np.asarray(
                state[bp + "attention_block.fn.fn.to_out.bias"]
            )
            table = np.asarray(state[bp + "attention_block.fn.fn.pos_embedding"])
            heads = p["attn"]["rel_pos_bias"].shape[1]
            new_table = np.tile(np.flip(table, (0, 1)).reshape(-1, 1), (1, heads))
            if new_table.shape != p["attn"]["rel_pos_bias"].shape:
                raise ValueError(
                    f"swin window-size mismatch at stage{s}_block{b}: the "
                    f"checkpoint's rel-pos table is {new_table.shape} but the "
                    f"template expects {p['attn']['rel_pos_bias'].shape} — "
                    "the template's feature map clamped the effective window "
                    "below the checkpoint's window_size; init the template "
                    "on an input shape whose stage maps are ≥ window_size"
                )
            p["attn"]["rel_pos_bias"] = new_table
            p["norm2"]["scale"] = np.asarray(state[bp + "mlp_block.fn.norm.weight"])
            p["norm2"]["bias"] = np.asarray(state[bp + "mlp_block.fn.norm.bias"])
            p["fc1"]["kernel"] = _lin_w(state[bp + "mlp_block.fn.fn.net.0.weight"])
            p["fc1"]["bias"] = np.asarray(state[bp + "mlp_block.fn.fn.net.0.bias"])
            p["fc2"]["kernel"] = _lin_w(state[bp + "mlp_block.fn.fn.net.2.weight"])
            p["fc2"]["bias"] = np.asarray(state[bp + "mlp_block.fn.fn.net.2.bias"])
            b += 1
    if converted == 0:
        raise KeyError(
            "no swin stage keys found (expected stage1.patch_partition.*) — "
            "wrong checkpoint, or keys carry an unexpected prefix; got e.g. "
            + ", ".join(sorted(state)[:3])
        )


def _swin_with_factors(factors):
    def conv(state, params, stats):
        _convert_swin(state, params, stats, factors)

    return conv


def _convert_r2d2emb(state, params, stats):
    """R2D2Embedding (reference conv_four.py:203-262: block{i} =
    Sequential(conv3×3 w/ bias, BN, pool[, LeakyReLU][, Dropout]))."""
    for i in range(1, 5):
        blk = f"block{i}"
        params[f"{blk}_conv"]["kernel"] = _conv_w(state[f"{blk}.0.weight"])
        params[f"{blk}_conv"]["bias"] = np.asarray(state[f"{blk}.0.bias"])
        _bn(params[f"{blk}_bn"]["BatchNorm_0"],
            stats[f"{blk}_bn"]["BatchNorm_0"], state, f"{blk}.1")


def _convert_convmcl(state, params, stats):
    """Conv64F_MCL (reference conv_four_mcl.py: layer{i} =
    Sequential(bias-free conv, BN, LeakyReLU, pool))."""
    for i in range(1, 5):
        seq = f"layer{i}"
        params[seq]["Conv_0"]["kernel"] = _conv_w(state[f"{seq}.0.weight"])
        _bn(
            params[seq]["BatchNorm_0"]["BatchNorm_0"],
            stats[seq]["BatchNorm_0"]["BatchNorm_0"],
            state, f"{seq}.1",
        )


def _convert_wrn(state, params, stats):
    """WRN (reference wrn.py: conv1 stem; block{g}.layer.{b} pre-activation
    BasicBlocks with bn1/conv1/bn2/conv2[/convShortcut]; final bn1)."""
    params["conv1"]["kernel"] = _conv_w(state["conv1.weight"])
    _bn(params["bn1"]["BatchNorm_0"], stats["bn1"]["BatchNorm_0"], state, "bn1")
    n_blocks = 0
    for g in range(1, 4):
        b = 0
        while f"block{g}.layer.{b}.conv1.weight" in state:
            ref = f"block{g}.layer.{b}"
            name = f"block{g}_{b}"
            p, s = params[name], stats[name]
            for j in (1, 2):
                p[f"conv{j}"]["kernel"] = _conv_w(state[f"{ref}.conv{j}.weight"])
                _bn(
                    p[f"bn{j}"]["BatchNorm_0"], s[f"bn{j}"]["BatchNorm_0"],
                    state, f"{ref}.bn{j}",
                )
            if f"{ref}.convShortcut.weight" in state:
                p["shortcut"]["kernel"] = _conv_w(
                    state[f"{ref}.convShortcut.weight"]
                )
            b += 1
            n_blocks += 1
    if n_blocks == 0:
        raise KeyError(
            "no WRN block keys found (expected block1.layer.0.conv1.weight)"
        )


def _convert_resnet12_dense(state, params, stats):
    """resnet12_mcl / resnet12_r2d2 (reference resnet_12_mcl.py: same
    3-conv BasicBlock key layout as resnet12 — layer{i}.0.conv{j}/bn{j} +
    downsample; stride lives in a parameter-free maxpool)."""
    _convert_resnet12(state, params, stats)


def _mtl_conv(p, state, key, has_bias=False):
    """Conv2dMtl → MtlConv: weight [O,I,kh,kw] → kernel [kh,kw,I,O];
    mtl_weight [O,I,1,1] → mtl_scale [1,1,I,O]; shift = bias + mtl_bias
    (the reference adds them at forward, resnet_12_mtl_offcial.py:149-152;
    bias-free convs keep shift 0)."""
    p["kernel"] = _conv_w(state[key + ".weight"])
    p["mtl_scale"] = np.asarray(state[key + ".mtl_weight"]).transpose(2, 3, 1, 0)
    if has_bias and key + ".bias" in state:
        p["mtl_bias"] = (
            np.asarray(state[key + ".bias"])
            + np.asarray(state[key + ".mtl_bias"])
        )
    else:
        p["mtl_bias"] = np.zeros(p["kernel"].shape[-1], np.float32)


def _convert_resnet12mtl(state, params, stats):
    """resnet12MTLofficial (reference resnet_12_mtl_offcial.py:212-270:
    Conv2dMtl stem w/ bias + 3 stages × 4 two-conv BasicBlockMTL)."""
    _mtl_conv(params["conv1"], state, "conv1", has_bias=True)
    _bn(params["bn1"]["BatchNorm_0"], stats["bn1"]["BatchNorm_0"], state, "bn1")
    for i in range(1, 4):
        for b in range(4):
            ref = f"layer{i}.{b}"
            name = f"layer{i}_{b}"
            p, s = params[name], stats[name]
            for j in (1, 2):
                _mtl_conv(p[f"conv{j}"], state, f"{ref}.conv{j}")
                _bn(
                    p[f"bn{j}"]["BatchNorm_0"], s[f"bn{j}"]["BatchNorm_0"],
                    state, f"{ref}.bn{j}",
                )
            if f"{ref}.downsample.0.weight" in state:
                _mtl_conv(p["downsample_conv"], state, f"{ref}.downsample.0")
                _bn(
                    p["downsample_bn"]["BatchNorm_0"],
                    s["downsample_bn"]["BatchNorm_0"],
                    state, f"{ref}.downsample.1",
                )


def _ln(params, state, key):
    params["scale"] = np.asarray(state[key + ".weight"])
    params["bias"] = np.asarray(state[key + ".bias"])


def _convert_vit(state, params, stats):
    """Standard ViT (reference vit.py, lucidrains-style): patch Linear over
    (p1 p2 c)-flattened patches → our patch conv; per block PreNorm attn
    (packed bias-free to_qkv + to_out) and PreNorm MLP.  Requires
    dim_head·heads == dim (our attention derives head_dim).  Use backbone
    kwargs ``pool: mean`` + ``final_norm: false`` for exact
    reference-output semantics."""
    pe = params["patch_embed"]
    kh, kw, cin, dim = pe["kernel"].shape
    w = np.asarray(state["to_patch_embedding.1.weight"])  # [dim, p1*p2*c]
    pe["kernel"] = np.ascontiguousarray(
        w.reshape(dim, kh, kw, cin).transpose(1, 2, 3, 0)
    )
    pe["bias"] = np.asarray(state["to_patch_embedding.1.bias"])
    params["pos_embed"] = np.asarray(state["pos_embedding"])
    params["cls_token"] = np.asarray(state["cls_token"])

    i = 0
    while f"transformer.layers.{i}.0.norm.weight" in state:
        blk = params[f"block{i}"]
        ref = f"transformer.layers.{i}"
        _ln(blk["norm1"], state, f"{ref}.0.norm")
        attn = blk["attn"]
        heads = attn["query"]["kernel"].shape[1]
        head_dim = attn["query"]["kernel"].shape[2]
        qkv = np.asarray(state[f"{ref}.0.fn.to_qkv.weight"])  # [3·inner, dim]
        inner = heads * head_dim
        if qkv.shape[0] != 3 * inner:
            raise KeyError(
                f"ViT converter requires dim_head*heads == dim "
                f"(got to_qkv {qkv.shape}, ours inner={inner})"
            )
        for name, wpart in zip(("query", "key", "value"), np.split(qkv, 3, axis=0)):
            attn[name]["kernel"] = np.ascontiguousarray(
                wpart.transpose(1, 0).reshape(dim, heads, head_dim)
            )
            attn[name]["bias"] = np.zeros((heads, head_dim), np.float32)
        out_w = np.asarray(state[f"{ref}.0.fn.to_out.0.weight"])  # [dim, inner]
        attn["out"]["kernel"] = np.ascontiguousarray(
            out_w.transpose(1, 0).reshape(heads, head_dim, dim)
        )
        attn["out"]["bias"] = np.asarray(state[f"{ref}.0.fn.to_out.0.bias"])
        _ln(blk["norm2"], state, f"{ref}.1.norm")
        blk["fc1"]["kernel"] = _lin_w(state[f"{ref}.1.fn.net.0.weight"])
        blk["fc1"]["bias"] = np.asarray(state[f"{ref}.1.fn.net.0.bias"])
        blk["fc2"]["kernel"] = _lin_w(state[f"{ref}.1.fn.net.3.weight"])
        blk["fc2"]["bias"] = np.asarray(state[f"{ref}.1.fn.net.3.bias"])
        i += 1
    if i == 0:
        raise KeyError(
            "no ViT block keys found (expected transformer.layers.0.0.norm.weight)"
        )


_CONVERTERS = {
    "Conv64F": _convert_convnf,
    "Conv32F": _convert_convnf,
    "R2D2Embedding": _convert_r2d2emb,
    "Conv64F_MCL": _convert_convmcl,
    "WRN": _convert_wrn,
    "resnet12_mcl": _convert_resnet12_dense,
    "resnet12_r2d2": _convert_resnet12_dense,
    "resnet12MTLofficial": _convert_resnet12mtl,
    "ViT": _convert_vit,
    "resnet12": _convert_resnet12,
    "resnet12woLSC": _convert_resnet12,
    "resnet12Bdc": _convert_resnet12bdc,
    "resnet18": _convert_resnet18,
    "resnet18Bdc": _convert_resnet18bdc,
    # downscaling_factors per reference factory (swin_transformer.py:375-423)
    "swin_mini": _swin_with_factors((3, 2, 2, 1)),
    "swin_t": _swin_with_factors((4, 2, 2, 2)),
    "swin_s": _swin_with_factors((4, 2, 2, 2)),
    "swin_b": _swin_with_factors((4, 2, 2, 2)),
    "swin_l": _swin_with_factors((4, 2, 2, 2)),
}


# -- inverse (flax → torch) conversion ---------------------------------------
#
# The migration path in the other direction: our trained variable trees →
# reference state dicts, so the SAME weights can be driven through the
# reference's ``set_forward`` for end-to-end cross-framework parity (the
# "within 0.5 pts" target measured literally).  Each inverse mirrors its
# forward converter above; correctness is pinned by round-trip tests
# (torch → flax → torch reproduces every tensor bit-exactly).


def _inv_conv_w(w: np.ndarray) -> np.ndarray:
    """flax Conv [kh,kw,I,O] → torch Conv2d [O,I,kh,kw]."""
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


def _inv_lin_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(1, 0))


def _inv_bn(state: Dict[str, np.ndarray], key: str, params: Dict, stats: Dict) -> None:
    state[key + ".weight"] = np.asarray(params["scale"])
    state[key + ".bias"] = np.asarray(params["bias"])
    state[key + ".running_mean"] = np.asarray(stats["mean"])
    state[key + ".running_var"] = np.asarray(stats["var"])
    state[key + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _invert_convnf(params, stats, state):
    for i in range(1, 5):
        seq = f"layer{i}"
        state[f"{seq}.0.weight"] = _inv_conv_w(params[seq]["Conv_0"]["kernel"])
        if "bias" in params[seq]["Conv_0"]:
            state[f"{seq}.0.bias"] = np.asarray(params[seq]["Conv_0"]["bias"])
        _inv_bn(
            state, f"{seq}.1",
            params[seq]["BatchNorm_0"]["BatchNorm_0"],
            stats[seq]["BatchNorm_0"]["BatchNorm_0"],
        )
    if "logits_dense" in params:
        _inv_bn(
            state, "logits.1",
            params["logits_bn"]["BatchNorm_0"], stats["logits_bn"]["BatchNorm_0"],
        )
        state["logits.2.weight"] = _inv_lin_w(params["logits_dense"]["kernel"])
        state["logits.2.bias"] = np.asarray(params["logits_dense"]["bias"])


def _invert_resnet12(params, stats, state):
    for i in range(1, 5):
        blk = f"layer{i}.0"
        p, s = params[f"layer{i}"], stats[f"layer{i}"]
        for j in range(1, 4):
            state[f"{blk}.conv{j}.weight"] = _inv_conv_w(p[f"conv{j}"]["kernel"])
            _inv_bn(
                state, f"{blk}.bn{j}",
                p[f"bn{j}"]["BatchNorm_0"], s[f"bn{j}"]["BatchNorm_0"],
            )
        if "downsample_conv" in p:
            state[f"{blk}.downsample.0.weight"] = _inv_conv_w(
                p["downsample_conv"]["kernel"]
            )
            _inv_bn(
                state, f"{blk}.downsample.1",
                p["downsample_bn"]["BatchNorm_0"], s["downsample_bn"]["BatchNorm_0"],
            )


def _invert_resnet12bdc(params, stats, state):
    _invert_resnet12(params, stats, state)
    head_p, head_s = params["bdc_pool"], stats.get("bdc_pool", {})
    if "reduce_conv" in head_p:
        state["bdc_pool.conv_dr_block.0.weight"] = _inv_conv_w(
            head_p["reduce_conv"]["kernel"]
        )
        _inv_bn(
            state, "bdc_pool.conv_dr_block.1",
            head_p["reduce_bn"]["BatchNorm_0"], head_s["reduce_bn"]["BatchNorm_0"],
        )
    state["bdc_pool.temperature"] = np.asarray(head_p["log_temperature"])


def _invert_vit_class_aware(params, stats, state):
    """flax class-aware VisionTransformer (backbones/vit.py) → reference
    vit_class_aware.py state keys.  Inverse of the forward mapping proven
    by tests/test_torch_parity6.py: packed qkv rows re-stacked, flax conv
    kernel HWIO → torch OIHW, MHA head-split kernels re-flattened."""
    state["patch_embed.proj.weight"] = np.ascontiguousarray(
        np.transpose(params["patch_embed"]["kernel"], (3, 2, 0, 1))
    )
    state["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["bias"])
    state["cls_token"] = np.asarray(params["cls_token"])
    state["pos_embed"] = np.asarray(params["pos_embed"])
    if "norm" in params:
        state["norm.weight"] = np.asarray(params["norm"]["scale"])
        state["norm.bias"] = np.asarray(params["norm"]["bias"])
    blocks = sorted(
        (k for k in params if k.startswith("block")),
        key=lambda k: int(k[len("block"):]),
    )
    for i, bk in enumerate(blocks):
        b = params[bk]
        dim = b["fc2"]["kernel"].shape[-1]
        for ln in ("norm1", "norm2"):
            state[f"blocks.{i}.{ln}.weight"] = np.asarray(b[ln]["scale"])
            state[f"blocks.{i}.{ln}.bias"] = np.asarray(b[ln]["bias"])
        attn = b["attn"]

        def flat_in(tree):
            # [dim, heads, hd] → torch [dim_out, dim_in] row-major
            return np.ascontiguousarray(
                np.asarray(tree["kernel"]).reshape(dim, dim).T
            ), np.asarray(tree["bias"]).reshape(dim)

        q_w, q_b = flat_in(attn["query"])
        k_w, k_b = flat_in(attn["key"])
        v_w, v_b = flat_in(attn["value"])
        state[f"blocks.{i}.attn.qkv.weight"] = np.concatenate(
            [q_w, k_w, v_w], axis=0
        )
        state[f"blocks.{i}.attn.qkv.bias"] = np.concatenate([q_b, k_b, v_b])
        state[f"blocks.{i}.attn.proj.weight"] = np.ascontiguousarray(
            np.asarray(attn["out"]["kernel"]).reshape(dim, dim).T
        )
        state[f"blocks.{i}.attn.proj.bias"] = np.asarray(attn["out"]["bias"])
        for fc in ("fc1", "fc2"):
            state[f"blocks.{i}.mlp.{fc}.weight"] = np.ascontiguousarray(
                np.asarray(b[fc]["kernel"]).T
            )
            state[f"blocks.{i}.mlp.{fc}.bias"] = np.asarray(b[fc]["bias"])


_INVERTERS = {
    "Conv64F": _invert_convnf,
    "Conv32F": _invert_convnf,
    "VisionTransformer": _invert_vit_class_aware,
    "resnet12": _invert_resnet12,
    "resnet12woLSC": _invert_resnet12,
    "resnet12Bdc": _invert_resnet12bdc,
}


def invert_backbone_params(
    variables: Dict[str, Any], backbone_name: str, prefix: str = "emb_func."
) -> Dict[str, np.ndarray]:
    """Map our backbone variable tree → a reference torch state dict.

    ``variables`` is either the full tree (``{"params": {"emb_func": ...},
    "batch_stats": {...}}``) or an already-sliced backbone tree
    (``{"params": ..., "batch_stats": ...}``).  Keys get ``prefix`` so the
    dict loads into a full reference model's ``emb_func`` (pass ``""`` for a
    bare backbone module)."""
    if backbone_name not in _INVERTERS:
        raise KeyError(
            f"no inverse converter for backbone {backbone_name!r}; "
            f"supported: {sorted(_INVERTERS)}"
        )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if "emb_func" in params:
        params = params["emb_func"]
        stats = stats.get("emb_func", {})
    state: Dict[str, np.ndarray] = {}
    _INVERTERS[backbone_name](
        jax_tree_to_numpy(params), jax_tree_to_numpy(stats), state
    )
    return {prefix + k: v for k, v in state.items()}


def jax_tree_to_numpy(tree: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def convert_backbone_state_dict(
    state: Dict[str, np.ndarray],
    backbone_name: str,
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference backbone state dict onto a copy of ``template``
    (``{"params": ..., "batch_stats": ...}`` from our backbone's init).

    Returns the filled tree; raises KeyError on unknown backbones and on
    missing reference keys (shape/naming drift should fail loudly)."""
    import copy

    if backbone_name not in _CONVERTERS:
        raise KeyError(
            f"no converter for backbone {backbone_name!r}; supported: "
            f"{sorted(_CONVERTERS)}"
        )
    state = strip_prefix({k: np.asarray(v) for k, v in state.items()})
    out = copy.deepcopy(
        {
            "params": template["params"],
            "batch_stats": template.get("batch_stats", {}),
        }
    )
    out = {col: jax_tree_to_numpy(tree) for col, tree in out.items()}
    _CONVERTERS[backbone_name](state, out["params"], out["batch_stats"])
    return out
