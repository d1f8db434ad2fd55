"""Trained-weight cross-framework end-to-end parity (the "within 0.5 pts"
target measured literally — VERDICT r2 item 1).

Drives the SAME trained weights through BOTH frameworks on IDENTICAL
episodes and compares per-episode segment logits and clip-level accuracy:

- ours: the jitted eval path (``MethodBase.forward`` +
  ``eval_episode_accuracy``) over packed ``EpisodeBatch``es;
- reference: the torch model's ``set_forward`` (proto_net.py:80-113,
  deepbdc.py:272-319) over the reference's flat ragged batch layout
  (``(image, target, repeats, support_size)``, abstract_model.py:176-292),
  with our trained variables mapped in by
  ``utils.torch_convert.invert_backbone_params``.

Importable pieces are reused by tests/test_cross_framework.py; the CLI runs
the full protocol against a trained result dir and prints a report row.

Usage:
    python tools/cross_framework_parity.py <result_dir> [--episodes 400]
        [--batches-per-epoch 100] [--seed 0]
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys
from typing import Any, Dict, List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


# -- reference-side harness ---------------------------------------------------


@contextlib.contextmanager
def cuda_to_cpu():
    """The reference's eval paths hard-code ``.to('cuda')`` (e.g.
    proto_net.py:107-110); route those to CPU for oracle runs."""
    import torch

    orig = torch.Tensor.to
    orig_cuda = torch.Tensor.cuda

    def patched(self, *args, **kwargs):
        args = tuple(
            "cpu"
            if isinstance(a, (str, torch.device)) and str(a).startswith("cuda")
            else a
            for a in args
        )
        if "device" in kwargs and str(kwargs["device"]).startswith("cuda"):
            kwargs["device"] = "cpu"
        return orig(self, *args, **kwargs)

    torch.Tensor.to = patched
    # BatchNorm2d_fw hard-codes ``.cuda()`` on its fresh stats
    # (maml_module.py:85-86) — identity on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.to = orig
        torch.Tensor.cuda = orig_cuda


def episode_batch_to_reference(
    batch, way: int, shot: int, query_num: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Convert a (numpy) ``EpisodeBatch`` to the reference's flat 4-tuple.

    Reference layout (abstract_model.py:231-292): per episode, per way —
    ``shot`` support rows, then ALL segments of that way's query clips in
    clip-major order; ``repeats`` is the per-query-clip segment count in
    (episode, way, clip) order; ``support_size`` the total support rows.
    """
    sup = np.asarray(batch.support)
    qry = np.asarray(batch.query)
    clip = np.asarray(batch.query_clip)
    mask = np.asarray(batch.query_mask) > 0
    gt = None if batch.global_target is None else np.asarray(batch.global_target)
    e = sup.shape[0]
    wq = way * query_num
    rows: List[np.ndarray] = []
    repeats = np.zeros((e, wq), dtype=np.int64)
    targets: List[np.ndarray] = []
    for i in range(e):
        for c in range(wq):
            repeats[i, c] = int(np.sum(mask[i] & (clip[i] == c)))
        for w in range(way):
            rows.append(sup[i, w * shot : (w + 1) * shot])
            if gt is not None:
                targets.append(gt[i, w * shot : (w + 1) * shot])
            for q in range(query_num):
                c = w * query_num + q
                sel = mask[i] & (clip[i] == c)
                rows.append(qry[i][sel])
                if gt is not None:
                    targets.append(
                        np.full(int(sel.sum()), gt[i, way * shot + c], np.int64)
                    )
    images = np.concatenate(rows, axis=0)
    target = (
        np.concatenate(targets) if targets else np.zeros(len(images), np.int64)
    )
    return images, target, repeats.reshape(-1), e * way * shot


def build_reference_model(
    method: str,
    backbone: str,
    backbone_kwargs: Dict[str, Any],
    way: int,
    shot: int,
    query: int,
    state_dict: Dict[str, np.ndarray],
):
    """Instantiate the reference model on CPU and load ``state_dict``
    (numpy values, full-model keys e.g. ``emb_func.layer1.0.weight``)."""
    import torch

    from ref_loader import load_ref

    bk_mod = {
        "Conv64F": "libfewshot_core.model.backbone.conv_four",
        "resnet12Bdc": "libfewshot_core.model.backbone.resnet_bdc",
    }[backbone]
    emb = getattr(load_ref(bk_mod), backbone)(**backbone_kwargs)
    cls_mod = {
        "ProtoNet": "libfewshot_core.model.metric.proto_net",
        "DeepBDC": "libfewshot_core.model.metric.deepbdc",
    }[method]
    kwargs = dict(
        init_type="normal", way_num=way, shot_num=shot, query_num=query,
        emb_func=emb, device="cpu",
    )
    model = getattr(load_ref(cls_mod), method)(**kwargs)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # only non-parameter bookkeeping may be absent; any real weight mismatch
    # is a conversion bug — fail loudly.  The reference Conv64F constructs
    # its 1600-d ``logits`` projection unconditionally but applies it only
    # when is_flatten (conv_four.py:87-92,117-119) — absent from our tree
    # when unused.
    converted_logits_head = any(".logits." in k for k in state_dict)
    real_missing = [
        m for m in missing
        if not m.endswith("num_batches_tracked")
        and not (".logits." in m and not converted_logits_head)
    ]
    if real_missing or unexpected:
        raise KeyError(
            f"state dict mismatch: missing={real_missing} "
            f"unexpected={list(unexpected)}"
        )
    model.eval()
    return model


def run_reference_eval(
    model, batches, way: int, shot: int, query: int
) -> Tuple[List[np.ndarray], List[float]]:
    """Reference ``set_forward`` over converted batches → per-batch flat
    segment logits + clip-level accuracy (%)."""
    import torch

    logits_out: List[np.ndarray] = []
    accs: List[float] = []
    with cuda_to_cpu(), torch.no_grad():
        for b in batches:
            images, target, repeats, support_size = episode_batch_to_reference(
                b, way, shot, query
            )
            out, acc = model.set_forward(
                (
                    torch.from_numpy(np.ascontiguousarray(images)),
                    torch.from_numpy(target),
                    torch.from_numpy(repeats),
                    support_size,
                )
            )
            logits_out.append(out.detach().cpu().numpy())
            accs.append(float(acc) if np.ndim(acc) == 0 else float(acc.item()))
    return logits_out, accs


# -- our side -----------------------------------------------------------------


def run_ours_eval(method, variables, batches, setting):
    """Our eval path over the same batches → per-batch valid segment logits
    (reference flat order) + per-episode accuracies."""
    import jax

    fwd = jax.jit(method.forward, static_argnames=("setting",))
    acc_fn = jax.jit(method.eval_episode_accuracy)
    logits_out: List[np.ndarray] = []
    accs: List[float] = []
    for b in batches:
        seg_logits = np.asarray(fwd(variables, b, setting))
        ep_acc = np.asarray(acc_fn(jax.numpy.asarray(seg_logits), b))
        mask = np.asarray(b.query_mask) > 0
        # packed order is clip-major with a valid prefix per episode —
        # identical to the reference's flat order (episode.py packing)
        flat = np.concatenate(
            [seg_logits[i][mask[i]] for i in range(mask.shape[0])], axis=0
        )
        logits_out.append(flat)
        accs.extend(ep_acc.ravel().tolist())
    return logits_out, accs


def compare(
    ours_logits, ref_logits, ours_accs, ref_accs, label: str
) -> Dict[str, float]:
    ours_cat = np.concatenate(ours_logits, axis=0)
    ref_cat = np.concatenate(ref_logits, axis=0)
    assert ours_cat.shape == ref_cat.shape, (ours_cat.shape, ref_cat.shape)
    max_abs = float(np.max(np.abs(ours_cat - ref_cat)))
    # euclid logits have magnitude ~‖feat‖² — scale-relative drift is the
    # meaningful fp32 cross-framework comparison
    rel = float(max_abs / max(np.max(np.abs(ref_cat)), 1e-6))
    # prediction agreement per segment
    agree = float(
        np.mean(np.argmax(ours_cat, -1) == np.argmax(ref_cat, -1))
    )
    acc_ours = float(np.mean(ours_accs))
    # vote_catagorical_acc already returns percent (utils.py:432-433)
    acc_ref = float(np.mean(ref_accs))
    row = {
        "method": label,
        "episodes": len(ours_accs),
        "acc_ours": acc_ours,
        "acc_ref": acc_ref,
        "acc_diff": abs(acc_ours - acc_ref),
        "max_abs_logit_diff": max_abs,
        "rel_logit_diff": rel,
        "segment_pred_agreement": agree,
    }
    return row


# -- CLI ----------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("result_dir")
    ap.add_argument("--episodes", type=int, default=400)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from audio_fewshot_tpu.config import Config
    from audio_fewshot_tpu.data import get_dataloader
    from audio_fewshot_tpu.models import build_method, eval_setting
    from audio_fewshot_tpu.models.base import EpisodeSetting
    from audio_fewshot_tpu.utils import load_variables
    from audio_fewshot_tpu.utils.torch_convert import invert_backbone_params

    cfg = Config(os.path.join(args.result_dir, "config.yaml")).get_config_dict()
    cfg["test_episode"] = args.episodes
    cfg["device_data_bank"] = False
    cfg["prefetch"] = 0
    method = build_method(cfg)
    setting = eval_setting(cfg)
    way = setting.way
    shot, query = setting.shot, setting.query

    loader = get_dataloader(cfg, "test", method.model_type, False, "audio")[0]
    batches = list(loader.epoch(0))

    import jax.random as jrandom

    variables = method.init_variables(
        jrandom.PRNGKey(0), batches[0], setting
    )
    ckpt = os.path.join(args.result_dir, "checkpoints", "model_best.pth")
    variables = load_variables(ckpt, variables)

    print(f"[ours] evaluating {len(batches)} batches ...", flush=True)
    ours_logits, ours_accs = run_ours_eval(method, variables, batches, setting)

    bk_name = cfg["backbone"]["name"]
    state = invert_backbone_params(variables, bk_name)
    bk_kwargs = dict(cfg["backbone"].get("kwargs") or {})
    print("[ref ] building torch model ...", flush=True)
    model = build_reference_model(
        cfg["classifier"]["name"], bk_name, bk_kwargs, way, shot, query, state
    )
    print(f"[ref ] evaluating {len(batches)} batches ...", flush=True)
    ref_logits, ref_accs = run_reference_eval(model, batches, way, shot, query)

    row = compare(
        ours_logits, ref_logits, ours_accs, ref_accs,
        f"{cfg['classifier']['name']}/{bk_name}",
    )
    import json

    print(json.dumps(row))
    ok = row["acc_diff"] <= 0.5
    print(
        f"acc ours {row['acc_ours']:.2f} vs torch {row['acc_ref']:.2f} "
        f"(diff {row['acc_diff']:.3f} pts, max|Δlogit| "
        f"{row['max_abs_logit_diff']:.2e}) → {'OK' if ok else 'FAIL'}"
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
