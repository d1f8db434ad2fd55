"""Checkpoint I/O with the reference's best/last/part semantics.

Reference ``save_model`` (libfewshot_core/utils/utils.py:207-265): BEST and
NORMAL checkpoints hold model weights only; LAST holds the full training
state (epoch, model, optimizer, scheduler, best accuracies); sub-module
checkpoints (``save_part``, default ``[emb_func]``) feed the pretrain →
meta-train pipeline via ``pretrain_path`` (trainer.py:463-473).

Serialization is flax msgpack (single-file, mmap-free, atomic-rename safe).
"""

from __future__ import annotations

import enum
import os
from typing import Any, Dict, Optional

from flax import serialization


class SaveType(enum.Enum):  # reference utils/enum_type.py
    BEST = 0
    NORMAL = 1
    LAST = 2


def _atomic_write(path: str, payload: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    _atomic_write(path, serialization.to_bytes(variables))


def load_variables(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_model(
    ckpt_dir: str,
    variables: Dict[str, Any],
    epoch: int,
    save_type: SaveType,
    train_state: Optional[Dict[str, Any]] = None,
    save_part: Optional[list] = None,
) -> None:
    """Write checkpoints following the reference naming scheme:
    ``model_best.pth`` / ``model_{epoch:05d}.pth`` / ``model_last.pth`` and
    per-part files ``{part}_best.pth`` etc.  ``.pth`` extension kept so result
    dirs look identical to the reference's."""
    os.makedirs(ckpt_dir, exist_ok=True)
    if save_type == SaveType.BEST:
        stem = "model_best"
    elif save_type == SaveType.NORMAL:
        stem = f"model_{epoch:05d}"
    else:
        stem = "model_last"

    if save_type == SaveType.LAST:
        payload = {"epoch": epoch, "variables": variables}
        payload.update(train_state or {})
        _atomic_write(os.path.join(ckpt_dir, stem + ".pth"), serialization.to_bytes(payload))
    else:
        save_variables(os.path.join(ckpt_dir, stem + ".pth"), variables)

    suffix = stem.replace("model", "{part}")
    for part in save_part or []:
        sub = _extract_part(variables, part)
        if sub is not None:
            save_variables(
                os.path.join(ckpt_dir, suffix.format(part=part) + ".pth"), sub
            )


def _extract_part(variables: Dict[str, Any], part: str) -> Optional[Dict[str, Any]]:
    """Slice out one sub-module's variables across all collections
    (params / batch_stats / ...)."""
    out: Dict[str, Any] = {}
    for col, tree in variables.items():
        if isinstance(tree, dict) and part in tree:
            out[col] = {part: tree[part]}
    return out or None


def load_part(
    path: str, variables: Dict[str, Any], part: str = "emb_func"
) -> Dict[str, Any]:
    """Load a sub-module checkpoint into a full variable tree
    (reference ``pretrain_path`` flow, trainer.py:463-473)."""
    template = _extract_part(variables, part)
    if template is None:
        raise KeyError(f"part {part!r} not present in variables")
    loaded = load_variables(path, template)
    merged = {col: dict(tree) for col, tree in variables.items()}
    for col, tree in loaded.items():
        merged.setdefault(col, {})
        merged[col] = dict(merged[col])
        merged[col][part] = tree[part]
    return merged


def load_last(path: str, variables_template: Dict[str, Any],
              opt_state_template: Any = None) -> Dict[str, Any]:
    with open(path, "rb") as f:
        raw = f.read()
    # tolerate extra keys by deserializing loosely, then restoring the
    # structured members against their templates
    loose = serialization.msgpack_restore(raw)
    out = dict(loose)
    out["variables"] = serialization.from_state_dict(
        variables_template, loose["variables"]
    )
    if opt_state_template is not None and "opt_state" in loose:
        out["opt_state"] = serialization.from_state_dict(
            opt_state_template, loose["opt_state"]
        )
    return out
