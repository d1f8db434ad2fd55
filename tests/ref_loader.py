"""Import leaf modules of the read-only PyTorch reference for numerical
parity tests.

The reference package's ``__init__`` chains (libfewshot_core → trainer →
model → backbone → vit_class_aware) require ``timm`` and the snapshot-missing
``libfewshot_core.data`` package, so the package inits cannot execute.  We
register stub parent packages (module objects with only ``__path__``) and
import the leaf modules directly — their relative/absolute imports resolve
through the stubs to the real files.  Nothing from the reference is copied;
it is imported as an oracle.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"

# parents whose real __init__ would pull in missing deps / the whole world
_STUB_PKGS = (
    "libfewshot_core",
    "libfewshot_core.model",
    "libfewshot_core.model.backbone",
    "libfewshot_core.model.metric",
    "libfewshot_core.model.meta",
    "libfewshot_core.model.finetuning",
)


def _ensure_stubs() -> None:
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    created = False
    for name in _STUB_PKGS:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__path__ = [REF_ROOT + "/" + name.replace(".", "/")]
        sys.modules[name] = mod
        created = True
    if created:
        # the real ``model`` package re-exports the losses; several leaves
        # import them from the parent (``from .. import DistillKLLoss`` —
        # rfs_model.py:35, skd_model.py:33, deepbdc_pretrain.py:23)
        loss_mod = importlib.import_module("libfewshot_core.model.loss")
        pkg = sys.modules["libfewshot_core.model"]
        for sym in ("DistillKLLoss", "L2DistLoss", "LabelSmoothCELoss"):
            if hasattr(loss_mod, sym):
                setattr(pkg, sym, getattr(loss_mod, sym))


def load_ref(name: str):
    """Import a reference module (e.g.
    ``libfewshot_core.model.metric.proto_net``) behind the stub parents."""
    _ensure_stubs()
    return importlib.import_module(name)
