"""Optimizers and LR schedules with torch-compatible YAML semantics.

Reference surface (trainer.py:519-609): ``optimizer.name/kwargs`` builds a
torch optimizer; ``optimizer.other: {submodule: lr}`` gives per-submodule
learning rates (resolved with ``eval`` in the reference — here by top-level
params key); ``lr_scheduler.name/kwargs`` builds a per-EPOCH scheduler
(stepped once per epoch at trainer.py:108), optionally wrapped in
``GradualWarmupScheduler`` (utils/utils.py:330-426).

TPU design: the scheduler runs on the HOST (it's one float per epoch —
exactly the reference's granularity), and the per-group learning rate enters
the jitted train step as a traced scalar, so LR changes never trigger
recompilation.  The jitted side is a "core" optax transform (adam moments /
sgd momentum) whose updates are scaled by the traced per-group LR.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax  # noqa: E402


# -- core gradient transforms (LR applied separately) ------------------------

def _add_decayed_weights_where_trained(wd: float) -> optax.GradientTransformation:
    """Coupled weight decay that SKIPS structurally-frozen leaves.  torch
    optimizers never see frozen (``requires_grad=False``) params at all;
    here "frozen" surfaces as identically-zero grads EVERY step
    (``stop_gradient`` — MtlConv base kernels, LEO's frozen backbone), and
    plain ``add_decayed_weights`` would silently decay those pretrained
    weights toward zero.

    The gate is "has this leaf EVER produced a nonzero gradient" (one bool
    per leaf in the optimizer state), not the current step's gradient — a
    TRAINED leaf that is transiently all-zero (e.g. a dead ReLU filter)
    must keep decaying like torch does."""

    def init(params):
        return {
            "seen_nonzero": jax.tree_util.tree_map(
                lambda p: jnp.zeros((), bool), params
            )
        }

    def update(updates, state, params=None):
        seen = jax.tree_util.tree_map(
            lambda s, g: s | jnp.any(g != 0), state["seen_nonzero"], updates
        )
        new = jax.tree_util.tree_map(
            lambda g, p, s: g + wd * p * s.astype(p.dtype),
            updates, params, seen,
        )
        return new, {"seen_nonzero": seen}

    return optax.GradientTransformation(init, update)


def _core_transform(name: str, kwargs: Dict[str, Any]) -> Tuple[optax.GradientTransformation, float]:
    """Build the LR-free part of the named optimizer.  Returns
    (transform, base_lr).  Weight decay follows torch semantics: coupled
    (added to the gradient) for SGD/Adam, decoupled for AdamW."""
    kwargs = dict(kwargs or {})
    lr = float(kwargs.pop("lr", 1e-3))
    wd = float(kwargs.pop("weight_decay", 0.0) or 0.0)
    name = name.lower()
    decay = lambda: _add_decayed_weights_where_trained(wd)
    parts = []
    if name in ("adam", "adamw"):
        b1, b2 = kwargs.pop("betas", (0.9, 0.999))
        eps = float(kwargs.pop("eps", 1e-8))
        if name == "adam" and wd:
            parts.append(decay())  # torch Adam couples wd into grad
        parts.append(optax.scale_by_adam(b1=float(b1), b2=float(b2), eps=eps))
        if name == "adamw" and wd:
            parts.append(decay())
    elif name == "sgd":
        momentum = float(kwargs.pop("momentum", 0.0) or 0.0)
        nesterov = bool(kwargs.pop("nesterov", False))
        if wd:
            parts.append(decay())
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif name == "rmsprop":
        alpha = float(kwargs.pop("alpha", 0.99))
        eps = float(kwargs.pop("eps", 1e-8))
        momentum = float(kwargs.pop("momentum", 0.0) or 0.0)
        if wd:
            parts.append(decay())
        parts.append(optax.scale_by_rms(decay=alpha, eps=eps))
        if momentum:
            parts.append(optax.trace(decay=momentum))
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    tx = optax.chain(*parts) if parts else optax.identity()
    return tx, lr


class Optimizer:
    """Per-group optimizer: core transform + traced per-group LR scaling.

    ``group_lrs`` maps top-level params keys (e.g. ``emb_func``) to base LRs
    (reference ``optimizer.other``); everything else uses the default LR.
    """

    def __init__(self, config_opt: Dict[str, Any]):
        self.tx, self.base_lr = _core_transform(
            config_opt.get("name", "Adam"), config_opt.get("kwargs")
        )
        other = config_opt.get("other") or {}
        self.group_lrs: Dict[str, float] = {k: float(v) for k, v in other.items()}

    def init(self, params) -> optax.OptState:
        return self.tx.init(params)

    def lr_tree(self, params, scale: float = 1.0) -> Dict[str, float]:
        """Host-side per-group LR dict for the current epoch."""
        return {
            k: self.group_lrs.get(k, self.base_lr) * scale for k in params.keys()
        }

    def apply(self, grads, opt_state, params, lr_groups: Dict[str, jnp.ndarray]):
        """One update step.  ``lr_groups`` values are traced scalars keyed by
        top-level params key."""
        updates, opt_state = self.tx.update(grads, opt_state, params)
        scaled = {
            k: jax.tree_util.tree_map(lambda u: -lr_groups[k] * u, sub)
            for k, sub in updates.items()
        }
        params = optax.apply_updates(params, scaled)
        return params, opt_state


# -- epoch-level LR schedulers (torch semantics) -----------------------------

class LRScheduler:
    """Multiplier(epoch) with optional plateau feedback.  ``scale(epoch)``
    returns the factor applied to base LRs for that epoch; call
    ``step(metric)`` once per epoch afterwards (plateau bookkeeping)."""

    def __init__(self, name: str, kwargs: Dict[str, Any], epochs: int,
                 warmup: int = 0, base_lr: float = 1.0):
        self.name = name
        self.kwargs = dict(kwargs or {})
        self.epochs = epochs
        self.warmup = int(warmup or 0)
        self.base_lr = float(base_lr) or 1.0
        if self.warmup:
            # reference GradualWarmupScheduler.get_after_scheduler
            # (utils/utils.py:350-360) shrinks the after-scheduler horizon
            # by warmup-1 epochs (the after-scheduler takes over AT epoch
            # warmup-1, see scale())
            if name == "CosineAnnealingLR" and "T_max" in self.kwargs:
                self.kwargs["T_max"] = int(self.kwargs["T_max"]) - (self.warmup - 1)
            elif name == "MultiStepLR" and self.kwargs.get("milestones"):
                self.kwargs["milestones"] = [
                    int(m) - self.warmup + 1 for m in self.kwargs["milestones"]
                ]
        self._plateau_scale = 1.0
        self._best: Optional[float] = None
        self._bad = 0
        self._cooldown = 0

    def _base_scale(self, epoch: int) -> float:
        k = self.kwargs
        name = self.name
        if name == "StepLR":
            return float(k.get("gamma", 0.1)) ** (epoch // int(k.get("step_size", 30)))
        if name == "MultiStepLR":
            ms = sorted(k.get("milestones", []))
            passed = sum(1 for m in ms if epoch >= int(m))
            return float(k.get("gamma", 0.1)) ** passed
        if name == "ExponentialLR":
            return float(k.get("gamma", 0.95)) ** epoch
        if name == "CosineAnnealingLR":
            t_max = int(k.get("T_max", self.epochs or 1))
            # torch's eta_min is an ABSOLUTE LR floor — convert to a scale
            # against the optimizer's base LR (same convention as the
            # plateau min_lr below).  NO clamp at T_max — torch's closed
            # form is periodic (the LR climbs back up past T_max), and
            # reference runs do exceed T_max epochs
            eta_scale = float(k.get("eta_min", 0.0)) / self.base_lr
            cos = 0.5 * (1 + math.cos(math.pi * epoch / max(t_max, 1)))
            return eta_scale + (1.0 - eta_scale) * cos
        if name == "ConstantLR" or name is None:
            return 1.0
        if name == "LambdaLR":
            # reference builds LambdaLR with an eval'd lambda string
            fn = k.get("lr_lambda")
            if isinstance(fn, str):
                # reference parity (trainer.py:570 eval's the string) — but
                # evaluated in a restricted namespace: no builtins, only math
                fn = eval(  # noqa: S307
                    fn, {"__builtins__": {}}, {"math": math}
                )
            return float(fn(epoch)) if fn else 1.0
        if name == "ReduceLROnPlateau":
            return 1.0  # handled by _plateau_scale
        raise ValueError(f"unknown lr_scheduler {name!r}")

    def scale(self, epoch: int) -> float:
        # GradualWarmupScheduler semantics (reference utils/utils.py:373-381):
        # epochs 0..warmup-2 ramp linearly at (e+1)/warmup; the
        # after-scheduler takes over AT epoch warmup-1 (index 0), with its
        # horizon pre-shrunk by warmup-1 in __init__
        if self.warmup and epoch < self.warmup - 1:
            return float(epoch + 1) / float(self.warmup) * self._plateau_scale
        shift = self.warmup - 1 if self.warmup else 0
        return self._base_scale(max(0, epoch - shift)) * self._plateau_scale

    def step(self, metric: Optional[float] = None) -> None:
        if self.name != "ReduceLROnPlateau" or metric is None:
            return
        k = self.kwargs
        mode = k.get("mode", "min")
        thr = float(k.get("threshold", 1e-4))
        # torch's DEFAULT threshold_mode is 'rel': improvement relative to
        # the best metric's magnitude, not an absolute margin
        rel = str(k.get("threshold_mode", "rel")) == "rel"
        if self._best is None:
            better = True
        elif mode == "min":
            bar = self._best * (1.0 - thr) if rel else self._best - thr
            better = metric < bar
        else:
            bar = self._best * (1.0 + thr) if rel else self._best + thr
            better = metric > bar
        if better:
            self._best = metric
            self._bad = 0
            if self._cooldown:
                self._cooldown -= 1
            return
        if self._cooldown:
            # torch ignores bad epochs while cooling down after a reduction
            self._cooldown -= 1
            self._bad = 0
            return
        self._bad += 1
        if self._bad > int(k.get("patience", 10)):
            factor = float(k.get("factor", 0.1))
            # torch min_lr is an ABSOLUTE learning-rate floor — convert
            # to a scale floor against the optimizer's base LR
            min_scale = float(k.get("min_lr", 0.0)) / self.base_lr
            self._plateau_scale = max(self._plateau_scale * factor, min_scale)
            self._bad = 0
            self._cooldown = int(k.get("cooldown", 0))

    # -- state for resume ---------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        return {
            "plateau_scale": self._plateau_scale,
            "best": self._best,
            "bad": self._bad,
            "cooldown": self._cooldown,
        }

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self._plateau_scale = state.get("plateau_scale", 1.0)
        self._best = state.get("best")
        self._bad = state.get("bad", 0)
        self._cooldown = state.get("cooldown", 0)


def build_optimizer(config: Dict[str, Any]) -> Optimizer:
    return Optimizer(config.get("optimizer") or {"name": "Adam"})


def build_scheduler(config: Dict[str, Any]) -> LRScheduler:
    sched = config.get("lr_scheduler") or {"name": "ConstantLR", "kwargs": {}}
    opt_kwargs = (config.get("optimizer") or {}).get("kwargs") or {}
    return LRScheduler(
        sched.get("name", "ConstantLR"),
        sched.get("kwargs") or {},
        epochs=int(config.get("epoch", 1)),
        warmup=int(config.get("warmup", 0) or 0),
        base_lr=float(opt_kwargs.get("lr", 1e-3)),
    )
