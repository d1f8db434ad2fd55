"""LR-schedule parity against the torch reference oracle.

Steps the reference's actual ``GradualWarmupScheduler`` (reference
utils/utils.py:330-426) wrapped around real ``torch.optim.lr_scheduler``
schedulers exactly as the reference trainer does (construct → read LR for
the epoch → ``scheduler.step()`` after the epoch, trainer.py:108,583), and
asserts ``optim.LRScheduler.scale(epoch) * base_lr`` reproduces the
per-epoch LR sequence — including the warmup hand-off at epoch
``warmup-1`` and the reference's T_max/milestone shrinking."""

import copy

import numpy as np
import pytest
import torch

from ref_loader import load_ref  # noqa: E402

from audio_fewshot_tpu.optim import LRScheduler

BASE_LR = 0.01


def ref_lr_sequence(scheduler_cfg, warmup, epochs):
    u = load_ref("libfewshot_core.utils.utils")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    config = {
        "epoch": epochs,
        "warmup": warmup,
        "lr_scheduler": copy.deepcopy(scheduler_cfg),
    }
    sched = u.GradualWarmupScheduler(opt, config)
    lrs = []
    for _ in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return lrs


def ours_lr_sequence(scheduler_cfg, warmup, epochs):
    s = LRScheduler(scheduler_cfg["name"], copy.deepcopy(scheduler_cfg["kwargs"]),
                    epochs=epochs, warmup=warmup, base_lr=BASE_LR)
    return [BASE_LR * s.scale(e) for e in range(epochs)]


CASES = [
    ({"name": "StepLR", "kwargs": {"step_size": 3, "gamma": 0.5}}, 0),
    ({"name": "StepLR", "kwargs": {"step_size": 3, "gamma": 0.5}}, 4),
    ({"name": "MultiStepLR", "kwargs": {"milestones": [4, 8], "gamma": 0.1}}, 0),
    ({"name": "MultiStepLR", "kwargs": {"milestones": [4, 8], "gamma": 0.1}}, 3),
    ({"name": "ExponentialLR", "kwargs": {"gamma": 0.9}}, 0),
    ({"name": "ExponentialLR", "kwargs": {"gamma": 0.9}}, 2),
    ({"name": "CosineAnnealingLR", "kwargs": {"T_max": 10, "eta_min": 0.0}}, 0),
    ({"name": "CosineAnnealingLR", "kwargs": {"T_max": 10, "eta_min": 0.0}}, 3),
    ({"name": "LambdaLR",
      "kwargs": {"lr_lambda": "lambda e: 0.5 ** (e // 4)"}}, 0),
]


@pytest.mark.parametrize("cfg,warmup", CASES,
                         ids=[f"{c['name']}-w{w}" for c, w in CASES])
def test_schedule_matches_reference(cfg, warmup):
    epochs = 12
    ref = ref_lr_sequence(cfg, warmup, epochs)
    ours = ours_lr_sequence(cfg, warmup, epochs)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, err_msg=f"{cfg} w={warmup}")


def test_cosine_eta_min_is_absolute_floor():
    """torch's eta_min is an ABSOLUTE LR, not a fraction of base_lr —
    pinned against torch.optim.lr_scheduler.CosineAnnealingLR directly
    (the shipped configs all use 0.0, which masked the old relative
    interpretation)."""
    eta_min = 2e-3  # 20% of BASE_LR — a relative reading would give 2e-5
    t_max = 8
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=t_max, eta_min=eta_min
    )
    ref = []
    for _ in range(t_max + 1):
        ref.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    s = LRScheduler("CosineAnnealingLR", {"T_max": t_max, "eta_min": eta_min},
                    epochs=t_max + 1, warmup=0, base_lr=BASE_LR)
    ours = [BASE_LR * s.scale(e) for e in range(t_max + 1)]
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)
    assert abs(ours[t_max] - eta_min) < 1e-9  # the floor is absolute


def test_plateau_rel_threshold_and_cooldown_match_torch():
    """ReduceLROnPlateau parity on torch DEFAULTS (threshold_mode='rel')
    plus a cooldown, over a crafted metric sequence that distinguishes
    rel from abs thresholds and exercises the cooldown window."""
    kwargs = {"mode": "min", "factor": 0.5, "patience": 1,
              "threshold": 1e-2, "cooldown": 2}
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **kwargs)
    # 100 -> 99.5 is NOT a rel improvement (needs < 99) but IS an absolute
    # one; then stagnate to trigger reductions and ride the cooldown
    metrics = [100.0, 99.5, 99.4, 99.3, 99.2, 99.1, 99.0, 50.0, 49.9, 49.8,
               49.7, 49.6]
    ref = []
    for m in metrics:
        sched.step(m)
        ref.append(opt.param_groups[0]["lr"])
    s = LRScheduler("ReduceLROnPlateau", dict(kwargs), epochs=len(metrics),
                    warmup=0, base_lr=BASE_LR)
    ours = []
    for e, m in enumerate(metrics):
        s.step(m)
        ours.append(BASE_LR * s.scale(e + 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-12)
