"""Optimizer / LR-scheduler tests (torch-semantics parity, per-group LRs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_fewshot_tpu.optim import LRScheduler, build_optimizer


def test_steplr():
    s = LRScheduler("StepLR", {"gamma": 0.5, "step_size": 2}, epochs=10)
    assert [s.scale(e) for e in range(6)] == [1.0, 1.0, 0.5, 0.5, 0.25, 0.25]


def test_multistep():
    s = LRScheduler("MultiStepLR", {"milestones": [2, 4], "gamma": 0.1}, epochs=10)
    assert s.scale(1) == 1.0
    assert s.scale(2) == pytest.approx(0.1)
    assert s.scale(4) == pytest.approx(0.01)


def test_cosine():
    s = LRScheduler("CosineAnnealingLR", {"T_max": 10, "eta_min": 0}, epochs=10)
    assert s.scale(0) == pytest.approx(1.0)
    assert s.scale(5) == pytest.approx(0.5)
    assert s.scale(10) == pytest.approx(0.0, abs=1e-12)


def test_warmup():
    s = LRScheduler("StepLR", {"gamma": 1.0, "step_size": 100}, epochs=10, warmup=4)
    assert [s.scale(e) for e in range(5)] == [0.25, 0.5, 0.75, 1.0, 1.0]


def test_plateau():
    s = LRScheduler("ReduceLROnPlateau", {"patience": 1, "factor": 0.5, "mode": "min"},
                    epochs=20)
    assert s.scale(0) == 1.0
    s.step(1.0)
    s.step(1.0)  # bad 1
    s.step(1.0)  # bad 2 > patience → cut
    assert s.scale(3) == 0.5


def test_per_group_lr_and_apply():
    opt = build_optimizer({
        "optimizer": {"name": "Adam", "kwargs": {"lr": 0.005},
                      "other": {"emb_func": 0.01}},
    })
    params = {"emb_func": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((3,))}}
    lr = opt.lr_tree(params, scale=0.5)
    assert lr["emb_func"] == pytest.approx(0.005)
    assert lr["head"] == pytest.approx(0.0025)
    state = opt.init(params)
    grads = {"emb_func": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((3,))}}
    new_params, _ = opt.apply(grads, state, params, lr)
    # adam first step moves params by ~lr in the gradient direction
    assert float(new_params["emb_func"]["w"][0]) < float(new_params["head"]["w"][0]) < 1.0


def test_sgd_momentum_matches_torch_semantics():
    opt = build_optimizer({
        "optimizer": {"name": "SGD", "kwargs": {"lr": 0.1, "momentum": 0.9}},
    })
    params = {"m": {"w": jnp.zeros(())}}
    state = opt.init(params)
    g = {"m": {"w": jnp.ones(())}}
    lr = opt.lr_tree(params)
    p1, state = opt.apply(g, state, params, lr)
    p2, state = opt.apply(g, state, p1, lr)
    # torch: v1=g, p1=-lr*g=-0.1 ; v2=0.9*v1+g=1.9, p2=p1-0.19=-0.29
    assert float(p1["m"]["w"]) == pytest.approx(-0.1)
    assert float(p2["m"]["w"]) == pytest.approx(-0.29)
