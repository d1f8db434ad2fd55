"""Test harness — episodic evaluation with confidence intervals.

Reference: ``libfewshot_core/test.py`` (733 LoC).  ``Test(rank, config,
result_path).test_loop()`` runs ``test_epoch`` passes over the test loader,
reporting a 95 % CI per epoch and aggregated over all epochs
(test.py:180-238).  The energy-OOD calibration pass (validation-set
uncertainty threshold, test.py:188) and the TTA re-classification loop
(test.py:331-500) hook in through the method when it supports them
(DeepBDC — see models/heads/deepbdc.py).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from .data import get_dataloader
from .models import build_method, eval_setting
from .models.base import EpisodeSetting, MethodBase
from .parallel import get_mesh, replicate, shard_batch
from .utils import (
    TensorboardWriter,
    init_logger,
    init_seed,
    load_variables,
    mean_confidence_interval,
)


class Test:
    def __init__(self, rank: int, config: Dict[str, Any], result_path: Optional[str] = None):
        self.rank = rank
        self.config = config
        self.result_path = result_path
        log_dir = os.path.join(result_path, "log_files") if result_path else None
        self.logger = init_logger(
            log_dir,
            level=config.get("log_level", "info"),
            file_name="{}-{}-test.log".format(
                config["classifier"]["name"], config["backbone"]["name"]
            ),
        )
        self.rng = init_seed(int(config.get("seed", 0)))
        self.method: MethodBase = build_method(config)
        self.setting = eval_setting(config)
        self.mesh = get_mesh(
            config.get("n_devices"), batch_divisor=int(config.get("episode_size", 1))
        )

        self.val_loader = get_dataloader(
            config, "val", self.method.model_type, False, config.get("modality", "audio")
        )
        self.test_loader = get_dataloader(
            config, "test", self.method.model_type, False, config.get("modality", "audio")
        )

        self.variables = self._load_model()
        self._jit_eval_step = jax.jit(self._eval_step, static_argnames=("setting",))

    def _load_model(self):
        self.rng, init_rng = jax.random.split(self.rng)
        example = next(iter(self.test_loader[0].epoch(0)))
        variables = self.method.init_variables(init_rng, example, self.setting)
        ckpt = None
        if self.result_path:
            cand = os.path.join(self.result_path, "checkpoints", "model_best.pth")
            if os.path.isfile(cand):
                ckpt = cand
        if ckpt:
            variables = load_variables(ckpt, variables)
            self.logger.info("loaded checkpoint %s", ckpt)
        else:
            self.logger.warning("no checkpoint found — evaluating at init")
        return jax.device_put(variables, replicate(self.mesh))

    def _eval_step(self, variables, batch, setting: EpisodeSetting):
        seg_logits = self.method.forward(variables, batch, setting)
        return self.method.eval_episode_accuracy(seg_logits, batch)

    def test_loop(self) -> Tuple[float, float]:
        cfg = self.config
        n_epochs = int(cfg.get("test_epoch", 5))

        if getattr(self.method, "supports_energy_ood", False):
            self.logger.info("============ Calibration pass on the val set ============")
            self.method.calibrate_threshold(
                self.variables, self.val_loader[0], self.setting, self.mesh
            )

        epoch_means: List[float] = []
        all_accs: List[float] = []
        for epoch in range(n_epochs):
            t0 = time.time()
            accs: List[float] = []
            for batch in self.test_loader[0].epoch(epoch):
                dev_batch = shard_batch(batch, self.mesh)
                ep_acc = self._jit_eval_step(self.variables, dev_batch, self.setting)
                accs.extend(np.asarray(jax.device_get(ep_acc)).ravel().tolist())
            mean, ci = mean_confidence_interval(accs)
            n_eps = len(accs)
            dt = time.time() - t0
            self.logger.info(
                "Test epoch %d: Acc@1 %.3f ± %.3f (%d episodes, %.1f eps/s)",
                epoch, mean, ci, n_eps, n_eps / max(dt, 1e-9),
            )
            epoch_means.append(mean)
            all_accs.extend(accs)

        agg_mean, agg_ci = mean_confidence_interval(epoch_means)
        self.logger.info("Aggregated: Acc@1 %.3f ± %.3f over %d epochs", agg_mean, agg_ci, n_epochs)
        return agg_mean, agg_ci
