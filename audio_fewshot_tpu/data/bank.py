"""Device-resident segment banks — setup shared by Trainer and Test.

The split's segments ship to HBM once (in the wire dtype); loaders then emit
``IndexedEpisodeBatch``/``IndexedFlatBatch`` row ids and the jitted steps
materialize episodes with an in-HBM gather (episode.materialize_*).  On
tunneled/remote TPUs the per-step segment payload is the measured pipeline
bottleneck (BASELINE.md: CLI eval 2.6 → 87 eps/s).

Config: ``device_data_bank``: true / false / "auto" (default — each split's
bank is enabled while the running total fits ``device_data_bank_max_gb``;
splits that don't fit fall back to payload batches individually).
``device_eval_bank`` / ``device_eval_bank_max_gb`` are accepted aliases (the
knob's original, eval-only names); a non-default value under either name
wins over the other's default.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _resolve(config: Dict[str, Any], new_key: str, old_key: str, default):
    """Two-name knob resolution: a non-default value wins regardless of
    which name carries it (old result-dir config dumps persist the alias)."""
    new = config.get(new_key, default)
    old = config.get(old_key)
    if new != default or old is None:
        return new
    return old


def setup_segment_banks(
    config: Dict[str, Any],
    loaders: List[Any],
    mesh,
    transfer_dtype,
    logger=None,
) -> List[Optional[Any]]:
    """Enable bank-index emission on ``loaders`` and return the device bank
    for each (None where disabled).  Loaders sharing a dataset share one
    device bank; datasets are admitted smallest-first until the byte cap."""
    from ..parallel.mesh import replicate

    knob = _resolve(config, "device_data_bank", "device_eval_bank", "auto")
    if not knob:
        return [None] * len(loaders)
    if any(not hasattr(ld, "use_segment_bank") for ld in loaders):
        if logger and str(knob).lower() != "auto":
            logger.warning(
                "device_data_bank=%s ignored: loader without segment-bank "
                "support in %s", knob, [type(ld).__name__ for ld in loaders],
            )
        return [None] * len(loaders)
    cap_gb = _resolve(
        config, "device_data_bank_max_gb", "device_eval_bank_max_gb", 4.0
    )
    cap = float(cap_gb) * 2 ** 30
    per_elem = (
        np.dtype(transfer_dtype).itemsize if transfer_dtype is not None else 4
    )
    datasets = {}
    for ld in loaders:
        datasets.setdefault(id(ld.dataset), ld.dataset)

    # admit per dataset, smallest first, while the running total fits the
    # cap (auto mode) — a too-large train split must not disable the small
    # val/test banks that drive the eval speedup
    admitted: Dict[int, Any] = {}
    budget = cap
    auto = str(knob).lower() == "auto"
    for key, ds in sorted(datasets.items(), key=lambda kv: kv[1].bank_nbytes(per_elem)):
        nbytes = ds.bank_nbytes(per_elem)
        if auto and nbytes > budget:
            if logger:
                logger.info(
                    "segment bank skipped for a %.2f GiB split (budget "
                    "%.2f GiB left of device_data_bank_max_gb=%.2f)",
                    nbytes / 2 ** 30, budget / 2 ** 30, float(cap_gb),
                )
            continue
        admitted[key] = ds
        budget -= nbytes

    device_banks = {}
    shipped = 0
    for key, ds in admitted.items():
        host, _ = ds.segment_bank()
        if transfer_dtype is not None:
            host = host.astype(transfer_dtype)
        shipped += host.nbytes
        device_banks[key] = jax.device_put(host, replicate(mesh))
        # the loaders only need the starts map from here on — free the host
        # fp32 copy (it roughly doubles corpus RAM otherwise)
        ds.release_bank_payload()
    for ld in loaders:
        if id(ld.dataset) in device_banks:
            ld.use_segment_bank()
    if logger and device_banks:
        logger.info(
            "device-resident segment banks: %.1f MiB shipped once (%s)",
            shipped / 2 ** 20,
            ", ".join(
                f"{b.shape[0]} segments" for b in device_banks.values()
            ),
        )
    return [device_banks.get(id(ld.dataset)) for ld in loaders]
