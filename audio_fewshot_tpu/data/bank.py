"""Device-resident segment banks — setup shared by Trainer and Test.

The split's segments ship to HBM once (in the wire dtype); loaders then emit
``IndexedEpisodeBatch``/``IndexedFlatBatch`` row ids and the jitted steps
materialize episodes with an in-HBM gather (episode.materialize_*).  On
tunneled/remote TPUs the per-step segment payload is the measured pipeline
bottleneck (BASELINE.md: CLI eval 2.6 → 87 eps/s).

Config: ``device_data_bank``: true / false / "auto" (default — on when all
banks fit ``device_data_bank_max_gb``).  ``device_eval_bank`` is accepted as
an alias (the knob's original, eval-only name).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax


def setup_segment_banks(
    config: Dict[str, Any],
    loaders: List[Any],
    mesh,
    transfer_dtype,
    logger=None,
) -> List[Optional[Any]]:
    """Enable bank-index emission on ``loaders`` and return the device bank
    for each (None everywhere when disabled).  Loaders sharing a dataset
    share one device bank."""
    from ..parallel.mesh import replicate

    knob = config.get("device_eval_bank")  # explicit alias wins
    if knob is None:
        knob = config.get("device_data_bank", "auto")
    if not knob:
        return [None] * len(loaders)
    if any(not hasattr(ld, "use_segment_bank") for ld in loaders):
        return [None] * len(loaders)
    cap_gb = config.get("device_eval_bank_max_gb")  # explicit alias wins
    if cap_gb is None:
        cap_gb = config.get("device_data_bank_max_gb", 4.0)
    cap = float(cap_gb) * 2 ** 30
    per_elem = 2 if transfer_dtype is not None else 4
    datasets = {}
    for ld in loaders:
        datasets.setdefault(id(ld.dataset), ld.dataset)
    total = sum(ds.bank_nbytes(per_elem) for ds in datasets.values())
    if str(knob).lower() == "auto" and total > cap:
        if logger:
            logger.info(
                "segment banks disabled: %.2f GiB exceeds device_data_bank_max_gb",
                total / 2 ** 30,
            )
        return [None] * len(loaders)
    device_banks = {}
    for key, ds in datasets.items():
        host, _ = ds.segment_bank()
        if transfer_dtype is not None:
            host = host.astype(transfer_dtype)
        device_banks[key] = jax.device_put(host, replicate(mesh))
    for ld in loaders:
        ld.use_segment_bank()
    if logger:
        logger.info(
            "device-resident segment banks: %.1f MiB shipped once (%s)",
            total / 2 ** 20,
            ", ".join(
                f"{b.shape[0]} segments" for b in device_banks.values()
            ),
        )
    return [device_banks[id(ld.dataset)] for ld in loaders]
