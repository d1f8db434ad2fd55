"""Mesh construction and episode-axis sharding."""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_init_distributed(config) -> None:
    """Multi-host SPMD bootstrap (reference: ``dist.init_process_group`` TCP
    rendezvous, trainer.py:611-635).  JAX needs only
    ``jax.distributed.initialize`` — coordinator/process info comes from the
    environment or explicit config keys.  No-op unless ``multihost`` is set."""
    if not config.get("multihost"):
        return
    kwargs = {}
    for src, dst in (
        ("coordinator_address", "coordinator_address"),
        ("num_processes", "num_processes"),
        ("process_id", "process_id"),
    ):
        if config.get(src) is not None:
            kwargs[dst] = config[src]
    jax.distributed.initialize(**kwargs)


def get_mesh(n_devices: Optional[int] = None, batch_divisor: Optional[int] = None) -> Mesh:
    """1-D episode-parallel mesh over the first ``n_devices`` devices.

    ``batch_divisor`` (usually ``episode_size``): when ``n_devices`` is not
    given, use the largest available device count that divides it — the
    TPU-native form of the reference's ``episode_size % n_gpu == 0`` assert
    (trainer.py:736-741), satisfied automatically instead of raising.
    """
    devices = jax.devices()
    if n_devices is None and batch_divisor:
        n_devices = max(
            d for d in range(1, len(devices) + 1) if batch_divisor % d == 0
        )
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (the episode axis) across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the episode axis sharded.

    Every array leaf in an ``EpisodeBatch`` has the episode axis first, so a
    single P('data') spec applies uniformly.  Host→device transfer and
    sharding happen in one step (no gather through a single device).
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), batch
    )
