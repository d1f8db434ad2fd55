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
    # the reference's rendezvous is tcp://127.0.0.1:<port> (trainer.py:629,
    # test.py:701) — honor the same ``port`` key when no explicit
    # coordinator_address is configured
    if "coordinator_address" not in kwargs and config.get("port"):
        kwargs["coordinator_address"] = f"127.0.0.1:{int(config['port'])}"
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


def resolve_transfer_dtype(name: Optional[str]):
    """Parse the ``transfer_dtype`` config knob → numpy-compatible dtype
    (None = keep fp32).  ``bfloat16`` halves the host→device bytes of every
    float leaf — on tunneled/remote TPUs the transfer link is the train-loop
    bottleneck (BASELINE.md data_time notes); the jitted steps upcast back
    to fp32 on device (fused into the first op), so only the wire format
    changes, not the compute precision."""
    if not name:
        return None
    name = str(name).lower()
    if name in ("float32", "fp32", "none"):
        return None
    if name in ("bfloat16", "bf16"):
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    if name in ("float16", "fp16"):
        return np.dtype(np.float16)
    raise ValueError(f"unsupported transfer_dtype {name!r}")


def shard_batch(batch: Any, mesh: Mesh, transfer_dtype=None) -> Any:
    """Device-put a host batch pytree with the episode axis sharded.

    Every array leaf in an ``EpisodeBatch`` has the episode axis first, so a
    single P('data') spec applies uniformly.  Host→device transfer and
    sharding happen in one step (no gather through a single device).
    ``transfer_dtype`` (see ``resolve_transfer_dtype``) compresses float
    leaves for the wire.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if transfer_dtype is not None and x.dtype == np.float32:
            x = x.astype(transfer_dtype)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def transfer_ahead(batches, mesh: Mesh, transfer_dtype=None):
    """One-ahead async device transfer: ``jax.device_put`` dispatches
    asynchronously, so issuing the NEXT batch's host→device copy before
    consuming the current one overlaps the wire transfer with compute —
    on tunneled/remote TPUs the transfer dominates eval wall-clock
    (BASELINE.md).  Yields device-resident batches in order."""
    it = iter(batches)
    try:
        nxt = shard_batch(next(it), mesh, transfer_dtype)
    except StopIteration:
        return
    for b in it:
        cur, nxt = nxt, shard_batch(b, mesh, transfer_dtype)
        yield cur
    yield nxt


def upcast_floats(tree: Any) -> Any:
    """On-device inverse of the ``transfer_dtype`` compression: cast every
    sub-fp32 float leaf back to fp32 (jitted callers fuse this into their
    first consumer op)."""
    import jax.numpy as jnp

    def up(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) \
                and x.dtype != jnp.float32:
            return x.astype(jnp.float32)
        return x

    return jax.tree_util.tree_map(up, tree)
