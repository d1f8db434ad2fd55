"""SPMD parallelism over TPU meshes.

The reference's entire distributed story is NCCL DDP: one process per GPU,
``DistributedDataParallel`` gradient all-reduce, SyncBN, metric all-reduce
(reference trainer.py:504-509, run_trainer.py:49, utils/utils.py:116-118 —
SURVEY §2.9/§5.8).  None of that survives as user code here: a 1-D
``Mesh(devices, ('data',))`` shards the episode axis of every batch, params
are replicated, and jit inserts the gradient ``psum`` because the loss is a
mean over a sharded axis.  BatchNorm runs per-shard (non-sync) — matching
the reference's MAML configuration and the single-GPU runs that produced all
KOS results (``n_gpu: 1`` throughout, SURVEY §6).
"""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    get_mesh,
    maybe_init_distributed,
    replicate,
    resolve_transfer_dtype,
    shard_batch,
    transfer_ahead,
    upcast_floats,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "resolve_transfer_dtype",
    "transfer_ahead",
    "upcast_floats",
    "get_mesh",
    "maybe_init_distributed",
    "replicate",
    "shard_batch",
]
