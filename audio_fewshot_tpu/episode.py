"""Dense, masked episode batches — the core data structure.

The reference carries episodes as flat tensors plus a ragged ``repeats``
vector, carved up by Python loops in ``split_by_episode`` (reference
libfewshot_core/model/abstract_model.py:176-412, layout: episode → way →
[shot support segments | variable query segments]).  Under XLA that ragged
layout is hostile: dynamic shapes force recompilation and the per-episode
Python loops serialize the device.

Here an episode batch is a *static-shape* pytree: support and query are
pre-split, query segments are padded to a bucketed ``Qseg`` length and
carry an integer clip id + validity mask.  All downstream method heads are
pure functions vmapped over the episode axis; clip-level aggregation
(majority vote / logit averaging, reference utils/utils.py:436-470) becomes
one-hot matmuls — MXU work instead of host loops.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class EpisodeBatch:
    """A batch of ``E`` few-shot episodes with dense masked query segments.

    Shapes (``E`` episodes, ``W`` way, ``S`` shot, ``Q`` query clips/way,
    ``G = Qseg`` padded query segments, spectrogram ``[C, F, T]``):

    - ``support``:        ``[E, W*S, C, F, T]``  (support clips are single
      segments — reference protocol, SURVEY §0.2)
    - ``query``:          ``[E, G, C, F, T]`` padded segment stack
    - ``query_clip``:     ``[E, G]`` int32, clip id in ``[0, W*Q)`` per
      segment (padding points at clip 0 but is masked out)
    - ``query_mask``:     ``[E, G]`` float32, 1 = real segment
    - ``support_target``: ``[E, W*S]`` int32 local labels (way index)
    - ``query_target``:   ``[E, W*Q]`` int32 *clip-level* local labels
    - ``global_target``:  ``[E, W*(S+Q)]`` int32 dataset-level class ids or
      None (used by global-CE methods, e.g. CAN / finetuning val)
    """

    support: jnp.ndarray
    query: jnp.ndarray
    query_clip: jnp.ndarray
    query_mask: jnp.ndarray
    support_target: jnp.ndarray
    query_target: jnp.ndarray
    global_target: Optional[jnp.ndarray] = None

    @property
    def num_episodes(self) -> int:
        return self.support.shape[0]

    @property
    def num_query_clips(self) -> int:
        return self.query_target.shape[-1]

    @property
    def segment_shape(self) -> Tuple[int, ...]:
        return self.support.shape[2:]


@struct.dataclass
class FlatBatch:
    """A plain classification batch for FINETUNING-type pretraining
    (reference model/finetuning/baseline.py:84-104 consumes ``(image, target)``)."""

    data: jnp.ndarray  # [B, C, F, T]
    target: jnp.ndarray  # [B]


@struct.dataclass
class DualBatch:
    """One train step's paired (episodic, global-flat) batches.

    Reference: with ``dataloader_num: 2`` the trainer zips both loaders into
    ONE model call (trainer.py:159-188) and RENet unpacks
    ``(ep_images, ep_global_targets, g_images, g_global_targets)``
    (renet.py:409-415).  Each part may be the indexed (bank) twin of its
    payload form; ``episode.materialize_*`` handles both."""

    episode: Any  # EpisodeBatch | IndexedEpisodeBatch
    flat: Any  # FlatBatch | IndexedFlatBatch


def local_targets(way: int, count_per_way: int) -> np.ndarray:
    """Per-way local labels ``[way*count]`` (reference
    abstract_model.py:167-174 ``_generate_local_targets``)."""
    return np.repeat(np.arange(way, dtype=np.int32), count_per_way)


def make_dense_episode_batch(
    support: np.ndarray,
    query: np.ndarray,
    way: int,
    shot: int,
    query_num: int,
    global_target: Optional[np.ndarray] = None,
) -> EpisodeBatch:
    """Build a fixed-length (train-style) batch: every query clip is exactly
    one segment, ``G == W*Q``, mask all-ones.

    ``support``: [E, W*S, C,F,T] ordered way-major; ``query``: [E, W*Q, C,F,T].
    """
    e = support.shape[0]
    wq = way * query_num
    assert query.shape[1] == wq, (query.shape, wq)
    # pure-numpy leaves: batches assembled in host prefetch threads must NOT
    # touch the device — jnp here would commit every batch to device 0 and
    # force a blocking D2H round trip inside shard_batch
    return EpisodeBatch(
        support=np.asarray(support),
        query=np.asarray(query),
        query_clip=np.broadcast_to(np.arange(wq, dtype=np.int32), (e, wq)),
        query_mask=np.ones((e, wq), dtype=np.float32),
        support_target=np.broadcast_to(
            local_targets(way, shot), (e, way * shot)
        ),
        query_target=np.broadcast_to(
            local_targets(way, query_num), (e, wq)
        ),
        global_target=None if global_target is None else np.asarray(global_target),
    )


def pack_ragged_episode_batch(
    support: np.ndarray,
    query_segments: np.ndarray,
    repeats: np.ndarray,
    way: int,
    shot: int,
    query_num: int,
    bucket_sizes: Optional[Tuple[int, ...]] = None,
) -> EpisodeBatch:
    """Pack variable-length query clips into a padded EpisodeBatch.

    Args:
        support: ``[E, W*S, C, F, T]`` way-major support segments.
        query_segments: ``[N_total, C, F, T]`` all query segments,
          concatenated episode-major → way-major → clip-major → segment-major
          (the reference flat order, abstract_model.py:231-252 minus the
          interleaved support rows).
        repeats: ``[E*W*Q]`` int segment counts per query clip (the MetaAudio
          protocol vector, reference utils/utils.py:429-470).
        bucket_sizes: allowed padded ``G`` values; the smallest bucket
          ≥ max-per-episode-segments is used, bounding recompilation.

    Returns an EpisodeBatch whose query tensor is ``[E, G, C, F, T]``.
    """
    e = support.shape[0]
    wq = way * query_num
    repeats = np.asarray(repeats, dtype=np.int64).reshape(e, wq)
    max_seg = int(repeats.sum(axis=1).max())
    g = _pick_bucket(max_seg, bucket_sizes)

    seg_shape = query_segments.shape[1:]
    query = np.zeros((e, g) + seg_shape, dtype=query_segments.dtype)
    clip_id = np.zeros((e, g), dtype=np.int32)
    mask = np.zeros((e, g), dtype=np.float32)

    src = 0
    for i in range(e):
        dst = 0
        for c in range(wq):
            n = int(repeats[i, c])
            query[i, dst : dst + n] = query_segments[src : src + n]
            clip_id[i, dst : dst + n] = c
            mask[i, dst : dst + n] = 1.0
            dst += n
            src += n
    assert src == query_segments.shape[0], (src, query_segments.shape)

    return EpisodeBatch(
        support=np.asarray(support),
        query=np.asarray(query),
        query_clip=clip_id,
        query_mask=mask,
        support_target=np.broadcast_to(
            local_targets(way, shot), (e, way * shot)
        ),
        query_target=np.broadcast_to(
            local_targets(way, query_num), (e, wq)
        ),
    )


def _pick_bucket(needed: int, bucket_sizes: Optional[Tuple[int, ...]]) -> int:
    if not bucket_sizes:
        # powers-of-two style buckets bound the number of distinct compiled
        # shapes to O(log(max_segments))
        g = 1
        while g < needed:
            g *= 2
        return g
    for b in sorted(bucket_sizes):
        if b >= needed:
            return int(b)
    raise ValueError(f"no bucket ≥ {needed} in {bucket_sizes}")


def segment_targets(batch: EpisodeBatch) -> jnp.ndarray:
    """Per-segment query labels ``[E, G]`` (clip labels gathered through the
    clip-id vector; reference expands with ``repeat_interleave``,
    e.g. proto_net.py:117)."""
    return jnp.take_along_axis(batch.query_target, batch.query_clip, axis=1)


# -- device-resident segment bank (indexed episodes) -------------------------


@struct.dataclass
class IndexedEpisodeBatch:
    """An ``EpisodeBatch`` whose spectrogram payload lives in a device-
    resident segment bank: ``support_idx``/``query_idx`` are int32 rows into
    ``bank [N, C, F, T]``; everything else matches ``EpisodeBatch``.

    TPU rationale: the eval split is small (hundreds of MB) while each
    episode re-transfers ~1.5 MB/segment through the (tunneled) host→device
    link — the measured CLI eval bottleneck (BASELINE.md: 2.6 eps/s wire vs
    310 eps/s device-resident).  Shipping the corpus once and gathering rows
    in HBM turns the per-step wire payload into a few KB of indices.
    """

    support_idx: jnp.ndarray  # [E, W*S] int32
    query_idx: jnp.ndarray  # [E, G] int32 (padding → 0, masked out)
    query_clip: jnp.ndarray  # [E, G]
    query_mask: jnp.ndarray  # [E, G]
    support_target: jnp.ndarray  # [E, W*S]
    query_target: jnp.ndarray  # [E, W*Q]
    global_target: Optional[jnp.ndarray] = None


def materialize_episode_batch(batch, bank: jnp.ndarray) -> EpisodeBatch:
    """Gather an ``IndexedEpisodeBatch``'s payload out of the bank (inside
    jit: an HBM row gather, fused with the consumer).  The bank may be kept
    in the wire dtype (bf16) — gather first, upcast after, so the gather
    moves half the bytes."""
    if isinstance(batch, EpisodeBatch):
        return batch
    support = jnp.take(bank, batch.support_idx, axis=0)
    query = jnp.take(bank, batch.query_idx, axis=0)
    if support.dtype != jnp.float32:
        support = support.astype(jnp.float32)
        query = query.astype(jnp.float32)
    # padded rows gather bank row 0 — zero them so the result is
    # byte-identical to the zero-padded payload path (batch-stat-only heads
    # see padding through BN batch statistics)
    mask = batch.query_mask.astype(query.dtype)
    query = query * mask.reshape(mask.shape + (1,) * (query.ndim - 2))
    return EpisodeBatch(
        support=support,
        query=query,
        query_clip=batch.query_clip,
        query_mask=batch.query_mask,
        support_target=batch.support_target,
        query_target=batch.query_target,
        global_target=batch.global_target,
    )


def pack_ragged_episode_indices(
    support_idx: np.ndarray,
    query_seg_ids: np.ndarray,
    repeats: np.ndarray,
    way: int,
    shot: int,
    query_num: int,
    bucket_sizes: Optional[Tuple[int, ...]] = None,
    global_target: Optional[np.ndarray] = None,
) -> IndexedEpisodeBatch:
    """Index twin of ``pack_ragged_episode_batch``: same packing/bucketing,
    but the payload is bank row ids instead of segment arrays."""
    e = support_idx.shape[0]
    wq = way * query_num
    repeats = np.asarray(repeats, dtype=np.int64).reshape(e, wq)
    max_seg = int(repeats.sum(axis=1).max())
    g = _pick_bucket(max_seg, bucket_sizes)

    query_idx = np.zeros((e, g), dtype=np.int32)
    clip_id = np.zeros((e, g), dtype=np.int32)
    mask = np.zeros((e, g), dtype=np.float32)

    src = 0
    for i in range(e):
        dst = 0
        for c in range(wq):
            n = int(repeats[i, c])
            query_idx[i, dst : dst + n] = query_seg_ids[src : src + n]
            clip_id[i, dst : dst + n] = c
            mask[i, dst : dst + n] = 1.0
            dst += n
            src += n
    assert src == query_seg_ids.shape[0], (src, query_seg_ids.shape)

    return IndexedEpisodeBatch(
        support_idx=np.asarray(support_idx, dtype=np.int32),
        query_idx=query_idx,
        query_clip=clip_id,
        query_mask=mask,
        support_target=np.broadcast_to(
            local_targets(way, shot), (e, way * shot)
        ),
        query_target=np.broadcast_to(
            local_targets(way, query_num), (e, wq)
        ),
        global_target=None if global_target is None else np.asarray(global_target),
    )


@struct.dataclass
class IndexedFlatBatch:
    """``FlatBatch`` twin whose payload is bank row ids (FINETUNING
    pretraining over the device-resident corpus)."""

    data_idx: jnp.ndarray  # [B] int32
    target: jnp.ndarray  # [B]


def materialize_flat_batch(batch, bank: jnp.ndarray) -> FlatBatch:
    if isinstance(batch, FlatBatch):
        return batch
    data = jnp.take(bank, batch.data_idx, axis=0)
    if data.dtype != jnp.float32:
        data = data.astype(jnp.float32)
    return FlatBatch(data=data, target=batch.target)
