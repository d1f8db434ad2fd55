"""Episodic + flat batch loaders, the ``get_dataloader`` public surface.

Reference call sites (the data package itself is missing from the snapshot):
``get_dataloader(config, mode, model_type, distribute, modality)`` returning a
*list* of loaders of length ``dataloader_num`` (reference trainer.py:420-422,
``zip(*self.train_loader)`` at trainer.py:159), and
``get_mean_std(config, mode, modality)`` (reference test.py:31,397).

Batch protocol:
- train: every clip contributes ONE random segment → a fully dense
  ``EpisodeBatch`` (fixed shapes, one jit specialization).
- val/test: query clips contribute ALL their segments, packed into a
  bucketed, masked query axis (the reference's ragged ``repeats`` vector,
  utils/utils.py:429-470, becomes clip-id + mask).
- FINETUNING model_type + train mode: flat shuffled ``FlatBatch`` with
  global labels (reference trainer.py:87-88, finetuning/baseline.py:84-104).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..episode import EpisodeBatch, FlatBatch, local_targets, pack_ragged_episode_batch
from ..models.base import ModelType
from .dataset import (
    DEFAULT_SEGMENT_FRAMES,
    SpectrogramDataset,
    load_mean_std,
    load_splits,
    parse_synthetic_root,
)
from .sampler import EpisodeIndices, EpisodicSampler, FlatSampler

_SPLIT_INDEX = {"train": 0, "val": 1, "test": 2}


def get_mean_std(config: Dict[str, Any], mode: str = "train", modality: str = "audio") -> Tuple[float, float]:
    """Scalar normalization stats for this config (reference
    ``collates.get_mean_std``; stats are per-dataset scalars, SURVEY §0)."""
    path = config.get("mean_std_file")
    if path and os.path.isfile(path):
        return load_mean_std(path)
    return 0.0, 1.0


def resolve_data_sources(config: Dict[str, Any], mode: str) -> Tuple[str, Optional[str]]:
    """``(data_root, mean_std_file)`` for a split, honoring the OOD protocol.

    The reference's ``ood`` key was consumed by the snapshot-missing data
    package; the observable contract (SURVEY §0): iid and ood leaf configs
    differ ONLY in the flag (config/proto/proto_5shot_iid_seed0.yaml vs
    config/proto/ood/) while both keep the ``KOS_1_alpha`` data_root and
    Clean mean/std — so the flag must redirect the TEST split to the
    spurious-correlation data variant.  Reconstruction:

    - explicit ``ood_data_root`` / ``ood_mean_std_file`` keys win;
    - else the ``KOS_<alpha>_alpha`` components of ``data_root`` are
      substituted with ``KOS_0_alpha`` (the correlation-free variant whose
      stats ship in Auxiliary/KOS_0_alpha_Mean_Std.npy);
    - normalization stays the config's (Clean) stats unless overridden,
      matching the reference's use of Clean stats for TTA (test.py:397-398).
    """
    data_root = str(config.get("data_root") or "synthetic")
    mean_std = config.get("mean_std_file")
    if mode == "test" and config.get("ood"):
        import re

        if config.get("ood_data_root"):
            data_root = str(config["ood_data_root"])
        else:
            redirected = re.sub(r"KOS_[0-9.]+_alpha", "KOS_0_alpha", data_root)
            if not re.search(r"KOS_[0-9.]+_alpha", data_root) \
                    and parse_synthetic_root(data_root) is None \
                    and os.path.isdir(data_root):
                # a silent no-op here would report the IID number as the
                # OOD number — fail loudly (synthetic roots shift their
                # generator seed instead, build_dataset below)
                raise ValueError(
                    f"ood: true but data_root {data_root!r} has no "
                    "KOS_<alpha>_alpha component to redirect and no "
                    "ood_data_root is set — the test split would silently "
                    "be the IID one"
                )
            data_root = redirected
        if config.get("ood_mean_std_file"):
            mean_std = config["ood_mean_std_file"]
    return data_root, mean_std


def build_dataset(config: Dict[str, Any], mode: str) -> SpectrogramDataset:
    data_root, mean_std_file = resolve_data_sources(config, mode)
    cfg_for_stats = dict(config)
    cfg_for_stats["mean_std_file"] = mean_std_file
    mean, std = get_mean_std(cfg_for_stats, mode, config.get("modality", "audio"))
    seg_frames = config.get("segment_frames", DEFAULT_SEGMENT_FRAMES)

    syn = parse_synthetic_root(data_root)
    if syn is None and not os.path.isdir(data_root):
        syn = {"num_classes": 25, "clips_per_class": 40}
    if syn is not None:
        sizes = {"train": syn["num_classes"], "val": 5, "test": 8}
        offsets = {"train": 0, "val": sizes["train"], "test": sizes["train"] + 5}
        # 0 is the on-disk loader's "unlimited" sentinel; the synthetic
        # generator needs a concrete positive cap
        max_seg = 1 if mode == "train" else (
            int(config.get("max_segments_per_clip") or 8)
        )
        spec_shape = tuple(config.get("spec_shape") or (1, 128, seg_frames))
        # synthetic OOD twin: same classes, shifted generator seed — a
        # distribution shift standing in for the spurious-correlation variant
        ood_shift = 100 if (mode == "test" and config.get("ood")) else 0
        return SpectrogramDataset.synthetic(
            num_classes=sizes[mode],
            clips_per_class=syn["clips_per_class"],
            segment_shape=spec_shape,
            max_segments=max_seg,
            seed=int(config.get("seed", 0)) + _SPLIT_INDEX[mode] + ood_shift,
            class_offset=offsets[mode],
        )

    split_file = config.get("class_per_split")
    if split_file and os.path.isfile(split_file):
        splits = load_splits(split_file)
        all_classes = [c for s in splits for c in s]
        classes = splits[_SPLIT_INDEX[mode]]
        class_offset = all_classes.index(classes[0]) if classes else 0
    else:
        classes = None
        class_offset = 0
    return SpectrogramDataset.from_directory(
        data_root,
        classes=classes,
        mean=mean,
        std=std,
        segment_frames=seg_frames,
        class_offset=class_offset,
        max_segments=int(config.get("max_segments_per_clip", 8) or 0),
    )


class EpisodicLoader:
    """Iterable over epochs of ``EpisodeBatch``es with background prefetch.

    Host threads assemble numpy episode batches while the device computes the
    previous step — the TPU-native replacement for the reference's
    worker-process DataLoader + CUDA-stream prefetcher (utils.py:291-326).
    """

    def __init__(
        self,
        dataset: SpectrogramDataset,
        way: int,
        shot: int,
        query: int,
        episodes_per_epoch: int,
        episode_size: int = 1,
        mode: str = "train",
        seed: int = 0,
        segment_bucket_sizes: Optional[Tuple[int, ...]] = None,
        prefetch: int = 2,
        epoch_offset_seed: int = 0,
        augment_times: int = 1,
    ):
        self.dataset = dataset
        self.way, self.query = way, query
        #: eval-only: emit ``IndexedEpisodeBatch``es of bank row ids instead
        #: of segment payloads (see ``use_segment_bank``)
        self.emit_indices = False
        self._bank_starts: Optional[List[List[int]]] = None
        #: effective shot — each sampled support clip contributes
        #: ``augment_times`` copies (reference ``shot_num × augment_times``
        #: inflation, trainer.py:444-447; copies are differentiated by the
        #: device-side random augmentation when ``augment`` is on)
        self.shot = shot * augment_times
        self.augment_times = augment_times
        self.mode = mode
        self.episode_size = episode_size
        self.prefetch = prefetch
        self.segment_bucket_sizes = segment_bucket_sizes
        self.sampler = EpisodicSampler(
            dataset.clips_per_class(),
            way=way,
            shot=shot,
            query=query,
            episodes_per_epoch=episodes_per_epoch,
            episode_size=episode_size,
            seed=seed + epoch_offset_seed,
        )

    def __len__(self) -> int:
        return self.sampler.episodes_per_epoch // self.episode_size

    def use_segment_bank(self) -> None:
        """Switch batches to bank-index form (device-resident corpus).
        The caller ships ``dataset.segment_bank()[0]`` to the device once and
        materializes episodes with ``episode.materialize_episode_batch``.
        Train batches keep the same rng draw order as the payload path, so
        the emitted episodes are bit-identical after materialization."""
        self._bank_starts = self.dataset.bank_starts()
        self.emit_indices = True

    # -- batch assembly -----------------------------------------------------

    def _pick_segment(self, clip: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if self.mode == "train" and clip.shape[0] > 1:
            return clip[rng.integers(clip.shape[0])]
        return clip[0]

    def _pick_segment_offset(self, clip: np.ndarray, rng: np.random.Generator) -> int:
        """Index twin of ``_pick_segment`` — MUST keep the same rng draw
        order so indexed and payload batches are bit-identical."""
        if self.mode == "train" and clip.shape[0] > 1:
            return int(rng.integers(clip.shape[0]))
        return 0

    def _build_batch(
        self, plans: List[EpisodeIndices], rng: np.random.Generator
    ) -> EpisodeBatch:
        if self.emit_indices:  # before any payload allocation
            if self.mode == "train":
                return self._build_train_index_batch(plans, rng)
            return self._build_index_batch(plans)
        ds = self.dataset
        e = len(plans)
        ws = self.way * self.shot
        wq = self.way * self.query
        seg_shape = ds.segment_shape
        support = np.empty((e, ws) + seg_shape, dtype=np.float32)
        global_sup = np.empty((e, ws), dtype=np.int32)
        global_qry = np.empty((e, wq), dtype=np.int32)

        if self.mode == "train":
            query = np.empty((e, wq) + seg_shape, dtype=np.float32)
            for i, plan in enumerate(plans):
                s = q = 0
                for w, cls in enumerate(plan.classes):
                    for k in plan.support[w]:
                        # augment_times copies per support clip (random
                        # segments now; random augmentation on device)
                        for _ in range(self.augment_times):
                            support[i, s] = self._pick_segment(ds.clips[cls][k], rng)
                            global_sup[i, s] = cls + ds.class_offset
                            s += 1
                    for k in plan.query[w]:
                        query[i, q] = self._pick_segment(ds.clips[cls][k], rng)
                        global_qry[i, q] = cls + ds.class_offset
                        q += 1
            support = ds.normalize(support)
            query = ds.normalize(query)
            from ..episode import make_dense_episode_batch

            batch = make_dense_episode_batch(
                support, query, self.way, self.shot, self.query
            )
            return batch.replace(
                global_target=np.concatenate([global_sup, global_qry], axis=1)
            )

        # eval: ragged query segments → packed + masked
        seg_list: List[np.ndarray] = []
        repeats = np.empty((e, wq), dtype=np.int64)
        for i, plan in enumerate(plans):
            s = q = 0
            for w, cls in enumerate(plan.classes):
                for k in plan.support[w]:
                    # augment_times copies per support clip, mirroring the
                    # train branch — eval support is inflated too (reference
                    # test.py:641 test_shot × augment_times)
                    for _ in range(self.augment_times):
                        support[i, s] = ds.clips[cls][k][0]
                        global_sup[i, s] = cls + ds.class_offset
                        s += 1
                for k in plan.query[w]:
                    segs = ds.clips[cls][k]
                    seg_list.append(segs)
                    repeats[i, q] = segs.shape[0]
                    global_qry[i, q] = cls + ds.class_offset
                    q += 1
        all_segs = ds.normalize(np.concatenate(seg_list, axis=0))
        support = ds.normalize(support)
        batch = pack_ragged_episode_batch(
            support,
            all_segs,
            repeats.reshape(-1),
            self.way,
            self.shot,
            self.query,
            bucket_sizes=self.segment_bucket_sizes,
        )
        return batch.replace(
            global_target=np.concatenate([global_sup, global_qry], axis=1)
        )

    def _build_train_index_batch(self, plans: List[EpisodeIndices], rng):
        """Index twin of the dense train branch: G == W*Q, mask all-ones,
        same rng draw order as the payload path (bit-identical episodes)."""
        from ..episode import IndexedEpisodeBatch

        ds = self.dataset
        starts = self._bank_starts
        e = len(plans)
        ws = self.way * self.shot
        wq = self.way * self.query
        support_idx = np.empty((e, ws), dtype=np.int32)
        query_idx = np.empty((e, wq), dtype=np.int32)
        global_sup = np.empty((e, ws), dtype=np.int32)
        global_qry = np.empty((e, wq), dtype=np.int32)
        for i, plan in enumerate(plans):
            s = q = 0
            for w, cls in enumerate(plan.classes):
                for k in plan.support[w]:
                    for _ in range(self.augment_times):
                        support_idx[i, s] = starts[cls][k] + \
                            self._pick_segment_offset(ds.clips[cls][k], rng)
                        global_sup[i, s] = cls + ds.class_offset
                        s += 1
                for k in plan.query[w]:
                    query_idx[i, q] = starts[cls][k] + \
                        self._pick_segment_offset(ds.clips[cls][k], rng)
                    global_qry[i, q] = cls + ds.class_offset
                    q += 1
        return IndexedEpisodeBatch(
            support_idx=support_idx,
            query_idx=query_idx,
            query_clip=np.broadcast_to(np.arange(wq, dtype=np.int32), (e, wq)),
            query_mask=np.ones((e, wq), dtype=np.float32),
            support_target=np.broadcast_to(
                local_targets(self.way, self.shot), (e, ws)
            ),
            query_target=np.broadcast_to(
                local_targets(self.way, self.query), (e, wq)
            ),
            global_target=np.concatenate([global_sup, global_qry], axis=1),
        )

    def _build_index_batch(self, plans: List[EpisodeIndices]):
        """Index twin of the eval branch: identical episode content, but the
        payload is bank row ids (episode.IndexedEpisodeBatch)."""
        from ..episode import pack_ragged_episode_indices

        ds = self.dataset
        starts = self._bank_starts
        e = len(plans)
        ws = self.way * self.shot
        wq = self.way * self.query
        support_idx = np.empty((e, ws), dtype=np.int32)
        global_sup = np.empty((e, ws), dtype=np.int32)
        global_qry = np.empty((e, wq), dtype=np.int32)
        seg_ids: List[int] = []
        repeats = np.empty((e, wq), dtype=np.int64)
        for i, plan in enumerate(plans):
            s = q = 0
            for w, cls in enumerate(plan.classes):
                for k in plan.support[w]:
                    for _ in range(self.augment_times):
                        support_idx[i, s] = starts[cls][k]  # segment 0
                        global_sup[i, s] = cls + ds.class_offset
                        s += 1
                for k in plan.query[w]:
                    n = ds.clips[cls][k].shape[0]
                    seg_ids.extend(range(starts[cls][k], starts[cls][k] + n))
                    repeats[i, q] = n
                    global_qry[i, q] = cls + ds.class_offset
                    q += 1
        return pack_ragged_episode_indices(
            support_idx,
            np.asarray(seg_ids, dtype=np.int32),
            repeats.reshape(-1),
            self.way,
            self.shot,
            self.query,
            bucket_sizes=self.segment_bucket_sizes,
            global_target=np.concatenate([global_sup, global_qry], axis=1),
        )

    # -- iteration ----------------------------------------------------------

    def epoch(self, epoch_idx: int = 0) -> Iterator[EpisodeBatch]:
        rng = np.random.default_rng((self.sampler.seed, epoch_idx, 13))
        plans_iter = self.sampler.epoch(epoch_idx)
        if self.prefetch <= 0:
            for plans in plans_iter:
                yield self._build_batch(plans, rng)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer abandoned the
            generator (otherwise the worker would block on a full queue for
            the process lifetime, pinning built batches)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for plans in plans_iter:
                    if not put(self._build_batch(plans, rng)):
                        return
                put(sentinel)
            except BaseException as exc:  # propagate to the consumer
                put(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator[EpisodeBatch]:
        return self.epoch(0)


class FlatLoader:
    """Flat classification batches for FINETUNING pretraining."""

    def __init__(
        self,
        dataset: SpectrogramDataset,
        batch_size: int,
        seed: int = 0,
        mode: str = "train",
    ):
        self.dataset = dataset
        self.mode = mode
        self.emit_indices = False
        self._bank_starts: Optional[List[List[int]]] = None
        self.sampler = FlatSampler(dataset.clips_per_class(), batch_size, seed=seed)

    def use_segment_bank(self) -> None:
        """Emit ``IndexedFlatBatch``es of bank row ids (same rng draw order
        as the payload path — bit-identical after materialization)."""
        self._bank_starts = self.dataset.bank_starts()
        self.emit_indices = True

    def __len__(self) -> int:
        return len(self.sampler)

    def epoch(self, epoch_idx: int = 0):
        ds = self.dataset
        rng = np.random.default_rng((self.sampler.seed, epoch_idx, 17))
        if self.emit_indices:
            from ..episode import IndexedFlatBatch

            starts = self._bank_starts
            for pairs in self.sampler.epoch(epoch_idx):
                idx = np.asarray(
                    [
                        starts[c][k]
                        + int(rng.integers(ds.clips[c][k].shape[0]))
                        for c, k in pairs
                    ],
                    dtype=np.int32,
                )
                target = np.asarray([c for c, _ in pairs], dtype=np.int32)
                yield IndexedFlatBatch(data_idx=idx, target=target)
            return
        for pairs in self.sampler.epoch(epoch_idx):
            data = np.stack(
                [
                    ds.clips[c][k][rng.integers(ds.clips[c][k].shape[0])]
                    for c, k in pairs
                ]
            )
            target = np.asarray([c for c, _ in pairs], dtype=np.int32)
            yield FlatBatch(data=ds.normalize(data), target=target)

    def __iter__(self) -> Iterator[FlatBatch]:
        return self.epoch(0)


def get_dataloader(
    config: Dict[str, Any],
    mode: str,
    model_type: ModelType = ModelType.METRIC,
    distribute: bool = False,
    modality: str = "audio",
) -> List[Any]:
    """Reference public surface: returns a LIST of ``dataloader_num`` loaders
    (the reference train loop zips them — trainer.py:159)."""
    atq = int(config.get("augment_times_query", 1) or 1)
    if atq != 1:
        # the reference's data package (missing from the snapshot) is the
        # only consumer; its model kwargs never inflate query_num
        # (trainer.py:442-453) so the episode-geometry semantics are
        # unrecoverable — fail loudly instead of silently ignoring the key
        raise ValueError(
            f"augment_times_query={atq} is not supported: the reference's "
            "consumer is absent from the snapshot and every shipped config "
            "sets 1 (config/headers/data.yaml)"
        )
    dataset = build_dataset(config, mode)
    seed = int(config.get("seed", 0))
    # workers (upstream: DataLoader num_workers; 0 = load in the main
    # process) → the host-side pipelining analogue here is the prefetch
    # thread: workers 0 disables it for fully synchronous batch build
    prefetch = int(config.get("prefetch", 2))
    if str(config.get("workers", 1)) in ("0", "0.0"):
        prefetch = 0

    if model_type == ModelType.FINETUNING and mode == "train":
        return [
            FlatLoader(dataset, int(config.get("batch_size", 128)), seed=seed + i)
            for i in range(int(config.get("dataloader_num", 1)))
        ]

    if mode == "train":
        way = config["way_num"]
        shot = config["shot_num"]
        augment_times = int(config.get("augment_times", 1))
        query_n = config["query_num"]
        episodes = int(config.get("train_episode", 500))
    else:
        way = config.get("test_way") or config["way_num"]
        shot = config.get("test_shot") or config["shot_num"]
        # eval support is inflated by augment_times too (reference
        # test.py:641) so episode geometry matches training
        augment_times = int(config.get("augment_times", 1))
        query_n = config.get("test_query") or config["query_num"]
        episodes = int(config.get("test_episode", 600))

    # eval throughput is round-trip bound at small batch sizes through the
    # TPU tunnel — test_episode_size lets eval batch more episodes per
    # dispatch without changing training gradient semantics
    ep_size = int(config.get("episode_size", 1))
    if mode != "train" and config.get("test_episode_size"):
        ep_size = int(config["test_episode_size"])

    buckets = config.get("segment_bucket_sizes")
    n_loaders = int(config.get("dataloader_num", 1)) if mode == "train" else 1
    loaders: List[Any] = [
        EpisodicLoader(
            dataset,
            way=way,
            shot=shot,
            query=query_n,
            episodes_per_epoch=episodes,
            episode_size=ep_size,
            mode=mode,
            seed=seed + 1000 * _SPLIT_INDEX[mode],
            segment_bucket_sizes=tuple(buckets) if buckets else None,
            prefetch=prefetch,
            augment_times=augment_times,
        )
    ]
    # dataloader_num 2 for an episodic method = [episodic, global-flat]:
    # the reference zips both into ONE train step (trainer.py:159-188) and
    # RENet consumes (ep_images, ep_global_targets, g_images,
    # g_global_targets) (renet.py:409-415, config/renet.yaml:78) — its
    # auxiliary CE trains the global fc head on flat batches.  The flat
    # loader shares the episodic loader's dataset (one segment bank).
    for i in range(1, n_loaders):
        loaders.append(
            FlatLoader(
                dataset, int(config.get("batch_size", 128)), seed=seed + i
            )
        )
    return loaders
