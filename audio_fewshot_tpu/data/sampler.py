"""Seeded episodic N-way-K-shot sampling.

Reference semantics (recovered from call sites — SURVEY §0): each episode
draws ``way_num`` classes; per class ``shot_num * augment_times`` support
clips + ``query_num`` query clips, no overlap; ``episode_size`` episodes per
batch; ``train_episode``/``test_episode`` episodes per epoch (reference
trainer.py:724-754 asserts).  Sampling happens on the host with NumPy — it is
index bookkeeping, not compute.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np


@dataclass(frozen=True)
class EpisodeIndices:
    """Index plan for one episode: way-major clip indices."""

    classes: np.ndarray  # [way] class indices into the dataset
    support: np.ndarray  # [way, shot] clip indices within class
    query: np.ndarray  # [way, query] clip indices within class


class EpisodicSampler:
    def __init__(
        self,
        clips_per_class: List[int],
        way: int,
        shot: int,
        query: int,
        episodes_per_epoch: int,
        episode_size: int = 1,
        seed: int = 0,
    ):
        self.counts = np.asarray(clips_per_class)
        self.way = way
        self.shot = shot
        self.query = query
        self.episodes_per_epoch = episodes_per_epoch
        self.episode_size = episode_size
        self.seed = seed
        if episodes_per_epoch % episode_size:
            # the reference asserts divisibility (trainer.py:724-754); we
            # round down but must not do it silently — the reported CI
            # would quietly cover fewer episodes than configured
            import warnings

            dropped = episodes_per_epoch % episode_size
            warnings.warn(
                f"episodes_per_epoch={episodes_per_epoch} is not divisible "
                f"by episode_size={episode_size}: the trailing {dropped} "
                f"episode(s) per epoch are dropped",
                stacklevel=2,
            )
        need = shot + query
        eligible = np.nonzero(self.counts >= need)[0]
        if len(eligible) < way:
            raise ValueError(
                f"need {way} classes with ≥ {need} clips; only {len(eligible)} "
                f"of {len(self.counts)} qualify"
            )
        self.eligible = eligible

    def epoch(self, epoch_idx: int) -> Iterator[List[EpisodeIndices]]:
        """Yield ``episodes_per_epoch // episode_size`` batches of episode
        plans, deterministically seeded by (seed, epoch)."""
        rng = np.random.default_rng((self.seed, epoch_idx))
        n_batches = self.episodes_per_epoch // self.episode_size
        for _ in range(n_batches):
            yield [self._sample_episode(rng) for _ in range(self.episode_size)]

    def _sample_episode(self, rng: np.random.Generator) -> EpisodeIndices:
        cls = rng.choice(self.eligible, size=self.way, replace=False)
        support = np.empty((self.way, self.shot), dtype=np.int64)
        query = np.empty((self.way, self.query), dtype=np.int64)
        for i, c in enumerate(cls):
            pick = rng.choice(self.counts[c], size=self.shot + self.query, replace=False)
            support[i] = pick[: self.shot]
            query[i] = pick[self.shot :]
        return EpisodeIndices(classes=cls, support=support, query=query)


class FlatSampler:
    """Shuffled flat-batch index sampler for FINETUNING-type pretraining
    (reference: plain DataLoader + DistributedSampler, trainer.py:87-88).
    Items are (class_idx, clip_idx) pairs over the whole split."""

    def __init__(self, clips_per_class: List[int], batch_size: int, seed: int = 0,
                 drop_last: bool = True):
        pairs = [
            (c, k) for c, n in enumerate(clips_per_class) for k in range(n)
        ]
        self.pairs = np.asarray(pairs, dtype=np.int64)
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.pairs)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch_idx: int) -> Iterator[np.ndarray]:
        rng = np.random.default_rng((self.seed, epoch_idx, 7))
        order = rng.permutation(len(self.pairs))
        n_full = len(self) * self.batch_size if self.drop_last else len(self.pairs)
        for start in range(0, n_full, self.batch_size):
            yield self.pairs[order[start : start + self.batch_size]]
