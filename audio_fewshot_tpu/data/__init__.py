"""Data layer — episodic spectrogram loading for TPU feeding.

The reference's ``libfewshot_core.data`` package is absent from its snapshot
(SURVEY §0); its public surface is recovered from call sites
(reference trainer.py:420-422, test.py:573,589, test.py:31,397):

    get_dataloader(config, mode, model_type, distribute, modality) -> [loaders]
    collates.get_mean_std(config, mode, modality) -> (mean, std)

Here the loaders yield dense, masked ``EpisodeBatch`` pytrees (or
``FlatBatch`` for FINETUNING-type models) ready for device put — the ragged
MetaAudio ``repeats`` protocol is resolved into padding + masks on the host,
so the device never sees a dynamic shape.
"""

from .dataset import SpectrogramDataset, load_splits
from .loader import (
    EpisodicLoader,
    FlatLoader,
    get_dataloader,
    get_mean_std,
)
from .sampler import EpisodicSampler

__all__ = [
    "SpectrogramDataset",
    "load_splits",
    "EpisodicSampler",
    "EpisodicLoader",
    "FlatLoader",
    "get_dataloader",
    "get_mean_std",
]
