from .aggregate import (
    average_logits,
    majority_vote,
    mean_confidence_interval,
    segment_accuracy,
    vote_categorical_acc,
)
from .checkpoint import SaveType, load_last, load_part, load_variables, save_model, save_variables
from .logger import get_logger, init_logger
from .meters import AverageMeter, TensorboardWriter
from .seed import init_seed

__all__ = [
    "average_logits",
    "majority_vote",
    "mean_confidence_interval",
    "segment_accuracy",
    "vote_categorical_acc",
    "SaveType",
    "load_last",
    "load_part",
    "load_variables",
    "save_model",
    "save_variables",
    "get_logger",
    "init_logger",
    "AverageMeter",
    "TensorboardWriter",
    "init_seed",
]
