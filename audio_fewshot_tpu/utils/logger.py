"""Structured logging (reference libfewshot_core/utils/logger.py:23-109).

The reference monkey-patches ``builtins.print`` to route through logging
(reference trainer.py:386-406) — a hack that broke numba (clap.py:25-63).
Here modules log through a named logger; process-0 gets a console handler and
a rotating file handler, other processes console-only.
"""

from __future__ import annotations

import logging
import logging.handlers
import os
from typing import Optional

_LOGGER_NAME = "audio_fewshot_tpu"


def init_logger(
    log_dir: Optional[str] = None,
    level: str = "info",
    file_name: Optional[str] = None,
    rank: int = 0,
) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    logger.handlers.clear()
    logger.propagate = False

    fmt = logging.Formatter(
        "[%(asctime)s] %(levelname)s %(message)s", datefmt="%m/%d %H:%M:%S"
    )
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)

    if rank == 0 and log_dir:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, file_name or "train.log")
        # 100 MB rotation, matching the reference handler budget
        fh = logging.handlers.RotatingFileHandler(
            path, maxBytes=100 * 1024 * 1024, backupCount=3
        )
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        init_logger()
    return logger
