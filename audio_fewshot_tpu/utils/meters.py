"""Running meters + optional TensorBoard emission.

Reference: ``AverageMeter`` backed by a pandas DataFrame that writes every
update to TensorBoard (libfewshot_core/utils/utils.py:38-71) and the
step-stamped ``TensorboardWriter`` proxy (utils/visualizer.py).  Here the
meter is a plain dict (no pandas) and TB writing is decoupled/optional —
per-step host writes would stall the TPU feed.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional


class AverageMeter:
    def __init__(self, name: str, keys: Iterable[str], writer: Optional["TensorboardWriter"] = None):
        self.name = name
        self.keys = list(keys)
        self.writer = writer
        self.reset()

    def reset(self) -> None:
        self._sum: Dict[str, float] = {k: 0.0 for k in self.keys}
        self._count: Dict[str, int] = {k: 0 for k in self.keys}
        self._last: Dict[str, float] = {k: 0.0 for k in self.keys}

    def update(self, key: str, value: float, n: int = 1) -> None:
        value = float(value)
        self._sum[key] += value * n
        self._count[key] += n
        self._last[key] = value
        if self.writer is not None:
            self.writer.add_scalar(f"{self.name}/{key}", value)

    def last(self, key: str) -> float:
        return self._last[key]

    def avg(self, key: str) -> float:
        c = self._count[key]
        return self._sum[key] / c if c else 0.0


class TensorboardWriter:
    """Step-stamped TensorBoard proxy (reference utils/visualizer.py:1-50).
    Backed by torch's SummaryWriter when available; silently no-ops otherwise
    so headless environments don't grow a tensorboard dependency."""

    def __init__(self, log_dir: str):
        self.step = 0
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:
            self._writer = None

    def set_step(self, step: int) -> None:
        self.step = step

    def add_scalar(self, tag: str, value: float, step: Optional[int] = None) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, self.step if step is None else step)

    def add_histogram(self, tag: str, values, step: Optional[int] = None) -> None:
        if self._writer is not None:
            self._writer.add_histogram(tag, values, self.step if step is None else step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
