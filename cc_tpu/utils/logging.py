"""Observability: metric accumulators, CSV logs, optional TensorBoard,
step timing — parity with logger.py (AverageMeter), train.py:317-323 (two
CSVs), §5.5 of SURVEY.md. Adds what the reference lacks (SURVEY.md §5.1):
jax.profiler trace hooks and per-step wall-clock timing.
"""
from __future__ import annotations

import csv
import os
import time
from contextlib import contextmanager


class AverageMeter:
    """Vector running means (logger.py:62-89)."""

    def __init__(self, i: int = 1, precision: int = 3):
        self.meters = i
        self.precision = precision
        self.reset()

    def reset(self):
        self.val = [0.0] * self.meters
        self.avg = [0.0] * self.meters
        self.sum = [0.0] * self.meters
        self.count = 0

    def update(self, val, n: int = 1):
        if not isinstance(val, (list, tuple)):
            val = [val]
        assert len(val) == self.meters
        self.count += n
        self.val = [float(v) for v in val]
        self.sum = [s + v * n for s, v in zip(self.sum, self.val)]
        self.avg = [s / self.count for s in self.sum]

    def __repr__(self):
        val = " ".join(f"{v:.{self.precision}f}" for v in self.val)
        avg = " ".join(f"{a:.{self.precision}f}" for a in self.avg)
        return f"{val} ({avg})"


class CsvLogger:
    def __init__(self, path: str, header: list[str]):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", newline="") as f:
            csv.writer(f, delimiter="\t").writerow(header)

    def append(self, row):
        with open(self.path, "a", newline="") as f:
            csv.writer(f, delimiter="\t").writerow(row)


class SummaryLogger:
    """Scalar/image logger: tensorboardX when available, CSV fallback."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except ImportError:
            self._scalars = CsvLogger(
                os.path.join(log_dir, "scalars.tsv"),
                ["tag", "value", "step"])

    def add_scalar(self, tag, value, step):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        else:
            self._scalars.append([tag, float(value), step])

    def add_image(self, tag, img_hwc, step):
        if self._tb is not None:
            import numpy as np
            self._tb.add_image(tag, np.transpose(img_hwc, (2, 0, 1)), step)

    def add_histogram(self, tag, values, step):
        if self._tb is not None:
            self._tb.add_histogram(tag, values, step)


@contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace around a region (set CC_PROFILE_DIR to enable)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Batch/data wall-clock meters (train.py:424-425 pattern)."""

    def __init__(self):
        self.data_time = AverageMeter()
        self.batch_time = AverageMeter()
        self._t = time.time()

    def mark_data(self):
        now = time.time()
        self.data_time.update(now - self._t)
        self._t = now

    def mark_step(self):
        now = time.time()
        self.batch_time.update(now - self._t)
        self._t = now
