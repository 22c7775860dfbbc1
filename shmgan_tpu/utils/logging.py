"""Structured metric logging + console progress (SURVEY.md §5 observability).

Replaces the reference's TensorBoard writer / disabled Comet scaffolding / ASCII
progress bar (ShmGANwithSSpecSeg.py:897,1000; utils.py:160-179) with a jsonl metrics
stream (one line per log event, trivially greppable/plottable) and a dependency-free
progress bar. TensorBoard is optional: when `tensorboard` or `tensorboardX` is
importable, scalars mirror there too.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict


class MetricsWriter:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 use_tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def progress_bar(iteration: int, total: int, prefix: str = "", length: int = 50,
                 stream=sys.stdout):
    """Terminal progress bar (utils.py:160-179 behavior, dependency-free)."""
    total = max(total, 1)
    frac = min(iteration / total, 1.0)
    filled = int(length * frac)
    bar = "#" * filled + "-" * (length - filled)
    stream.write(f"\r {prefix}|{bar}| {100 * frac:.2f}%")
    if iteration >= total:
        stream.write("\n")
    stream.flush()


class StepTimer:
    """Images/sec + step-time tracker (reference: default_timer around epochs,
    ShmGANwithSSpecSeg.py:894,1102-1106; per-image time.time() in test.py:299)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._images = 0

    def tick(self, images: int = 1):
        self._steps += 1
        self._images += images

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self._steps / max(self.elapsed, 1e-9)

    @property
    def images_per_sec(self) -> float:
        return self._images / max(self.elapsed, 1e-9)
