"""Profiling / step-timing utilities — first-class observability the reference
lacks (SURVEY §5: only coarse wall-clock prints, reference train.py:459,628-631).

  * ``step_timer``: rolling per-step wall-clock stats with optional JSONL sink
  * ``trace``: context manager around ``jax.profiler`` for device traces
    viewable in TensorBoard/XProf
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import deque
from typing import Iterator, Optional


class StepTimer:
    """Rolling mean/min wall-clock per step."""

    def __init__(self, window: int = 50, jsonl_path: Optional[str] = None):
        self.times: deque = deque(maxlen=window)
        self.jsonl_path = jsonl_path
        self._t0: Optional[float] = None
        self.count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self.count += 1
        if self.jsonl_path and self.count % 50 == 0:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"step": self.count, "mean_s": self.mean,
                                    "min_s": self.min}) + "\n")

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def min(self) -> float:
        return min(self.times) if self.times else 0.0

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.mean else 0.0


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
