"""Profiling and metrics: structured replacements for the reference's printfs.

The reference's observability is stdout printf + gettimeofday timers
(SURVEY §5.1, src/utils.c:29, examples/detector.c:131).  Here:

  - StepTimer: wall-clock per-step timing with device-sync-free amortized
    mode (on tunneled dev TPUs, per-call sync costs ~25 ms; see bench.py)
  - trace(): context manager around jax.profiler for XLA-level traces
    viewable in TensorBoard / Perfetto
  - MetricsWriter: JSONL metrics log (step, loss, lr, imgs/sec, ...) — the
    structured successor of the reference's per-batch print line
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Rolling-average step timer (EMA like the reference's avg loss)."""

    decay: float = 0.9
    avg: float | None = None
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.decay * self.avg + (1 - self.decay) * dt
        return dt


class MetricsWriter:
    """Append-only JSONL metrics, one object per step/event."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def write(self, step: int, **metrics):
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()
