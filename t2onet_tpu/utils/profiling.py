"""Tracing / profiling — first-class, unlike the reference's manual tik/tok
prints (SURVEY.md §5.1).

- `trace(dir)`: context manager around `jax.profiler` producing a
  TensorBoard-viewable device trace.
- `PhaseTimer`: running per-phase step timing with the reference's
  running-average semantics (train_seq2seqL1.py:70-92), plus percentile
  summaries.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into `log_dir`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    # exact running mean over ALL samples; percentiles over a bounded
    # recent window so week-long runs don't accumulate unbounded floats
    _WINDOW = 4096

    def __init__(self):
        self._samples: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=self._WINDOW))
        self._avg: Dict[str, float] = defaultdict(float)
        self._n: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._samples[name].append(dt)
            self._n[name] += 1
            n = self._n[name]
            self._avg[name] += (dt - self._avg[name]) / n

    def avg(self, name: str) -> float:
        return self._avg[name]

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            xs_sorted = sorted(xs)
            k = len(xs_sorted)
            out[name] = {
                "mean": self._avg[name],
                "p50": xs_sorted[k // 2],
                "p90": xs_sorted[min(int(k * 0.9), k - 1)],
                "n": self._n[name],
            }
        return out

    def report(self) -> str:
        return "  ".join(
            f"{k}: {v['mean'] * 1e3:.1f}ms (p90 {v['p90'] * 1e3:.1f})"
            for k, v in self.summary().items())
