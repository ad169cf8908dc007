"""Profiling / tracing utilities.

The reference has no profiling beyond wall-clock strings
(``src/util/utils.py:303-305``); SURVEY.md §5 calls for a jax.profiler
integration and per-step timing as the TPU-native upgrade.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto.

    No-op when log_dir is falsy, so callers can unconditionally wrap their
    hot region and gate with a flag."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Exponential-moving-average step timer with percentile capture."""

    def __init__(self, ema: float = 0.9, keep: int = 1000):
        self.ema = ema
        self.avg: float | None = None
        self.samples: list[float] = []
        self.keep = keep
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else (
            self.ema * self.avg + (1 - self.ema) * dt)
        self.samples.append(dt)
        if len(self.samples) > self.keep:
            del self.samples[: len(self.samples) - self.keep]
        return False

    def stats(self) -> dict:
        if not self.samples:
            return {}
        ss = sorted(self.samples)
        n = len(ss)
        return {
            "step_avg_s": self.avg,
            "step_p50_s": ss[n // 2],
            "step_p90_s": ss[min(int(n * 0.9), n - 1)],
            "step_p99_s": ss[min(int(n * 0.99), n - 1)],
        }
