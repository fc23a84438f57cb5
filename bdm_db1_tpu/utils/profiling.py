"""Tracing/profiling utilities.

The reference's only observability is DeepSpeed's ``wall_clock_breakdown``
(reference: scripts/evaluate/evaluate_rl_1.2B.sh:35-40; SURVEY.md §5). TPU
equivalents here: ``jax.profiler`` traces viewable in XProf/Perfetto/
TensorBoard, a step timer with tokens/sec accounting, and device HBM stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, *, host_profile: bool = False):
    """Capture a device trace: ``with profile_trace("/tmp/trace"): step()``."""
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling step-time / throughput meter (wall_clock_breakdown analogue)."""

    def __init__(self, tokens_per_step: Optional[int] = None,
                 window: int = 50):
        self.tokens_per_step = tokens_per_step
        self.window = window
        self._times = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    @property
    def steps_per_sec(self) -> float:
        t = self.mean_step_time
        return 1.0 / t if t else 0.0

    @property
    def tokens_per_sec(self) -> float:
        if not self.tokens_per_step:
            return 0.0
        return self.tokens_per_step * self.steps_per_sec

    def summary(self) -> Dict[str, float]:
        return {
            "step_time_ms": self.mean_step_time * 1e3,
            "steps_per_sec": self.steps_per_sec,
            "tokens_per_sec": self.tokens_per_sec,
        }


def device_memory_stats(device=None) -> Dict[str, float]:
    """HBM usage of a device (zeros when the backend lacks the API)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": float(stats.get("bytes_in_use", 0)),
        "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
        "bytes_limit": float(stats.get("bytes_limit", 0)),
    }
