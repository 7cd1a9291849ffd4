"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock prints around render
chunks (reference: pointnerf/run/train_ft.py:281,355 and the iteration
timing in utils/visualizer.py:158-167). The TPU rebuild gets first-
class tooling (SURVEY.md §5): jax.profiler trace capture (viewable in
TensorBoard / Perfetto), a stage timer that forces device completion,
and a per-step rate meter matching the reference's it/s logging.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into `log_dir` (TensorBoard's profile
    plugin or Perfetto read these)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Name a region so it shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock stage timing with device sync at each boundary.

    Usage:
        st = StageTimer()
        out = st.stage("knn", lambda: knn_fn(...))
        print(st.report())
    """

    def __init__(self):
        self.times: Dict[str, float] = {}

    def stage(self, name: str, thunk):
        t0 = time.perf_counter()
        out = thunk()
        jax.block_until_ready(out)
        self.times[name] = self.times.get(name, 0.0) + (
            time.perf_counter() - t0)
        return out

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k:>24s}: {v * 1e3:8.1f} ms ({v / total:5.1%})"
                 for k, v in self.times.items()]
        lines.append(f"{'total':>24s}: {total * 1e3:8.1f} ms")
        return "\n".join(lines)


class RateMeter:
    """Exponential-moving-average step rate (it/s and rays/s)."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self._t: Optional[float] = None
        self.ema_dt: Optional[float] = None

    def tick(self, n_items: int = 1) -> Dict[str, float]:
        now = time.perf_counter()
        out: Dict[str, float] = {}
        if self._t is not None:
            dt = now - self._t
            self.ema_dt = dt if self.ema_dt is None else (
                self.alpha * dt + (1 - self.alpha) * self.ema_dt)
            out = {"it_per_sec": 1.0 / self.ema_dt,
                   "items_per_sec": n_items / self.ema_dt}
        self._t = now
        return out
