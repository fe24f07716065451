"""Tracing / profiling hooks (SURVEY.md section 5: the reference has only
wall-clock prints, example_stereo.py:28-33; this provides jax.profiler
traces and named stage timing for the TPU pipeline).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

__all__ = ["StageTimer", "trace", "annotate"]


class StageTimer:
    """Accumulating named-stage wall timer with device sync.

    Usage:
        timer = StageTimer()
        with timer("cost_volume"):
            out = cost_fn(...)
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, out=None):
        t0 = time.perf_counter()
        yield
        if self.sync:
            # Block on all pending device work so the stage cost is real.
            jax.effects_barrier()
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            name: {
                "total_ms": round(1000 * t, 2),
                "count": self.counts[name],
                "mean_ms": round(1000 * t / max(self.counts[name], 1), 2),
            }
            for name, t in sorted(self.totals.items())
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/depthestimation_tpu_trace"):
    """Capture a jax.profiler device trace around a region (view with
    tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named TraceAnnotation context for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
