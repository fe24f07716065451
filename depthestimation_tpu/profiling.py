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
import numpy as np

__all__ = ["StageTimer", "trace", "annotate", "hard_sync"]


def hard_sync(tree):
    """Device->host barrier that provably waits on every backend.

    On the axon TPU plugin both ``jax.block_until_ready`` and
    ``jax.effects_barrier`` can return before the device work has finished
    (measured: a 115 ms matcher call "completed" in 0.07 ms under
    block_until_ready). The only fence that reliably waits is a
    device->host copy of the produced buffers, so every timing path in this
    package syncs through here. Returns the tree unchanged.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "__array__"):
            np.asarray(leaf)
    return tree


class _OutHolder:
    """Mutable slot a timed block stores its device outputs in."""

    __slots__ = ("out",)

    def __init__(self):
        self.out = None


class StageTimer:
    """Accumulating named-stage wall timer with device sync.

    Usage:
        timer = StageTimer()
        with timer("cost_volume") as t:
            t.out = cost_fn(...)   # synced via hard_sync before stopping
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, out=None):
        """Times the block. The block should hand its device outputs to the
        yielded holder (``ctx.out = result``) so the timer can fence on them
        with a real device->host sync; otherwise only submitted-work wall
        time is measured (see hard_sync for why softer barriers lie)."""
        holder = _OutHolder()
        t0 = time.perf_counter()
        yield holder
        if self.sync and holder.out is not None:
            hard_sync(holder.out)
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
