"""Pallas TPU kernels for the SGM hot path (cost volume + aggregation).

Drop-in accelerated implementation of ops/costs.py + ops/sgm.py + ops/wta.py
fused sweeps. Falls back to the XLA reference implementation (pipeline.py
raw_disparity) until each kernel lands.
"""

from __future__ import annotations


def sgm_disparity(left, right, cfg):
    """Fused Pallas matcher. Raises NotImplementedError until the kernels
    land; callers fall back to the XLA path."""
    raise NotImplementedError
