"""Device mesh construction for the stereo/mono parallelism axes.

The reference has no multi-device execution (SURVEY.md section 2c); these
are the TPU build's parallelism axes:

- 'data':  frame data-parallelism (generalizes the per-frame video loop,
           StereoDepthEstimatorVideo.py:95-120)
- 'tile':  spatial tile parallelism over image rows with halo exchange
           (the image-domain analogue of sequence/context parallelism;
           generalizes the whole-image SGM call, stereo_core.py:231)
- 'model': tensor parallelism for the mono net ('disp' sharding of the
           cost volume reuses this axis for the stereo block-matching path)

Multi-host: jax.distributed.initialize() before mesh creation places
'data' across hosts (DCN) and 'tile'/'model' within a host (ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "auto_mesh_shape", "initialize_distributed"]


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (jax.distributed). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def auto_mesh_shape(n_devices: int, want_tile: bool = True) -> Tuple[int, int, int]:
    """(data, tile, model) factorization of n_devices: prefer tile
    parallelism for latency, data parallelism for throughput."""
    if n_devices == 1:
        return (1, 1, 1)
    tile = 1
    if want_tile:
        for t in (4, 2):
            if n_devices % t == 0:
                tile = t
                break
    data = n_devices // tile
    return (data, tile, 1)


def make_mesh(shape: Optional[Tuple[int, int, int]] = None,
              axis_names: Sequence[str] = ("data", "tile", "model"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = auto_mesh_shape(len(devices))
    arr = np.asarray(devices)[: int(np.prod(shape))].reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
