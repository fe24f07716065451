"""depthestimation_tpu — a TPU-native stereo/monocular depth framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
mspaintenjoyer/DepthEstimation ("depthlib"): stereo rectification, SGM
block matching, disparity post-processing, streaming video depth, and a
monocular depth network — designed TPU-first (SPMD sharding over device
meshes, jitted functional pipeline, Pallas kernels for the hot ops).

Public API mirrors the reference exports (depthlib/__init__.py:1-15).
"""

from .api import (  # noqa: F401
    MonocularDepthEstimator,
    StereoDepthEstimator,
    StereoDepthEstimatorVideo,
)
from .config import CalibConfig, SGMConfig, parse_calib_file  # noqa: F401
from .pipeline import StereoPipeline  # noqa: F401
from .viz import (  # noqa: F401
    visualize_depth,
    visualize_disparity,
    visualize_disparity_and_depth,
    visualize_stereo_pair,
)

__all__ = [
    "StereoDepthEstimator",
    "StereoDepthEstimatorVideo",
    "MonocularDepthEstimator",
    "StereoPipeline",
    "SGMConfig",
    "CalibConfig",
    "parse_calib_file",
    "visualize_stereo_pair",
    "visualize_disparity",
    "visualize_depth",
    "visualize_disparity_and_depth",
]

__version__ = "0.3.0"
