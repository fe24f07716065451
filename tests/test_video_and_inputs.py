"""Input seam + streaming facade tests.

Covers the reference's tests/test_inputs.py (missing-file error message)
and adds what it lacked: an end-to-end video-facade run over synthetic
iterable frame sources, checking exact frame counts through the async
double-buffered loop, the input pipeline's drop policies, and the metrics
the reference never emitted.
"""

import numpy as np
import pytest

from depthestimation_tpu.api import StereoDepthEstimator, StereoDepthEstimatorVideo
from depthestimation_tpu.io.input import load_stereo_pair
from depthestimation_tpu.io.threaded import StereoInputPipeline


def test_missing_file_raises():
    """Reference tests/test_inputs.py:6-13 — message parity."""
    with pytest.raises(FileNotFoundError, match="One or both image paths"):
        load_stereo_pair("/nonexistent/left.png", "/nonexistent/right.png")


def test_estimator_requires_sources():
    est = StereoDepthEstimator()
    with pytest.raises(ValueError, match="must be provided"):
        est.estimate_depth()


def _frames(n, h=32, w=96, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w + 8), np.uint8)
    left = np.stack([base[:, :w]] * 3, -1)
    right = np.stack([base[:, 4 : w + 4]] * 3, -1)
    return [left] * n, [right] * n


def test_input_pipeline_offline_keeps_every_frame():
    """Offline policy must never drop: exact frame count through the
    bounded prefetch buffer, including the end-marker path."""
    import time

    left, right = _frames(7)
    pipe = StereoInputPipeline(left, right, prefetch=2, drop_frames=False)
    pipe.start()
    seen = 0
    for _l, _r in pipe:
        time.sleep(0.02)  # force producer backpressure
        seen += 1
    pipe.stop()
    assert seen == 7
    assert pipe.frames_dropped == 0


def test_video_facade_yields_every_frame_with_metrics():
    n = 5
    left, right = _frames(n)
    vid = StereoDepthEstimatorVideo(
        left_source=left, right_source=right, fast_mode=True, target_fps=0
    )
    vid.configure_sgbm(num_disp=16, focal_length=500.0, baseline=0.1,
                       speckle_window_size=0)
    depths = list(vid.estimate_depth())
    assert len(depths) == n
    assert all(d is not None and d.shape == (32, 96 - 16) for d in depths)
    assert vid.metrics.frames == n
    assert vid.metrics.mean_latency_ms > 0
    assert vid.metrics.last.valid_fraction > 0


def test_video_facade_temporal_smoothing_runs():
    n = 4
    left, right = _frames(n, seed=1)
    vid = StereoDepthEstimatorVideo(
        left_source=left, right_source=right, fast_mode=True, target_fps=0,
        use_threading=False,
    )
    vid.configure_sgbm(num_disp=16, focal_length=500.0, baseline=0.1,
                       speckle_window_size=0, temporal_alpha=0.5)
    depths = list(vid.estimate_depth())
    assert len(depths) == n
