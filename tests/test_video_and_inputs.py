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


class _Poison:
    """Opaque object that defeats numpy image handling downstream."""


def test_input_pipeline_isolates_corrupt_frame():
    """Per-frame error isolation (SURVEY.md section 5): a frame that blows
    up in decode is counted and skipped; the stream completes."""
    left, right = _frames(5)
    left = list(left)
    left[2] = _Poison()  # downscale stage will raise on this frame
    pipe = StereoInputPipeline(left, right, downscale_factor=0.5,
                               drop_frames=False)
    pipe.start()
    seen = sum(1 for _ in pipe)
    pipe.stop()
    assert seen == 4
    assert pipe.frames_failed == 1


def test_input_pipeline_gives_up_after_consecutive_failures():
    n_bad = StereoInputPipeline.MAX_CONSECUTIVE_FAILURES + 3
    left = [_Poison()] * n_bad
    right, _ = _frames(n_bad)
    pipe = StereoInputPipeline(left, right, downscale_factor=0.5)
    pipe.start()
    seen = sum(1 for _ in pipe)
    pipe.stop()
    assert seen == 0
    assert pipe.frames_failed == StereoInputPipeline.MAX_CONSECUTIVE_FAILURES


def test_video_facade_isolates_compute_failure():
    """A frame the device pipeline rejects is skipped and counted; the
    generator keeps yielding the healthy frames."""
    n = 5
    left, right = _frames(n)
    left = list(left)
    left[2] = _Poison()  # jnp.asarray raises at dispatch
    vid = StereoDepthEstimatorVideo(
        left_source=left, right_source=right, fast_mode=True, target_fps=0,
        use_threading=False,
    )
    vid.configure_sgbm(num_disp=16, focal_length=500.0, baseline=0.1,
                       speckle_window_size=0)
    depths = list(vid.estimate_depth())
    assert len(depths) == n - 1
    assert vid.metrics.frames_failed == 1
    assert vid.metrics.frames == n - 1


def test_video_facade_gives_up_after_consecutive_compute_failures():
    """Consumer-side failure budget (VERDICT r4 weak #5): a persistently
    broken pipeline raises after MAX_CONSECUTIVE_FAILURES instead of
    silently yielding nothing forever."""
    import pytest

    budget = StereoDepthEstimatorVideo.MAX_CONSECUTIVE_FAILURES
    n = budget + 3
    left = [_Poison()] * n  # every dispatch raises
    _, right = _frames(n)
    vid = StereoDepthEstimatorVideo(
        left_source=left, right_source=right, fast_mode=True, target_fps=0,
        use_threading=False,
    )
    vid.configure_sgbm(num_disp=16, speckle_window_size=0)
    with pytest.raises(RuntimeError, match="consecutive frame failures"):
        list(vid.estimate_depth())
    assert vid.metrics.frames_failed == budget


def test_configure_resets_temporal_state():
    """Reconfiguring mid-stream must drop the temporal-smoother carry: its
    shape is tied to the old config's crop width (VERDICT r4 weak #4)."""
    from depthestimation_tpu.pipeline import StereoPipeline

    left, right = _frames(1)
    pipe = StereoPipeline(fast_mode=True)
    pipe.configure(num_disp=16, speckle_window_size=0, temporal_alpha=0.5)
    pipe.process_pair(left[0][..., 0].astype(np.float32),
                      right[0][..., 0].astype(np.float32))
    pipe.process_pair(left[0][..., 0].astype(np.float32),
                      right[0][..., 0].astype(np.float32))
    assert pipe._prev_disp is not None
    pipe.configure(num_disp=32)
    assert pipe._prev_disp is None
    # And the reconfigured pipeline runs cleanly from a fresh carry.
    d, _ = pipe.process_pair(left[0][..., 0].astype(np.float32),
                             right[0][..., 0].astype(np.float32))
    assert d.shape == (32, 96 - 32)


def test_single_frame_stream_reports_latency_derived_fps():
    """A one-frame stream has no inter-frame interval; throughput_fps must
    fall back to the latency-derived rate instead of 0 (ADVICE r4)."""
    left, right = _frames(1)
    vid = StereoDepthEstimatorVideo(
        left_source=left, right_source=right, fast_mode=True, target_fps=0,
        use_threading=False,
    )
    vid.configure_sgbm(num_disp=16, speckle_window_size=0)
    assert len(list(vid.estimate_depth())) == 1
    assert vid.metrics.frames == 1
    assert vid.metrics.throughput_fps > 0


def test_video_facade_uint8_frames_fp16_depth_and_bytes():
    """Host-link-honest streaming (VERDICT r4 #3): uint8 frames flow
    end-to-end, depth comes back float16, and the metrics account
    bytes-per-frame on the link."""
    n = 3
    left, right = _frames(n)
    lf = [f[..., 0] for f in left]   # (H, W) uint8
    rf = [f[..., 0] for f in right]
    vid = StereoDepthEstimatorVideo(
        left_source=lf, right_source=rf, fast_mode=True, target_fps=0,
        depth_dtype="float16",
    )
    vid.configure_sgbm(num_disp=16, focal_length=500.0, baseline=0.1,
                       speckle_window_size=0)
    depths = list(vid.estimate_depth())
    assert len(depths) == n
    assert all(d.dtype == np.float16 for d in depths)
    s = vid.metrics.summary()
    assert s["bytes_per_frame_in"] == 2 * 32 * 96          # uint8 pair
    assert s["bytes_per_frame_out"] == 16 + 32 * (96 - 16) * 2  # stats+fp16
    assert vid.metrics.last.valid_fraction > 0
    assert vid.metrics.last.disp_max >= vid.metrics.last.disp_min > 0


def test_video_facade_rejects_bad_depth_dtype():
    import pytest

    with pytest.raises(ValueError, match="depth_dtype"):
        StereoDepthEstimatorVideo(depth_dtype="int8")


def test_video_facade_stop_request():
    """stop() ends the generator after the in-flight frame (the reference's
    ESC exit, StereoDepthEstimatorVideo.py:111-112)."""
    n = 6
    left, right = _frames(n)
    vid = StereoDepthEstimatorVideo(
        left_source=left, right_source=right, fast_mode=True, target_fps=0,
        use_threading=False,
    )
    vid.configure_sgbm(num_disp=16, speckle_window_size=0)
    got = 0
    for _ in vid.estimate_depth():
        got += 1
        vid.stop()
    assert got == 1
