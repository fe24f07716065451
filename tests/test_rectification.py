"""Rectification parity vs the cv2 oracle + cache semantics.

Covers the reference's tests/test_rectification.py and
tests/test_rectification_cache.py plus the numerical parity the reference
never had: stereo_rectify vs cv2.stereoRectify, map building vs
cv2.initUndistortRectifyMap (bit-exact), remap vs cv2.remap.
"""

import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from depthestimation_tpu import calib as C
from depthestimation_tpu.config import CalibConfig, SGMConfig
from depthestimation_tpu.ops.remap import remap_bilinear
from depthestimation_tpu.pipeline import StereoPipeline

SIZE = (640, 480)
K1 = np.array([[700.0, 0, 315.0], [0, 695.0, 245.0], [0, 0, 1]])
K2 = np.array([[702.0, 0, 325.0], [0, 698.0, 238.0], [0, 0, 1]])
D1 = np.array([-0.28, 0.07, 1e-3, -2e-3, 0.0])
D2 = np.array([-0.25, 0.06, -1e-3, 1e-3, 0.0])
RVEC = np.array([0.01, -0.02, 0.005])
T = np.array([-0.54, 0.003, 0.01])


@pytest.mark.parametrize("alpha", [-1.0, 0.0, 0.5, 1.0])
@pytest.mark.parametrize("distorted", [False, True])
def test_stereo_rectify_matches_cv2(alpha, distorted):
    d1, d2 = (D1, D2) if distorted else (np.zeros(5), np.zeros(5))
    R = cv2.Rodrigues(RVEC)[0] if distorted else np.eye(3)
    t = T if distorted else np.array([-0.5, 0.0, 0.0])

    R1, R2, P1, P2, Q = C.stereo_rectify(K1, d1, K2, d2, SIZE, R, t,
                                         alpha=alpha)
    cR1, cR2, cP1, cP2, cQ, _, _ = cv2.stereoRectify(
        K1, d1, K2, d2, SIZE, R, t.reshape(3, 1), alpha=alpha,
        flags=cv2.CALIB_ZERO_DISPARITY,
    )
    np.testing.assert_allclose(R1, cR1, atol=1e-12)
    np.testing.assert_allclose(R2, cR2, atol=1e-12)
    # alpha scaling goes through cv2-internal float32 rectangles; 1e-4 px
    # on principal points/focal is far below epipolar significance.
    tol = 1e-9 if alpha < 0 else 1e-4
    np.testing.assert_allclose(P1, cP1, atol=tol)
    np.testing.assert_allclose(P2, cP2, atol=tol)
    np.testing.assert_allclose(Q, cQ, atol=tol)


def test_init_undistort_rectify_map_bit_exact():
    R1, _, P1, _, _ = C.stereo_rectify(
        K1, D1, K2, D2, SIZE, cv2.Rodrigues(RVEC)[0], T, alpha=1.0
    )
    mx, my = C.init_undistort_rectify_map(K1, D1, R1, P1, SIZE)
    cmx, cmy = cv2.initUndistortRectifyMap(K1, D1, R1, P1[:, :3], SIZE,
                                           cv2.CV_32FC1)
    np.testing.assert_array_equal(mx, cmx)
    np.testing.assert_array_equal(my, cmy)


def test_remap_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    # Smooth in-bounds + some out-of-bounds coordinates.
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    map_x = (xx * 0.97 + 3.4 + 5 * np.sin(yy / 17)).astype(np.float32)
    map_y = (yy * 1.02 - 2.7 + 4 * np.cos(xx / 23)).astype(np.float32)
    ours = np.asarray(remap_bilinear(img, map_x, map_y))
    ref = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    # cv2 uses 5-bit fixed-point interpolation weights; bound accordingly.
    assert np.abs(ours - ref).max() < 0.5


def _calib_cfg():
    return CalibConfig(
        cam_matrix_l=tuple(K1.ravel()), cam_matrix_r=tuple(K2.ravel()),
        image_width=SIZE[0], image_height=SIZE[1],
        dist_coeff_l=tuple(D1), dist_coeff_r=tuple(D2),
    )


def test_rectification_cache_identity():
    """Reference tests/test_rectification_cache.py:6-48: identical params
    -> the same maps object; changed baseline -> a fresh one."""
    cache = C.RectificationCache()
    calib = _calib_cfg()
    m1 = cache.get_maps(calib, baseline=0.5)
    m2 = cache.get_maps(calib, baseline=0.5)
    assert m1 is m2
    m3 = cache.get_maps(calib, baseline=0.6)
    assert m3 is not m1
    cache.clear()
    assert cache.get_maps(calib, baseline=0.6) is not m3


def test_rectified_pipeline_end_to_end():
    """Full-calibration path: rectify via our maps == rectify via cv2 maps
    (reference test_rectification.py analogue with a numerical gate)."""
    rng = np.random.default_rng(1)
    img_l = rng.integers(0, 255, (SIZE[1], SIZE[0])).astype(np.float32)
    img_r = rng.integers(0, 255, (SIZE[1], SIZE[0])).astype(np.float32)

    maps = C.rectification_maps(_calib_cfg(), baseline=0.5, alpha=1.0)
    ours = np.asarray(remap_bilinear(img_l, maps["map_x_l"], maps["map_y_l"]))

    cR1, _, cP1, _, _, _, _ = cv2.stereoRectify(
        K1, D1, K2, D2, SIZE, np.eye(3), np.array([[-0.5], [0.0], [0.0]]),
        alpha=1.0, flags=cv2.CALIB_ZERO_DISPARITY,
    )
    cmx, cmy = cv2.initUndistortRectifyMap(K1, D1, cR1, cP1[:, :3], SIZE,
                                           cv2.CV_32FC1)
    ref = cv2.remap(img_l, cmx, cmy, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    # Valid-region agreement; borders may differ by interpolation rounding.
    diff = np.abs(ours - ref)
    assert np.median(diff) < 0.5
    assert (diff < 1.0).mean() > 0.97
    assert img_r.shape == ref.shape  # rectified output keeps calib size


def test_pipeline_prepare_rectified_shapes():
    """StereoPipeline full-calibration path returns calib-sized grayscale
    float32 (reference test_rectification.py:6-31 analogue)."""
    cfg = SGMConfig(num_disp=16, baseline=0.5).updated(
        cam_matrix_L=K1, cam_matrix_R=K2,
        image_width=SIZE[0], image_height=SIZE[1],
    )
    assert cfg.has_full_calibration()
    pipe = StereoPipeline(cfg)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (SIZE[1], SIZE[0], 3)).astype(np.uint8)
    rl, rr = pipe.prepare_rectified(img, img)
    assert rl.shape == (SIZE[1], SIZE[0]) and rr.shape == (SIZE[1], SIZE[0])
    assert str(rl.dtype) == "float32"


def test_calib_size_mismatch_warns():
    """Reference parity (rectify.py:99-104): a RuntimeWarning fires before
    silently resizing inputs that disagree with the calibration size."""
    cfg = SGMConfig(num_disp=16, baseline=0.5).updated(
        cam_matrix_L=K1, cam_matrix_R=K2,
        image_width=SIZE[0], image_height=SIZE[1],
    )
    pipe = StereoPipeline(cfg)
    rng = np.random.default_rng(3)
    small = rng.integers(0, 255, (SIZE[1] // 2, SIZE[0] // 2, 3)).astype(np.uint8)
    with pytest.warns(RuntimeWarning, match="does not match"):
        rl, rr = pipe.prepare_rectified(small, small)
    assert rl.shape == (SIZE[1], SIZE[0])


def test_remap_banded_path_taken_and_exact():
    """Rectification-shaped maps must take the banded (gather-free) path
    and match the gather fallback exactly (VERDICT r3 #4)."""
    from depthestimation_tpu.ops import remap as R

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    map_x = (xx * 1.01 - 1.2 + 2 * np.sin(yy / 31)).astype(np.float32)
    map_y = (yy * 0.99 + 0.8 + 1.5 * np.cos(xx / 41)).astype(np.float32)
    banded = R.remap_banded(img, map_x, map_y)
    assert banded is not None, "rectification-scale maps must stay banded"
    gather = R._remap_gather(img, jnp.asarray(map_x), jnp.asarray(map_y))
    np.testing.assert_allclose(np.asarray(banded), np.asarray(gather),
                               atol=1e-3)
    ref = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    assert np.abs(np.asarray(banded) - ref).max() < 0.5


def test_remap_wide_warp_falls_back():
    from depthestimation_tpu.ops import remap as R

    img = np.zeros((64, 64), np.float32)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    # A transpose warp displaces both axes by +-H: far outside any sane
    # rectification band.
    map_x = yy.astype(np.float32)
    map_y = xx.astype(np.float32)
    assert R.remap_banded(img, map_x, map_y) is None
    out = R.remap_bilinear(img + 1.0, map_x, map_y)  # must not crash
    assert np.asarray(out).shape == (64, 64)


def test_remap_banded_pallas_matches_xla():
    """The Pallas banded-remap kernel (TPU path) must match the XLA
    shifted-plane implementation exactly (interpret mode)."""
    from depthestimation_tpu.ops import remap as R

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (48, 160)).astype(np.float32)
    yy, xx = np.mgrid[0:48, 0:160].astype(np.float32)
    map_x = (xx * 1.02 - 2.1 + 1.5 * np.sin(yy / 13)).astype(np.float32)
    map_y = (yy * 0.98 + 1.3 + 1.2 * np.cos(xx / 29)).astype(np.float32)
    ref = np.asarray(R.remap_banded(img, map_x, map_y))
    R.INTERPRET = True
    try:
        got = np.asarray(R.remap_banded(img, map_x, map_y))
    finally:
        R.INTERPRET = False
    np.testing.assert_allclose(got, ref, atol=1e-4)
    cvref = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    assert np.abs(got - cvref).max() < 0.5
