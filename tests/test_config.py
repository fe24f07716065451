"""Config semantics tests (reference analogue: tests/test_config.py)."""

import numpy as np
import pytest

from depthestimation_tpu import SGMConfig, StereoDepthEstimator
from depthestimation_tpu.config import parse_calib_file


def test_configure_updates_state():
    est = StereoDepthEstimator(downscale_factor=1.0)
    est.configure_sgbm(block_size=7, uniqueness_ratio=15)
    p = est.get_sgbm_params()
    assert p["block_size"] == 7
    assert p["uniqueness_ratio"] == 15


def test_num_disp_scaled_by_downscale():
    # Reference: 64 * 0.5 -> 32 (tests/test_config.py:22-25,
    # stereo_core.py:111-117).
    est = StereoDepthEstimator(downscale_factor=0.5)
    est.configure_sgbm(num_disp=64)
    assert est.get_sgbm_params()["num_disp"] == 32


def test_focal_and_doffs_scaled():
    est = StereoDepthEstimator(downscale_factor=0.5)
    est.configure_sgbm(focal_length=1000.0, doffs=100.0)
    p = est.get_sgbm_params()
    assert p["focal_length"] == 500.0
    assert p["doffs"] == 50.0


def test_invalid_key_raises():
    est = StereoDepthEstimator()
    with pytest.raises(ValueError, match="Invalid parameter"):
        est.configure_sgbm(bogus_param=1)


def test_invalid_downscale_raises():
    with pytest.raises(ValueError):
        StereoDepthEstimator(downscale_factor=0.0)
    with pytest.raises(ValueError):
        StereoDepthEstimator(downscale_factor=1.5)


def test_config_frozen_and_derived():
    cfg = SGMConfig(block_size=5)
    assert cfg.p1 == 8 * 25 and cfg.p2 == 32 * 25
    with pytest.raises(Exception):
        cfg.block_size = 7
    with pytest.raises(ValueError):
        SGMConfig(num_disp=100)  # not multiple of 16


def test_calibration_gate():
    est = StereoDepthEstimator()
    K = np.eye(3) * 100
    K[2, 2] = 1
    est.configure_sgbm(cam_matrix_L=K, cam_matrix_R=K)
    assert not est.core.cfg.has_full_calibration()
    est.configure_sgbm(image_width=64, image_height=48, baseline=0.1)
    assert est.core.cfg.has_full_calibration()


def test_parse_calib_file(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(
        "cam0=[3997.684 0 1176.728; 0 3997.684 1011.728; 0 0 1]\n"
        "cam1=[3997.684 0 1307.839; 0 3997.684 1011.728; 0 0 1]\n"
        "doffs=131.111\nbaseline=193.001\nwidth=2964\nheight=1988\n"
        "ndisp=280\n"
    )
    out = parse_calib_file(p)
    kw = out["sgbm_kwargs"]
    assert kw["focal_length"] == pytest.approx(3997.684)
    assert kw["baseline"] == pytest.approx(0.193001)
    assert kw["num_disp"] == 288  # 280 rounded up to /16
    assert kw["image_width"] == 2964
