"""Golden-value depth math tests (reference analogue:
tests/test_math_core.py — Z = f*B/d on tiny maps)."""

import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.ops.depth import disparity_to_depth


def test_depth_golden_value():
    # Z = 1000 * 0.5 / 100 = 5.0 (reference tests/test_math_core.py).
    disp = jnp.full((1, 1), 100.0)
    z = disparity_to_depth(disp, 1000.0, 0.5)
    assert np.allclose(np.asarray(z), 5.0)


def test_depth_doffs():
    disp = jnp.full((1, 1), 90.0)
    z = disparity_to_depth(disp, 1000.0, 0.5, doffs=10.0)
    assert np.allclose(np.asarray(z), 5.0)


def test_invalid_is_inf_not_zero():
    # stereo_core.py:260-266: invalid regions -> +inf.
    disp = jnp.array([[0.0, -1.0, 50.0]])
    z = np.asarray(disparity_to_depth(disp, 1000.0, 0.5, eps=1e-6))
    assert np.isinf(z[0, 0]) and np.isinf(z[0, 1])
    assert np.isfinite(z[0, 2])


def test_max_depth_clamp():
    disp = jnp.array([[1.0]])
    z = np.asarray(disparity_to_depth(disp, 1000.0, 0.5, max_depth=100.0))
    assert z[0, 0] == 100.0


def test_eps_min_disp_quirk():
    # eps = min_disp semantics (stereo_core.py:189,194-195): disparities at
    # or below eps are invalid.
    disp = jnp.array([[5.0, 5.1]])
    z = np.asarray(disparity_to_depth(disp, 1000.0, 0.5, eps=5.0))
    assert np.isinf(z[0, 0]) and np.isfinite(z[0, 1])
