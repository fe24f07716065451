"""Post-processing parity vs the cv2 oracles (VERDICT round-1 items 5/8).

cv2 appears ONLY as a test oracle; the framework's compute path never
imports it.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from depthestimation_tpu.ops import filters


def cv2_speckles(disp, new_val, max_size, max_diff):
    d16 = np.round(np.asarray(disp) * 16.0).astype(np.int16)
    cv2.filterSpeckles(d16, int(new_val * 16), int(max_size),
                       int(max_diff * 16))
    return d16.astype(np.float32) / 16.0


def ours_speckles(disp, new_val, max_size, max_diff):
    return np.asarray(
        filters.filter_speckles(
            jnp.asarray(disp), new_val=new_val,
            max_speckle_size=max_size, max_diff=max_diff,
        )
    )


def test_speckle_random_field_exact():
    rng = np.random.default_rng(0)
    h, w = 96, 128
    # Quantized random disparity with scattered invalid pixels: many small
    # components at tolerance 1.
    d = rng.integers(0, 12, (h, w)).astype(np.float32)
    d[rng.random((h, w)) < 0.25] = 0.0
    ref = cv2_speckles(d, 0.0, 30, 1.0)
    got = ours_speckles(d, 0.0, 30, 1.0)
    np.testing.assert_array_equal(got, ref)


def test_speckle_snake_component():
    """A 1-px-wide snake: long path distance, small bounding box steps —
    the shape that breaks naive windowed counting."""
    h, w = 40, 60
    d = np.zeros((h, w), np.float32)
    # Build a serpentine of length ~= 3*w/2 > max_size.
    cols = list(range(2, w - 2))
    r = 5
    snake = [(r, c) for c in cols] + [(r + 1, w - 3)] + \
            [(r + 2, c) for c in reversed(cols)]
    for y, x in snake:
        d[y, x] = 7.0
    # Plus a small blob that must be removed.
    d[20:23, 10:13] = 5.0
    max_size = len(snake) - 5
    ref = cv2_speckles(d, 0.0, max_size, 1.0)
    got = ours_speckles(d, 0.0, max_size, 1.0)
    np.testing.assert_array_equal(got, ref)
    assert got[21, 11] == 0.0  # blob removed
    assert got[5, 10] == 7.0  # snake survives (size > max_size)


def test_speckle_exact_size_boundary():
    """Components of size exactly max_size (removed) vs max_size + 1
    (kept) — exercises the truncated-count convergecast at its bound."""
    h, w = 50, 80
    d = np.zeros((h, w), np.float32)
    d[10, 10:30] = 3.0  # 20 px — removed at max_size=20
    d[30, 10:31] = 3.0  # 21 px — kept
    ref = cv2_speckles(d, 0.0, 20, 1.0)
    got = ours_speckles(d, 0.0, 20, 1.0)
    np.testing.assert_array_equal(got, ref)
    assert (got[10] == 0).all()
    assert got[30, 10] == 3.0


def test_speckle_large_smooth_region_not_fragmented():
    """Convergence property: a big smooth gradient region must never be
    deleted by under-converged labels fragmenting into small pieces."""
    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w]
    # |neighbor diff| < 1, quantized to the 1/16 grid so the cv2 x16 int16
    # round-trip is lossless.
    d = np.round((5 + (xx + yy) / 64.0) * 16) / 16.0
    d = d.astype(np.float32)
    ref = cv2_speckles(d, 0.0, 100, 1.0)
    got = ours_speckles(d, 0.0, 100, 1.0)
    np.testing.assert_array_equal(got, ref)
    assert (got > 0).all()


def test_median3x3_matches_cv2():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, (64, 96)).astype(np.float32)
    ref = cv2.medianBlur(x, 3)
    got = np.asarray(filters.median3x3(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("k", [3, 5])
def test_box_mean_matches_cv2(k):
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 255, (48, 72)).astype(np.float32)
    ref = cv2.boxFilter(x, -1, (k, k))  # default BORDER_REFLECT_101
    got = np.asarray(filters.box_mean(jnp.asarray(x), k))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_fill_holes_pyramid_covers_large_holes():
    """The push-pull fill must seed arbitrarily large holes (the round-1
    seeding needed O(H+W) sequential passes and effectively never finished
    at scale)."""
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    d = (10 + xx / 16.0).astype(np.float32)
    hole = (xx - 64) ** 2 + (yy - 64) ** 2 < 40**2  # big central hole
    d_in = np.where(hole, 0.0, d).astype(np.float32)
    out = np.asarray(filters.fill_holes(jnp.asarray(d_in), method="inpaint"))
    assert (out[hole] > 0).all()
    # Filled values stay within the surrounding value range.
    assert out[hole].min() >= d[~hole].min() - 1
    assert out[hole].max() <= d[~hole].max() + 1
