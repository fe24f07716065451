"""Winner-take-all disparity selection with sub-pixel refinement,
uniqueness-ratio test and left-right consistency check (pure JAX).

TPU-native replacement for the selection stage of cv2.StereoSGBM
(reference stereo_core.py:63-75; OpenCV computeDisparitySGBM tail):

- argmin over D on the aggregated volume S,
- uniqueness: pixel invalidated when some non-neighbor candidate d
  (|d - d0| > 1) has S[d]*(100 - uniquenessRatio) < minS*100,
- quadratic sub-pixel interpolation quantized to 1/16 px, matching the
  reference's /16 fixed-point decode contract (stereo_core.py:232),
- left-right consistency: right-view disparity is recovered from the SAME
  aggregated volume via S_R(xr, d) = S_L(xr + d, d) and pixels with
  |d_L(x) - d_R(x - d_L)| > disp12_max_diff are invalidated
  (disp12MaxDiff semantics of stereo_core.py:69; negative disables),
- invalid marker = min_disp - 1, so that downstream 'valid = disp > 0'
  masks behave as in the reference (postprocess.py:55).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["wta_disparity", "right_disparity_from_left_volume"]

_BIG = jnp.float32(1e9)


def _argmin_and_vals(s: jax.Array):
    d0 = jnp.argmin(s, axis=-1)
    min_s = jnp.take_along_axis(s, d0[..., None], axis=-1)[..., 0]
    return d0, min_s


def _subpixel(s: jax.Array, d0: jax.Array) -> jax.Array:
    """Quadratic interpolation around the minimum, OpenCV-style, in units of
    1/16 disparity (returns float offset in [-0.5, 0.5])."""
    num_d = s.shape[-1]
    dm = jnp.clip(d0 - 1, 0, num_d - 1)
    dp = jnp.clip(d0 + 1, 0, num_d - 1)
    c0 = jnp.take_along_axis(s, d0[..., None], axis=-1)[..., 0]
    cm = jnp.take_along_axis(s, dm[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(s, dp[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(cm + cp - 2.0 * c0, 1.0)
    # OpenCV: d*16 + ((cm - cp)*16 + denom) / (denom*2), integer math; we
    # reproduce the same rounding by flooring.
    delta16 = jnp.floor(((cm - cp) * 16.0 + denom) / (denom * 2.0))
    interior = (d0 > 0) & (d0 < num_d - 1)
    return jnp.where(interior, delta16 / 16.0, 0.0)


def right_disparity_from_left_volume(s: jax.Array) -> jax.Array:
    """Right-image integer disparity from the left aggregated volume.

    S_R[h, xr, d] = S_L[h, xr + d, d]; out-of-image candidates get +inf.
    Returns int32 (H, W).
    """
    h, w, num_d = s.shape
    xr = jnp.arange(w)[:, None]
    d = jnp.arange(num_d)[None, :]
    xl = xr + d  # (W, D)
    valid = xl < w
    gathered = s[:, jnp.clip(xl, 0, w - 1), d]  # (H, W, D)
    s_r = jnp.where(valid[None], gathered, _BIG)
    return jnp.argmin(s_r, axis=-1).astype(jnp.int32)


def wta_disparity(
    s: jax.Array,
    min_disp: int = 0,
    uniqueness_ratio: int = 10,
    disp12_max_diff: int = 1,
) -> jax.Array:
    """Select disparity from aggregated volume S (H, W, D).

    Returns float32 (H, W) disparity in pixels (already including min_disp
    and the /16 sub-pixel quantization); invalid pixels = min_disp - 1.
    """
    s = s.astype(jnp.float32)
    num_d = s.shape[-1]
    d0, min_s = _argmin_and_vals(s)

    # Uniqueness-ratio test (OpenCV: S[d]*(100-uniq) < minS*100 for some
    # |d - d0| > 1 => invalid).
    invalid = jnp.zeros(d0.shape, dtype=bool)
    if uniqueness_ratio > 0:
        d_idx = jnp.arange(num_d)
        far = jnp.abs(d_idx[None, None, :] - d0[..., None]) > 1
        competitor = jnp.min(jnp.where(far, s, _BIG), axis=-1)
        invalid = competitor * (100.0 - uniqueness_ratio) < min_s * 100.0

    # Left-right consistency on integer disparities.
    if disp12_max_diff >= 0:
        disp_r = right_disparity_from_left_volume(s)  # (H, W)
        w = s.shape[1]
        xr = jnp.clip(jnp.arange(w)[None, :] - d0, 0, w - 1)
        d_r_at = jnp.take_along_axis(disp_r, xr, axis=1)
        lr_bad = jnp.abs(d_r_at - d0) > disp12_max_diff
        # Pixels whose matching right pixel falls outside the image are
        # invalid anyway (left band; cropped downstream).
        oob = (jnp.arange(w)[None, :] - d0 - min_disp) < 0
        invalid = invalid | lr_bad | oob

    delta = _subpixel(s, d0)
    disp = min_disp + d0.astype(jnp.float32) + delta
    # Quantize to the 1/16 fixed-point grid of the decode contract.
    disp = jnp.round(disp * 16.0) / 16.0
    return jnp.where(invalid, jnp.float32(min_disp - 1), disp)
