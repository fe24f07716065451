"""Winner-take-all disparity selection with sub-pixel refinement,
uniqueness-ratio test and left-right consistency check (pure JAX).

TPU-native replacement for the selection stage of cv2.StereoSGBM
(reference stereo_core.py:63-75; OpenCV computeDisparitySGBM tail):

- argmin over D on the aggregated volume S,
- uniqueness: pixel invalidated when some non-neighbor candidate d
  (|d - d0| > 1) has S[d]*(100 - uniquenessRatio) < minS*100,
- quadratic sub-pixel interpolation with OpenCV's integer rounding on the
  1/16 fixed-point grid (the reference's /16 decode contract,
  stereo_core.py:232),
- left-right consistency exactly as OpenCV computes it: the right-view
  disparity map is a scatter-min of the chosen (minS, d0) pairs onto
  right pixels xr = x - d0 (uniqueness survivors only), then pixels with
  |d_R(x - d0) - d0| > disp12_max_diff are invalidated (disp12MaxDiff
  semantics of stereo_core.py:69; negative disables),
- invalid marker = min_disp - 1, so downstream 'valid = disp > 0' masks
  behave as in the reference (postprocess.py:55).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["wta_disparity", "lr_invalidate"]

_BIG = jnp.int32(2**20)


def lr_invalidate(d0, min_s, valid, disp12_max_diff, min_disp):
    """OpenCV-style LR consistency on (H, W) maps.

    disp2[xr] = d0 of the minimum-cost claimant x with x - d0(x) = xr
    (scatter-min over uniqueness survivors); a pixel fails when
    |disp2[x - d0] - d0| > disp12_max_diff, including when its right pixel
    has no claimant or falls outside the image.
    """
    h, w = d0.shape
    x_idx = jnp.broadcast_to(jnp.arange(w)[None, :], (h, w))
    xr = x_idx - d0 - min_disp
    inb = (xr >= 0) & valid
    xr_c = jnp.clip(xr, 0, w - 1)

    rows = jnp.broadcast_to(jnp.arange(h)[:, None], (h, w))
    # Scatter-min of cost; then a second scatter recovers the argmin's d0.
    cost2 = jnp.full((h, w), _BIG).at[rows, xr_c].min(
        jnp.where(inb, min_s, _BIG)
    )
    claimed = cost2[rows, xr_c]
    # d0 of the winning claimant (min d0 among cost ties, deterministic).
    disp2 = jnp.full((h, w), _BIG).at[rows, xr_c].min(
        jnp.where(inb & (min_s == claimed), d0, _BIG)
    )
    d_r_at = disp2[rows, xr_c]
    lr_bad = jnp.abs(d_r_at - d0) > disp12_max_diff
    oob = xr < 0
    return lr_bad | oob


def wta_disparity(
    s: jax.Array,
    min_disp: int = 0,
    uniqueness_ratio: int = 10,
    disp12_max_diff: int = 1,
) -> jax.Array:
    """Select disparity from aggregated volume S (H, W, D).

    Returns float32 (H, W) disparity in pixels (including min_disp and the
    /16 sub-pixel quantization); invalid pixels = min_disp - 1.
    """
    s = jnp.round(s).astype(jnp.int32)
    num_d = s.shape[-1]

    min_s = jnp.min(s, axis=-1)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    is_min = s == min_s[..., None]
    d0 = jnp.min(jnp.where(is_min, d_idx, num_d), axis=-1)

    cm = jnp.min(jnp.where(d_idx == d0[..., None] - 1, s, _BIG), axis=-1)
    cp = jnp.min(jnp.where(d_idx == d0[..., None] + 1, s, _BIG), axis=-1)

    invalid = jnp.zeros(d0.shape, dtype=bool)
    if uniqueness_ratio > 0:
        near = jnp.abs(d_idx - d0[..., None]) <= 1
        competitor = jnp.min(jnp.where(near, _BIG, s), axis=-1)
        invalid = competitor * (100 - uniqueness_ratio) < min_s * 100

    if disp12_max_diff >= 0:
        invalid = invalid | lr_invalidate(
            d0, min_s, ~invalid, disp12_max_diff, min_disp
        )

    # OpenCV integer subpixel: d*16 + ((cm - cp)*16 + denom) / (2*denom)
    # with C truncating division.
    denom = jnp.maximum(cm + cp - 2 * min_s, 1)
    delta16 = jax.lax.div((cm - cp) * 16 + denom, 2 * denom)
    interior = (d0 > 0) & (d0 < num_d - 1)
    delta16 = jnp.where(interior, delta16, 0)
    disp = ((min_disp + d0) * 16 + delta16).astype(jnp.float32) / 16.0
    return jnp.where(invalid, jnp.float32(min_disp - 1), disp)
