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

_BIG = 2**20  # plain int: jnp constants at import would init the backend


def lr_invalidate(d0, min_s, valid, disp12_max_diff, min_disp, num_disp=None):
    """OpenCV-style LR consistency on (H, W) maps.

    disp2[xr] = d0 of the minimum-cost claimant x with x - d0(x) = xr; a
    pixel fails when |disp2[x - d0] - d0| > disp12_max_diff, including when
    its right pixel has no claimant or falls outside the image.

    TPU-native formulation: the claimants of right pixel xr are exactly
    x = xr + d + min_disp for d in [0, D), so the scatter-min over left
    pixels becomes a static shift loop over d — each iteration reads the
    (min_s, d0) maps at a *static* lane offset (pure vector slices, no
    scatter/gather; XLA fuses the unrolled loop into one pass). Iterating
    d ascending with a strict '<' update reproduces the deterministic
    min-d0 tie-break among equal-cost claimants.
    """
    h, w = d0.shape
    if num_disp is None:
        raise ValueError("num_disp is required")

    big = _BIG
    pad_r = num_disp + min_disp
    # Left pixels x >= w do not exist; pad claims with BIG (no claimant).
    ms_pad = jnp.pad(jnp.where(valid, min_s, big), ((0, 0), (0, pad_r)),
                     constant_values=big)

    cost2 = jnp.full((h, w), big)
    disp2 = jnp.full((h, w), big)
    for d in range(num_disp):
        off = d + min_disp
        cand = jnp.where(d0[:, off:] == d, ms_pad[:, off : off + w - off],
                         big)
        cand = jnp.pad(cand, ((0, 0), (0, off)), constant_values=big)
        take = cand < cost2
        cost2 = jnp.where(take, cand, cost2)
        disp2 = jnp.where(take, d, disp2)

    # Check phase: pixel x with index d reads disp2[x - d - min_disp];
    # again a static shift per d (pad left = out-of-bounds -> bad).
    d2_pad = jnp.pad(disp2, ((0, 0), (pad_r, 0)), constant_values=-big)
    bad = jnp.zeros((h, w), dtype=bool)
    for d in range(num_disp):
        off = d + min_disp
        dr_at = d2_pad[:, pad_r - off : pad_r - off + w]
        bad = bad | ((d0 == d) & (jnp.abs(dr_at - d) > disp12_max_diff))
    return bad


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
    if not jnp.issubdtype(s.dtype, jnp.integer):
        s = jnp.round(s)
    s = s.astype(jnp.int32)
    num_d = s.shape[-1]

    # min + argmin in one fused variadic reduce; argmin's first-index
    # tie-break IS OpenCV's smallest-d rule.
    min_s = jnp.min(s, axis=-1)
    d0 = jnp.argmin(s, axis=-1).astype(jnp.int32)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)

    cm = jnp.min(jnp.where(d_idx == d0[..., None] - 1, s, _BIG), axis=-1)
    cp = jnp.min(jnp.where(d_idx == d0[..., None] + 1, s, _BIG), axis=-1)

    invalid = jnp.zeros(d0.shape, dtype=bool)
    if uniqueness_ratio > 0:
        near = jnp.abs(d_idx - d0[..., None]) <= 1
        competitor = jnp.min(jnp.where(near, _BIG, s), axis=-1)
        invalid = competitor * (100 - uniqueness_ratio) < min_s * 100

    if disp12_max_diff >= 0:
        invalid = invalid | lr_invalidate(
            d0, min_s, ~invalid, disp12_max_diff, min_disp, num_disp=num_d
        )

    # OpenCV integer subpixel: d*16 + ((cm - cp)*16 + denom) / (2*denom)
    # with C truncating division.
    denom = jnp.maximum(cm + cp - 2 * min_s, 1)
    delta16 = jax.lax.div((cm - cp) * 16 + denom, 2 * denom)
    interior = (d0 > 0) & (d0 < num_d - 1)
    delta16 = jnp.where(interior, delta16, 0)
    disp = ((min_disp + d0) * 16 + delta16).astype(jnp.float32) / 16.0
    return jnp.where(invalid, jnp.float32(min_disp - 1), disp)
