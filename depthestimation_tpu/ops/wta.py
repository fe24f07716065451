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

    # Claim phase as a single-carry packed min: key = cost*256 + d0 orders
    # lexicographically by (cost, d) — exactly OpenCV's ascending-d
    # strict-'<' tie-break (cost*256+da < cost'*256+db whenever cost<cost'
    # or cost==cost' and da<db; d0 < 256 always, and the largest real cost
    # ~153k packs into int32 with room). Invalid pixels and the x >= w pad
    # claim with the NOCLAIM sentinel, which the post-loop filter maps to
    # the no-claimant marker. One carried (H, W) int32 map and ~4 ops per
    # unrolled step keep this in a handful of fused XLA kernels (the
    # round-4 version carried cost2+disp2 through 128 where-pairs and
    # measured 5.2 ms / 19 s compile at 1080p/128d).
    noclaim = 1 << 29
    key = jnp.where(valid, min_s * 256 + d0, noclaim).astype(jnp.int32)
    key_pad = jnp.pad(key, ((0, 0), (0, pad_r)), constant_values=noclaim)
    packed2 = jnp.full((h, w), 1 << 30, jnp.int32)
    for d in range(num_disp):
        off = d + min_disp
        cand = key_pad[:, off : off + w]
        cand = jnp.where((cand & 255) == d, cand, 1 << 30)
        packed2 = jnp.minimum(packed2, cand)
    disp2 = jnp.where(packed2 >= noclaim, big, packed2 & 255)

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
    num_disp: int | None = None,
    crop: tuple | None = None,
) -> jax.Array:
    """Select disparity from aggregated volume S (H, W, D).

    Returns float32 (H, W) disparity in pixels (including min_disp and the
    /16 sub-pixel quantization); invalid pixels = min_disp - 1.

    num_disp: number of REAL disparity lanes (default: all of D). Pallas
    pad lanes beyond it are excluded from every reduction by a fused iota
    mask instead of a minor-dim slice — slicing the padded volume would
    materialize a half-GB copy at 1080p (measured 1.7 ms on v5e).
    crop: (h, w) of the real image region. The tail then runs on the
    PADDED maps — every op is per-row/per-pixel except the LR claim,
    where pad columns (zero-cost rows/cols look like valid d0=0 pixels)
    are masked out of the claimant set — and only the final small
    disparity map is sliced.
    """
    if not jnp.issubdtype(s.dtype, jnp.integer):
        s = jnp.round(s).astype(jnp.int32)
    lanes = s.shape[-1]
    num_d = lanes if num_disp is None else num_disp
    d_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    # Volume reductions stay in S's storage dtype (int16 for most configs:
    # a half-GB volume at 1080p); the old int32 upcast materialized a 1 GB
    # copy and every reduce paid double HBM traffic. The pad/mask sentinel
    # must outrank every real cost: int16 configs bound real costs to
    # <= 32600 (pallas_sgm._acc_dtype), so int16 max works.
    sent = jnp.asarray(
        jnp.iinfo(s.dtype).max if s.dtype == jnp.int16 else _BIG, s.dtype
    )
    if num_d < lanes:
        # Pad lanes can undercut the *competitor* reductions even though
        # they never win the argmin; mask them from every reduce.
        s = jnp.where(d_idx < num_d, s, sent)

    # min + argmin in ONE packed-key pass: key = cost << shift | d orders
    # lexicographically by (cost, d), so the min's tie-break among equal
    # costs is smallest d — exactly argmin's first-index / OpenCV's rule.
    # The int16 -> int32 widening happens elementwise inside the reduce
    # fusion; no widened volume is ever materialized.
    shift = max(8, (lanes - 1).bit_length())
    pmin = jnp.min(s.astype(jnp.int32) * (1 << shift) + d_idx, axis=-1)
    min_s = pmin >> shift
    d0 = pmin & ((1 << shift) - 1)

    cm = jnp.min(
        jnp.where(d_idx == d0[..., None] - 1, s, sent), axis=-1
    ).astype(jnp.int32)
    cp = jnp.min(
        jnp.where(d_idx == d0[..., None] + 1, s, sent), axis=-1
    ).astype(jnp.int32)

    invalid = jnp.zeros(d0.shape, dtype=bool)
    if uniqueness_ratio > 0:
        near = jnp.abs(d_idx - d0[..., None]) <= 1
        competitor = jnp.min(jnp.where(near, sent, s), axis=-1).astype(
            jnp.int32
        )
        invalid = competitor * (100 - uniqueness_ratio) < min_s * 100

    if disp12_max_diff >= 0:
        claim_ok = ~invalid
        if crop is not None and crop[1] < d0.shape[1]:
            # Zero-cost pad columns look like valid (d0=0, cost 0) pixels;
            # keep them out of the LR claimant set (the reference's maps
            # simply end at w).
            col = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
            claim_ok = claim_ok & (col < crop[1])
        invalid = invalid | lr_invalidate(
            d0, min_s, claim_ok, disp12_max_diff, min_disp, num_disp=num_d
        )

    # OpenCV integer subpixel: d*16 + ((cm - cp)*16 + denom) / (2*denom)
    # with C truncating division.
    denom = jnp.maximum(cm + cp - 2 * min_s, 1)
    delta16 = jax.lax.div((cm - cp) * 16 + denom, 2 * denom)
    interior = (d0 > 0) & (d0 < num_d - 1)
    delta16 = jnp.where(interior, delta16, 0)
    disp = ((min_disp + d0) * 16 + delta16).astype(jnp.float32) / 16.0
    disp = jnp.where(invalid, jnp.float32(min_disp - 1), disp)
    if crop is not None:
        disp = disp[: crop[0], : crop[1]]
    return disp
