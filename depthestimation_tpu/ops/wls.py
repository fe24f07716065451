"""Edge-preserving (WLS-style) disparity refinement + temporal smoothing.

Named in the build's north star (BASELINE.json: "left-right consistency +
WLS-style post-filtering"; config #3 "temporal post-filtering"). The
reference itself has no analogue — OpenCV users typically bolt on
cv2.ximgproc.DisparityWLSFilter; this module provides the TPU-native
equivalent:

- wls_refine: a confidence-weighted guided filter on the disparity map,
  guided by the left image. The guided filter is the O(1)-per-pixel
  closed-form approximation of the weighted-least-squares smoothing the
  WLS disparity filter performs (He et al.; all ops are box means, which
  XLA fuses into a handful of passes — no iteration, no gathers).
  Invalid pixels get zero confidence, so holes are filled from their
  edge-consistent neighborhood as a side effect.
- temporal_smooth: per-pixel exponential smoothing with change rejection
  for the streaming path (flow-free: static-ish scenes benefit, fast
  motion falls back to the fresh frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .filters import box_mean

__all__ = ["wls_refine", "temporal_smooth"]


def wls_refine(
    disparity: jax.Array,
    guide: jax.Array,
    radius: int = 8,
    eps: float = 100.0,
    invalid_below: float = 0.0,
) -> jax.Array:
    """Confidence-weighted guided filter of `disparity` steered by `guide`
    (the rectified left image). Pixels with disparity <= invalid_below get
    zero weight and are re-estimated from their neighborhood.

    q = mean(a) * I + mean(b), a = cov_w(I, p) / (var(I) + eps),
    with all p-statistics confidence-weighted.
    """
    p = disparity.astype(jnp.float32)
    i = guide.astype(jnp.float32)
    k = 2 * radius + 1
    w = (p > invalid_below).astype(jnp.float32)

    mean_i = box_mean(i, k)
    corr_ii = box_mean(i * i, k)
    var_i = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)

    wsum = jnp.maximum(box_mean(w, k), 1e-4)
    mean_p = box_mean(w * p, k) / wsum
    mean_ip = box_mean(w * i * p, k) / wsum
    mean_i_w = box_mean(w * i, k) / wsum
    cov_ip = mean_ip - mean_i_w * mean_p

    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i_w

    return box_mean(a, k) * i + box_mean(b, k)


def temporal_smooth(
    disp_new: jax.Array,
    disp_prev: jax.Array | None,
    alpha: float = 0.4,
    max_change: float = 4.0,
    invalid_below: float = 0.0,
) -> jax.Array:
    """Exponential temporal smoothing for streaming disparity.

    out = alpha * new + (1 - alpha) * prev where both frames are valid and
    the change is below max_change (otherwise trust the new frame — scene
    motion), matching the flow-free temporal post-filter of BASELINE
    config #3. Pass disp_prev=None on the first frame.
    """
    new = disp_new.astype(jnp.float32)
    if disp_prev is None:
        return new
    prev = disp_prev.astype(jnp.float32)
    ok = (new > invalid_below) & (prev > invalid_below) & (
        jnp.abs(new - prev) <= max_change
    )
    return jnp.where(ok, alpha * new + (1.0 - alpha) * prev, new)
