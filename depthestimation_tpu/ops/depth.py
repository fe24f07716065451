"""Disparity -> depth conversion (pure JAX).

Reference semantics: stereo_core.py:234-272 — Z = f*B/(d + doffs), invalid
(adjusted disparity <= eps) mapped to +inf, optional max_depth clamp. The
reference quirk of passing eps = min_disp (stereo_core.py:189,194-195) is
preserved by the pipeline caller.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["disparity_to_depth"]


def disparity_to_depth(disp, f_pixels, baseline_m, doffs=0.0, eps=1e-6, max_depth=None):
    """Convert disparity (pixels) to depth (meters).

    Invalid regions (adjusted disparity <= eps) become +inf, matching
    stereo_core.py:260-266; depths above max_depth are clamped to max_depth
    (stereo_core.py:269-270).
    """
    disp = disp.astype(jnp.float32)
    adjusted = disp + doffs
    valid = adjusted > eps
    z = jnp.where(valid, (f_pixels * baseline_m) / jnp.where(valid, adjusted, 1.0), jnp.inf)
    if max_depth is not None:
        z = jnp.minimum(z, max_depth)
    return z.astype(jnp.float32)
