"""Bilinear remap (gather + interpolate) — cv2.remap equivalent.

Reference usage: rectification warps images through precomputed float32
sampling maps (rectify.py:185-186,234-235). On TPU this is a 4-tap gather
with bilinear weights; out-of-image samples return 0 like cv2's default
BORDER_CONSTANT.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["remap_bilinear"]


def remap_bilinear(img, map_x, map_y):
    """Sample img (H, W) at (map_x, map_y) float32 coordinates with
    bilinear interpolation; coordinates outside the image give 0."""
    img = img.astype(jnp.float32)
    h, w = img.shape

    x0f = jnp.floor(map_x)
    y0f = jnp.floor(map_y)
    fx = map_x - x0f
    fy = map_y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb, v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy
