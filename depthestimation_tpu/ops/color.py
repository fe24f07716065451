"""Color conversion and resize ops (pure JAX, replaces cv2.cvtColor/resize).

Reference analogues: cv2.cvtColor BT.601 grayscale (rectify.py:108-119,
stereo_core.py:155-160, input.py:35-36) and cv2.resize INTER_AREA downscale
(input.py:39-43) / INTER_LINEAR (rectify.py:105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["to_grayscale", "resize_area", "resize_bilinear", "downscale"]

# ITU-R BT.601 luma weights, RGB order (cv2 uses the same weights; its
# BGR2GRAY just reverses the coefficient order). Kept as a host tuple:
# a module-level jnp.array would initialize the XLA backend at import,
# breaking jax.distributed.initialize() for multi-host users.
_BT601 = (0.299, 0.587, 0.114)


def to_grayscale(img: jax.Array) -> jax.Array:
    """Convert (H, W, 3) RGB (or pass through (H, W)) to float32 grayscale.

    Matches cv2.cvtColor(RGB2GRAY) BT.601 semantics (rectify.py:116-118).
    uint8 input stays on the 0..255 scale (rounded like cv2).
    """
    if img.ndim == 2:
        return img
    if img.ndim == 3 and img.shape[2] == 1:
        return img[:, :, 0]
    if img.ndim == 3 and img.shape[2] == 3:
        gray = jnp.einsum(
            "hwc,c->hw", img.astype(jnp.float32),
            jnp.asarray(_BT601, dtype=jnp.float32),
        )
        if jnp.issubdtype(img.dtype, jnp.integer):
            gray = jnp.round(gray)
        return gray.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.integer) else gray
    raise ValueError("Unsupported image format for grayscale conversion")


def resize_area(img: jax.Array, out_hw: tuple) -> jax.Array:
    """Area-average resize for downscaling (cv2.INTER_AREA semantics).

    jax.image 'linear' with antialiasing is the standard JAX equivalent of
    area downsampling; for integer decimation factors it reduces to exact
    box averaging.
    """
    out_shape = (out_hw[0], out_hw[1]) + img.shape[2:]
    orig_dtype = img.dtype
    out = jax.image.resize(
        img.astype(jnp.float32), out_shape, method="linear", antialias=True
    )
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(orig_dtype)
    return out


def resize_bilinear(img: jax.Array, out_hw: tuple) -> jax.Array:
    """Bilinear resize (cv2.INTER_LINEAR analogue, rectify.py:105)."""
    out_shape = (out_hw[0], out_hw[1]) + img.shape[2:]
    orig_dtype = img.dtype
    out = jax.image.resize(
        img.astype(jnp.float32), out_shape, method="linear", antialias=False
    )
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(orig_dtype)
    return out


def downscale(img: jax.Array, factor: float) -> jax.Array:
    """Downscale by a factor in (0, 1], mirroring input.py:39-43 size math
    (int truncation of w*f, h*f)."""
    if factor == 1.0:
        return img
    h, w = img.shape[:2]
    return resize_area(img, (int(h * factor), int(w * factor)))
