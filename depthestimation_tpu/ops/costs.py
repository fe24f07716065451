"""Matching-cost volume construction (pure JAX / XLA).

TPU-native replacement for the cost half of cv2.StereoSGBM (reference
stereo_core.py:63-75,231 — OpenCV's calcPixelCostBT + SAD window):

- x-Sobel prefilter clipped to +-prefilter_cap (OpenCV's `tab` lookup on the
  x-derivative; preFilterCap semantics of stereo_core.py:70).
- Birchfield-Tomasi sampling-insensitive per-pixel matching cost with
  half-pixel min/max envelopes on BOTH images.
- block_size x block_size SAD window aggregation with edge-replicated
  borders (blockSize semantics of stereo_core.py:67).

A census-transform + Hamming-distance cost is provided as an alternative
(config.cost='census') — more robust to radiometric differences and cheaper
on TPU (bitwise ops on the VPU).

Layout: the cost volume is (H, W, D) with D innermost (lane dimension on
TPU; D is a multiple of 16 by config, and typically of 128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["xsobel_prefilter", "bt_cost_volume", "census_cost_volume", "cost_volume"]


def xsobel_prefilter(img: jax.Array, cap: int) -> jax.Array:
    """Clipped horizontal Sobel derivative, mapped to [0, 2*cap].

    OpenCV SGBM prefilters with value = clip(sobel_x, -cap, cap) + cap
    before the BT cost; `cap` is prefilter_cap (stereo_core.py:70).
    """
    img = img.astype(jnp.float32)
    p = jnp.pad(img, 1, mode="edge")
    # Sobel-x: [[-1,0,1],[-2,0,2],[-1,0,1]] correlation.
    dx = (
        (p[:-2, 2:] - p[:-2, :-2])
        + 2.0 * (p[1:-1, 2:] - p[1:-1, :-2])
        + (p[2:, 2:] - p[2:, :-2])
    )
    return jnp.clip(dx, -cap, cap) + cap


def _half_sample_envelope(img: jax.Array):
    """Per-pixel min/max over {v, (v+v_left)/2, (v+v_right)/2} (BT).

    Half samples use integer truncation like OpenCV's (a+b)/2 on
    non-negative prefiltered values, keeping costs on an integer grid."""
    left = jnp.pad(img, ((0, 0), (1, 0)), mode="edge")[:, :-1]
    right = jnp.pad(img, ((0, 0), (0, 1)), mode="edge")[:, 1:]
    hl = jnp.floor(0.5 * (img + left))
    hr = jnp.floor(0.5 * (img + right))
    vmin = jnp.minimum(img, jnp.minimum(hl, hr))
    vmax = jnp.maximum(img, jnp.maximum(hl, hr))
    return vmin, vmax


def _shift_right_stack(arr: jax.Array, min_disp: int, num_disp: int) -> jax.Array:
    """Gather arr[h, x - (min_disp + d)] for d in [0, num_disp).

    Out-of-image indices are clamped to column 0 (edge replication), the
    same border convention OpenCV uses for the invalid left band (which the
    pipeline later crops, stereo_core.py:168). Returns (H, W, D).
    """
    w = arr.shape[1]
    x = jnp.arange(w)[:, None]
    d = jnp.arange(num_disp)[None, :] + min_disp
    idx = jnp.clip(x - d, 0, w - 1)  # (W, D)
    return arr[:, idx]


def _block_sum(vol: jax.Array, block_size: int) -> jax.Array:
    """SAD window: box-sum each (H, W) slice of (H, W, D) over a
    block_size^2 window with edge-replicated padding (OpenCV clamps window
    taps at the border)."""
    if block_size <= 1:
        return vol
    r = block_size // 2
    padded = jnp.pad(vol, ((r, r), (r, r), (0, 0)), mode="edge")
    out = jax.lax.reduce_window(
        padded,
        jnp.array(0, vol.dtype),
        jax.lax.add,
        window_dimensions=(block_size, block_size, 1),
        window_strides=(1, 1, 1),
        padding="VALID",
    )
    return out


def bt_cost_volume(
    left: jax.Array,
    right: jax.Array,
    num_disp: int,
    min_disp: int = 0,
    block_size: int = 5,
    prefilter_cap: int = 31,
) -> jax.Array:
    """Birchfield-Tomasi cost volume on Sobel-prefiltered images.

    Returns (H, W, D) float32; C[h, x, d] is the block-aggregated matching
    cost between left pixel x and right pixel x - (min_disp + d).
    """
    pl_ = xsobel_prefilter(left, prefilter_cap)
    pr = xsobel_prefilter(right, prefilter_cap)

    umin, umax = _half_sample_envelope(pl_)
    vmin, vmax = _half_sample_envelope(pr)

    v = _shift_right_stack(pr, min_disp, num_disp)
    v0 = _shift_right_stack(vmin, min_disp, num_disp)
    v1 = _shift_right_stack(vmax, min_disp, num_disp)

    u = pl_[:, :, None]
    u0 = umin[:, :, None]
    u1 = umax[:, :, None]

    c0 = jnp.maximum(jnp.maximum(u - v1, v0 - u), 0.0)
    c1 = jnp.maximum(jnp.maximum(v - u1, u0 - v), 0.0)
    pixel_cost = jnp.minimum(c0, c1)

    return _block_sum(pixel_cost, block_size)


def _census_transform(img: jax.Array, radius: int = 2) -> jax.Array:
    """Census transform over a (2r+1)^2 window, packed into int32 bits
    (r=2 -> 24 comparison bits, center excluded)."""
    p = jnp.pad(img, radius, mode="edge")
    h, w = img.shape
    bits = jnp.zeros((h, w), dtype=jnp.int32)
    bit = 0
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            neighbor = p[radius + dy : radius + dy + h, radius + dx : radius + dx + w]
            bits = bits | (jnp.where(neighbor < img, 1, 0) << bit)
            bit += 1
    return bits


def _popcount32(x: jax.Array) -> jax.Array:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def census_cost_volume(
    left: jax.Array,
    right: jax.Array,
    num_disp: int,
    min_disp: int = 0,
    block_size: int = 1,
    radius: int = 2,
) -> jax.Array:
    """Census + Hamming-distance cost volume (H, W, D) float32."""
    cl = _census_transform(left.astype(jnp.float32), radius)
    cr = _census_transform(right.astype(jnp.float32), radius)
    cr_shift = _shift_right_stack(cr, min_disp, num_disp)
    ham = _popcount32(cl[:, :, None] ^ cr_shift).astype(jnp.float32)
    return _block_sum(ham, block_size)


def cost_volume(left, right, cfg) -> jax.Array:
    """Dispatch on cfg.cost ('bt' | 'census')."""
    if cfg.cost == "census":
        return census_cost_volume(
            left, right, cfg.num_disp, cfg.min_disp, block_size=1
        )
    return bt_cost_volume(
        left,
        right,
        cfg.num_disp,
        cfg.min_disp,
        block_size=cfg.block_size,
        prefilter_cap=cfg.prefilter_cap,
    )
