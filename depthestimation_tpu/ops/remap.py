"""Bilinear remap — cv2.remap equivalent, TPU-first.

Reference usage: rectification warps images through precomputed float32
sampling maps (rectify.py:185-186,234-235). Out-of-image samples return 0
like cv2's default BORDER_CONSTANT.

Two implementations:

- remap_banded: rectification maps displace pixels by BOUNDED amounts
  (near-identity: same-K cameras, small rotations, mild distortion), so
  the exact bilinear resample is a sum over statically shifted planes,
  one per (dy, dx) in the displacement band, each weighted by the
  per-pixel bilinear mask. Pure shifted-plane arithmetic — zero gathers
  (XLA lowers 2M-element gathers catastrophically on TPU). Exact: every
  output pixel has exactly its 4 cv2 taps non-zero in the band sum.
- _remap_gather: the classic 4-tap advanced-indexing gather, used as the
  fallback when the displacement band is too wide for the banded sum
  (wild warps, not rectification) and on CPU where gathers are cheap.

remap_bilinear picks automatically when given host (numpy) maps — the
displacement band is a static property of the calibration, computed once
per map set and cached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["remap_bilinear", "remap_banded"]

# Widest displacement band the shifted-plane sum may use: beyond
# ~(33 x 33) taps the arithmetic beats the gather no longer.
_MAX_BANDED_TERMS = 1200

LANE = 128
_ROWS = 16  # output rows per banded-remap kernel grid step
INTERPRET = False  # interpreter mode for CPU tests of the Pallas kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _remap_band_kernel(img_hbm, mx_ref, my_ref, out_ref, win, sem, *,
                       rows, rows_ext, pad_t, w_real, wp,
                       dy_lo, dy_hi, dx_lo, dx_hi):
    """One row band of the banded bilinear remap.

    The input window (all source rows any output row of the band can
    touch) is DMA'd once; each x-offset in the band is ONE lane roll of
    the window, each y-offset a static sublane slice — per (dy, dx) term
    the update is two multiplies and an add. No gathers anywhere."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * rows, rows_ext), :], win, sem
    )
    cp.start()
    cp.wait()

    mx = mx_ref[...]
    my = my_ref[...]
    # Mosaic iota must be integer-typed; cast to f32 afterwards.
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0).astype(
        jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1).astype(
        jnp.float32)
    x0f = jnp.floor(mx)
    y0f = jnp.floor(my)
    fx = mx - x0f
    fy = my - y0f
    dx0 = x0f - lane
    dy0 = y0f - (jnp.float32(i * rows) + sub)

    # Horizontal weights per x-offset (shared across all y-offsets),
    # masked where the tap leaves the real image (cv2 border constant 0).
    wx = []
    for bx in range(dx_lo, dx_hi + 2):
        wgt = (jnp.where(dx0 == bx, 1.0 - fx, 0.0)
               + jnp.where(dx0 == bx - 1, fx, 0.0))
        inb = (lane + bx >= 0) & (lane + bx < w_real)
        wx.append(jnp.where(inb, wgt, 0.0))

    wy = [
        (jnp.where(dy0 == by, 1.0 - fy, 0.0)
         + jnp.where(dy0 == by - 1, fy, 0.0))
        for by in range(dy_lo, dy_hi + 2)
    ]

    out = jnp.zeros((rows, wp), jnp.float32)
    for k, bx in enumerate(range(dx_lo, dx_hi + 2)):
        rolled = pltpu.roll(win[...], (-bx) % wp, 1)
        for j, by in enumerate(range(dy_lo, dy_hi + 2)):
            plane = rolled[pad_t + by: pad_t + by + rows, :]
            out = out + (wy[j] * wx[k]) * plane
    out_ref[...] = out


def _band(map_c: np.ndarray, idx_axis: int, size: int):
    """Inclusive (lo, hi) range of floor(map) - index over the image,
    clipped to just-outside-the-image so far-out samples (which cv2 zeros
    anyway) don't widen the band."""
    x0 = np.floor(map_c)
    n = map_c.shape[idx_axis]
    shape = (-1, 1) if idx_axis == 0 else (1, -1)
    idx = np.arange(n, dtype=map_c.dtype).reshape(shape)
    d = np.clip(x0, -1.0, float(size)) - idx
    return int(d.min()), int(d.max())


@functools.lru_cache(maxsize=16)
def _banded_fn(h, w, dy_lo, dy_hi, dx_lo, dx_hi):
    pad_t, pad_b = max(0, -dy_lo), max(0, dy_hi + 1)
    pad_l, pad_r = max(0, -dx_lo), max(0, dx_hi + 1)

    @jax.jit
    def run(img, map_x, map_y):
        img = img.astype(jnp.float32)
        x0f = jnp.floor(map_x)
        y0f = jnp.floor(map_y)
        fx = map_x - x0f
        fy = map_y - y0f
        xi = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        yi = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        dx0 = x0f - xi
        dy0 = y0f - yi
        p = jnp.pad(img, ((pad_t, pad_b), (pad_l, pad_r)))
        # Per-offset weights: offset b carries (1-f) as the floor tap and
        # f as the floor+1 tap of the neighboring output coordinate.
        wx = [
            jnp.where(dx0 == bx, 1.0 - fx, 0.0) + jnp.where(dx0 == bx - 1, fx, 0.0)
            for bx in range(dx_lo, dx_hi + 2)
        ]
        out = jnp.zeros((h, w), jnp.float32)
        for by in range(dy_lo, dy_hi + 2):
            wy = (jnp.where(dy0 == by, 1.0 - fy, 0.0)
                  + jnp.where(dy0 == by - 1, fy, 0.0))
            for i, bx in enumerate(range(dx_lo, dx_hi + 2)):
                plane = jax.lax.dynamic_slice(
                    p, (pad_t + by, pad_l + bx), (h, w))
                out = out + (wy * wx[i]) * plane
        return out

    return run


@functools.lru_cache(maxsize=16)
def _banded_pallas_fn(h, w, dy_lo, dy_hi, dx_lo, dx_hi):
    rows = _ROWS
    hp = _round_up(h, rows)
    wp = _round_up(w, LANE)
    pad_t = max(0, -dy_lo)
    rows_ext = _round_up(pad_t + rows + max(dy_hi, 0) + 2, 8)
    nbands = hp // rows
    img_rows = (nbands - 1) * rows + rows_ext

    @jax.jit
    def run(img, map_x, map_y):
        imgp = jnp.zeros((img_rows, wp), jnp.float32)
        imgp = imgp.at[pad_t: pad_t + h, :w].set(img.astype(jnp.float32))
        # Pad rows/cols of the maps point far outside -> zero weights.
        mxp = jnp.full((hp, wp), -1e9, jnp.float32).at[:h, :w].set(map_x)
        myp = jnp.full((hp, wp), -1e9, jnp.float32).at[:h, :w].set(map_y)
        map_spec = pl.BlockSpec((rows, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(
                _remap_band_kernel, rows=rows, rows_ext=rows_ext,
                pad_t=pad_t, w_real=w, wp=wp,
                dy_lo=dy_lo, dy_hi=dy_hi, dx_lo=dx_lo, dx_hi=dx_hi,
            ),
            grid=(nbands,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      map_spec, map_spec],
            out_specs=map_spec,
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((rows_ext, wp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=INTERPRET,
        )(imgp, mxp, myp)
        return out[:h, :w]

    return run


def remap_banded(img, map_x: np.ndarray, map_y: np.ndarray):
    """Exact banded remap; maps must be host numpy arrays (static — they
    come from the calibration cache). Returns None when the displacement
    band is too wide to be profitable.

    On TPU the shifted-plane sum runs as a Pallas kernel (window DMA +
    lane rolls, everything in VMEM); elsewhere as plain XLA ops."""
    h, w = map_x.shape
    if tuple(img.shape) != (h, w):
        return None  # banded shifts assume img and map grids coincide
    dy_lo, dy_hi = _band(map_y, 0, img.shape[0])
    dx_lo, dx_hi = _band(map_x, 1, img.shape[1])
    terms = (dy_hi - dy_lo + 2) * (dx_hi - dx_lo + 2)
    if terms > _MAX_BANDED_TERMS:
        return None
    if jax.default_backend() == "tpu" or INTERPRET:
        fn = _banded_pallas_fn(h, w, dy_lo, dy_hi, dx_lo, dx_hi)
    else:
        fn = _banded_fn(h, w, dy_lo, dy_hi, dx_lo, dx_hi)
    return fn(img, jnp.asarray(map_x), jnp.asarray(map_y))


def _remap_gather(img, map_x, map_y):
    """4-tap gather fallback (fine on CPU; slow at TPU scale)."""
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


def remap_bilinear(img, map_x, map_y):
    """Sample img (H, W) at (map_x, map_y) float32 coordinates with
    bilinear interpolation; coordinates outside the image give 0.

    With host (numpy) maps — the rectification-cache case — the banded
    shifted-plane path is used when the displacement band is narrow
    (always true for real rectification maps); otherwise, or with traced
    maps, the gather fallback runs."""
    if isinstance(map_x, np.ndarray) and isinstance(map_y, np.ndarray):
        out = remap_banded(img, map_x, map_y)
        if out is not None:
            return out
    return _remap_gather(img, jnp.asarray(map_x), jnp.asarray(map_y))
