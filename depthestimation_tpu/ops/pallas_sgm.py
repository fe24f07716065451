"""Pallas TPU kernels for the SGM matcher hot path.

Replaces the XLA reference implementations in ops/costs.py, ops/sgm.py and
ops/wta.py on TPU (reference semantics: cv2.StereoSGBM internals,
stereo_core.py:63-75,231). The design goal is minimum HBM traffic: every
volume is int16, every kernel fuses as many scan directions as its data
order allows, and the WTA reduction is folded into the last sweep so the
final aggregated volume is never written to memory.

Kernel pipeline (volumes are (Hp, Wp, Dp) with D on lanes; Hp/Wp/Dp are the
image/disparity sizes padded to band/lane multiples — padding is *exact*,
see `Padding` below):

  K1 cost      grid (row-bands, d-chunks). BT pixel cost on prefiltered
               images + fused block_size^2 SAD box-sum, computed full-width
               per disparity with rolling right-image buffers, accumulated
               in a (ROWS, 128, Wp) VMEM staging buffer and transposed
               in-VMEM to the (rows, W, D) sweep layout on write. int16 out.
  K2 hscan     grid (row-bands, x-chunks). Horizontal L->R scan; the
               R->L scan runs with reversed x-chunk index maps and fuses
               the accumulate (S_we = L_lr + L_rl). Blocks are staged
               int16->int32 in VMEM scratch (dynamic sublane slices are
               only legal on 32-bit tiles).
  K3 rowsweep  grid (row-bands). Full-width row-sequential scan computing
               any set of downward (or upward, via reversed index maps)
               directions in one pass: vertical and both diagonals differ
               only by a per-row sublane shift of the carry. Fuses the
               accumulate; optionally fuses K4.
  K4 WTA       argmin + OpenCV uniqueness + integer subpixel on the 1/16
               grid, fused into the last rowsweep so the final S volume
               never exists in HBM. The OpenCV scatter-min LR check runs
               outside on the (H, W) maps (ops/wta.lr_invalidate).

Mode composition (path sets from ops/sgm._PATHS; modes stereo_core.py:55-61):
  sgbm_3way: K1 -> K2(fwd) -> K2(bwd+acc) -> K3([N], WTA)
  hh4:       K1 -> K2 -> K2 -> K3([N]) -> K3([S], WTA)
  sgbm:      K1 -> K2 -> K2 -> K3([N, NW, NE], WTA)
  hh:        K1 -> K2 -> K2 -> K3([N, NW, NE]) -> K3([S, SE, SW], WTA)

Padding (all exact, validated by the bit-exactness suite):
  rows/cols: zero-cost pad rows (bottom) and cols (right). A zero-cost
    band propagates L = 0 through any scan, so the first real row/col a
    sweep enters sees exactly the fresh-start (zero) carry the unpadded
    XLA reference uses.
  disparities: pad lanes get C_pad = Cmax + 2*P2. Any lane with cost
    >= Cmax + 2*P2 keeps L_pad >= C_pad >= min-over-real-lanes + (P2 - P1)
    at every step, so pad lanes never win the running min, never undercut
    the P2 escape of the last real lane's d+1 neighbor, and never win the
    WTA argmin or its uniqueness competitor.

Storage dtypes are int16 whenever the worst-case magnitude
k * (Cmax + 3*P2) (k = number of directions summed into the stored
tensor) fits; per-direction L always fits int16 for OpenCV's parameter
range (block_size <= 11, prefilter_cap <= 63). P1/P2: stereo_core.py:51-52.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import costs as xcosts

__all__ = ["sgm_disparity", "pallas_supported", "bt_cost_volume_pallas",
           "hsweep_pallas", "rowsweep_pallas"]

LANE = 128
CROWS = 4    # row-band height of the cost kernel
SR = 32      # row-band height of the horizontal scan kernels
XC = 128     # x-chunk width of the horizontal scan kernels
U = 8        # x positions per horizontal-scan loop iteration
INTERPRET = False  # set True to run kernels in interpreter mode (CPU tests)

_BIG = 2**20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cost_bounds(cfg) -> Tuple[int, int]:
    """(Cmax, C_pad): max real block cost and the pad-lane cost."""
    cmax = cfg.block_size ** 2 * 2 * cfg.prefilter_cap
    return cmax, cmax + 2 * cfg.p2


def _ldir_bound(cfg) -> int:
    """Worst-case per-direction aggregated cost (pad lanes included)."""
    cmax, _ = _cost_bounds(cfg)
    return cmax + 3 * cfg.p2


def _stored_paths(cfg) -> int:
    """Directions summed into the largest *stored* partial sum: the final
    pass's sum lives only in WTA registers."""
    return {3: 2, 4: 3, 5: 2, 8: 5}[cfg.num_paths]


def _acc_dtype(cfg):
    if _stored_paths(cfg) * _ldir_bound(cfg) < 32600:
        return jnp.int16
    return jnp.int32


def pallas_supported(cfg, shape: Tuple[int, int]) -> bool:
    if cfg.cost != "bt":
        return False
    # Per-direction carries / cost volume must fit int16.
    _, c_pad = _cost_bounds(cfg)
    if max(_ldir_bound(cfg), c_pad) >= 32600:
        return False
    h, w = shape
    if w <= cfg.num_disp + cfg.min_disp or h < cfg.block_size:
        return False
    return True


# ----------------------------------------------------------------------
# K1: BT cost volume with fused SAD box-sum and in-VMEM transpose.
# ----------------------------------------------------------------------


def _cost_kernel(u_hbm, u0_hbm, u1_hbm, v_hbm, v0_hbm, v1_hbm, out_ref,
                 u_s, u0_s, u1_s, v_s, v0_s, v1_s, cbuf, sems, *,
                 d_real, min_disp, block_size, pad, w, wp, rows_al,
                 real_h, c_pad_val):
    """Grid (bands, d-chunks), d fastest. DMA the band's slabs at chunk 0;
    the rolling right buffers persist in scratch across d-chunks. Each
    d-chunk accumulates 128 full-width cost rows in `cbuf` (rows, 128, Wp)
    then writes them transposed as the (rows, Wp, 128) output block."""
    r = block_size // 2
    i = pl.program_id(0)
    j = pl.program_id(1)
    dc = cbuf.shape[1]  # 128

    @pl.when(j == 0)
    def _():
        dmas = []
        for k, (hbm, vmem) in enumerate(
            ((u_hbm, u_s), (u0_hbm, u0_s), (u1_hbm, u1_s),
             (v_hbm, v_s), (v0_hbm, v0_s), (v1_hbm, v1_s))
        ):
            dma = pltpu.make_async_copy(
                hbm.at[pl.ds(i * rows_al, rows_al), :], vmem, sems.at[k]
            )
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()

    u = u_s[:]
    u0 = u0_s[:]
    u1 = u1_s[:]
    base = pad - min_disp
    w_ext = wp + 2 * r
    rows = cbuf.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    row = i * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0)
    live = col < w
    if real_h is not None:
        live = live & (row < real_h)

    def body(k, _):
        dd = j * dc + k  # global disparity index
        v = v_s[:, base: base + w_ext]
        v0 = v0_s[:, base: base + w_ext]
        v1 = v1_s[:, base: base + w_ext]
        ue = u[:, :w_ext]
        u0e = u0[:, :w_ext]
        u1e = u1[:, :w_ext]
        c0 = jnp.maximum(jnp.maximum(ue - v1, v0 - ue), 0.0)
        c1 = jnp.maximum(jnp.maximum(v - u1e, u0e - v), 0.0)
        pc = jnp.minimum(c0, c1)
        # Cost-row taps right of the last real column replicate it (OpenCV
        # clamps window taps on the cost row at x = w-1).
        if r > 0:
            edge = pc[:, w + r - 1: w + r]
            pc = jnp.concatenate(
                [pc[:, : w + r],
                 jnp.broadcast_to(edge, (pc.shape[0], w_ext - (w + r)))],
                axis=1,
            )
        acc_v = pc[:rows, :]
        for k2 in range(1, block_size):
            acc_v = acc_v + pc[k2: k2 + rows, :]
        acc = acc_v[:, :wp]
        for k2 in range(1, block_size):
            acc = acc + acc_v[:, k2: k2 + wp]
        acc = acc.astype(jnp.int32)
        # Zero-cost pad rows/cols keep every sweep's carry at the
        # fresh-start value the unpadded reference uses; pad disparity
        # lanes carry C_pad so they never win a min (module docstring).
        acc = jnp.where(live, acc, 0)
        acc = jnp.where(dd < d_real, acc, c_pad_val)
        cbuf[:, k, :] = acc
        # Roll the scratch buffers in place (VMEM->VMEM); keeping them as
        # register-carried loop state explodes compile time.
        @pl.when(dd + 1 < d_real)
        def _():
            v_s[:] = pltpu.roll(v_s[:], 1, 1)
            v0_s[:] = pltpu.roll(v0_s[:], 1, 1)
            v1_s[:] = pltpu.roll(v1_s[:], 1, 1)
        return 0

    jax.lax.fori_loop(0, dc, body, 0)
    # (rows, 128, Wp) -> (rows, Wp, 128) in VMEM, 128-lane squares at a
    # time (Mosaic lowers square sublane<->lane transposes natively).
    for jw in range(wp // LANE):
        sl = slice(jw * LANE, (jw + 1) * LANE)
        out_ref[:, sl, :] = jnp.swapaxes(cbuf[:, :, sl], 1, 2).astype(
            jnp.int16)


def bt_cost_volume_pallas(left, right, cfg, out_h: Optional[int] = None,
                          out_w: Optional[int] = None):
    """(H, W) grayscale pair -> (Hp, Wp, Dp) int16 padded cost volume.

    Prefilter + BT + SAD per costs.bt_cost_volume semantics (OpenCV
    calcPixelCostBT, stereo_core.py:63-75). Hp/Wp/Dp rounded up to
    band/lane multiples; pad semantics in the module docstring. Padding is
    applied to the *prefiltered* rows (band_stack pads with edge
    replication), never to the raw images: replicating a raw row would
    change its Sobel response and corrupt the bottom r real rows' box sums.
    """
    h, w = left.shape
    d_real = cfg.num_disp
    dp = _round_up(d_real, LANE)
    bs = cfg.block_size
    r = bs // 2
    pad = cfg.min_disp + d_real

    hp = _round_up(h, 64) if out_h is None else out_h
    wp = _round_up(w, LANE) if out_w is None else out_w
    if hp % 64 or hp < h or wp % LANE or wp < w:
        raise ValueError("bad out_h/out_w")
    real_h = h if hp > h else None
    _, c_pad_val = _cost_bounds(cfg)

    pl_img = xcosts.xsobel_prefilter(left, cfg.prefilter_cap)
    pr_img = xcosts.xsobel_prefilter(right, cfg.prefilter_cap)
    u0, u1 = xcosts._half_sample_envelope(pl_img)
    v0, v1 = xcosts._half_sample_envelope(pr_img)

    rows_ext = CROWS + 2 * r
    rows_al = _round_up(rows_ext, 8)
    wl_al = _round_up(wp + 2 * r, LANE)
    wr_al = _round_up(pad + wp + 2 * r, LANE)

    # Slabs are stored pre-banded: band i occupies rows
    # [i*rows_al, (i+1)*rows_al), so the per-band DMA source is a plain
    # sublane-aligned contiguous row range.
    def band_stack(x, width_al):
        x = jnp.pad(
            x,
            ((r, r + (hp - h) + (rows_al - rows_ext)),
             (0, width_al - x.shape[1])),
            mode="edge",
        )
        bands = [x[i * CROWS: i * CROWS + rows_al] for i in range(hp // CROWS)]
        return jnp.concatenate(bands, axis=0)

    def prep_left(x):
        return band_stack(jnp.pad(x, ((0, 0), (r, r)), mode="edge"), wl_al)

    def prep_right(x):
        return band_stack(
            jnp.pad(x, ((0, 0), (pad + r, r)), mode="edge"), wr_al
        )

    u, u0p, u1p = map(prep_left, (pl_img, u0, u1))
    v, v0p, v1p = map(prep_right, (pr_img, v0, v1))

    grid = (hp // CROWS, dp // LANE)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec(
        (CROWS, wp, LANE), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _cost_kernel, d_real=d_real, min_disp=cfg.min_disp,
        block_size=bs, pad=pad, w=w, wp=wp, rows_al=rows_al,
        real_h=real_h, c_pad_val=c_pad_val,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[any_spec] * 6,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((hp, wp, dp), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((rows_al, wl_al), jnp.float32),
            pltpu.VMEM((rows_al, wl_al), jnp.float32),
            pltpu.VMEM((rows_al, wl_al), jnp.float32),
            pltpu.VMEM((rows_al, wr_al), jnp.float32),
            pltpu.VMEM((rows_al, wr_al), jnp.float32),
            pltpu.VMEM((rows_al, wr_al), jnp.float32),
            pltpu.VMEM((CROWS, LANE, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(u, u0p, u1p, v, v0p, v1p)


# ----------------------------------------------------------------------
# SGM scan step (shared): int32 math throughout.
# ----------------------------------------------------------------------


def _min_lanes(x):
    """All-lanes minimum broadcast back to every lane, via a log2(D)
    rotate-and-min tree. Mosaic's native cross-lane jnp.min lowering costs
    ~20x more than this tree (measured ~7 ms vs ~0.3 ms per 1080p/128-lane
    volume pass), so every lane reduction in the hot path goes through
    here. Requires D to be a power of two (Dp always is)."""
    d = x.shape[-1]
    k = 1
    while k < d:
        x = jnp.minimum(x, pltpu.roll(x, k, x.ndim - 1))
        k *= 2
    return x


def _sgm_step(l_prev, c, p1, p2, big, tree_min=True):
    """One SGM recurrence step. l_prev, c: (N, D) int32.

    The d+-1 neighbor reads are circular lane rolls with the wrapped lane
    masked to `big` — Mosaic lowers pltpu.roll natively, whereas a lane
    concatenate of offset slices fails to compile.

    tree_min picks the reduction lowering: the rotate tree wins on big
    (full-row) tiles where throughput dominates; the native reduction wins
    inside the latency-bound horizontal scans whose tiny per-step tiles
    serialize the tree's 7 dependent rolls."""
    d = l_prev.shape[-1]
    if tree_min:
        min_prev = _min_lanes(l_prev)
    else:
        min_prev = jnp.min(l_prev, axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, l_prev.shape, 1)
    up = jnp.where(lane == d - 1, big, pltpu.roll(l_prev, d - 1, 1))
    dn = jnp.where(lane == 0, big, pltpu.roll(l_prev, 1, 1))
    best = jnp.minimum(jnp.minimum(l_prev, jnp.minimum(up, dn) + p1),
                       min_prev + p2)
    return c + best - min_prev


# ----------------------------------------------------------------------
# K2: horizontal scans (forward, then backward fused with the accumulate).
# ----------------------------------------------------------------------


def _hscan_kernel(*refs, p1, p2, backward, accumulate, out_dtype):
    if accumulate:
        c_ref, a_ref, out_ref, c32, a32, o32, carry = refs
    else:
        c_ref, out_ref, c32, o32, carry = refs
        a32 = None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    # Stage int16 blocks to int32 scratch: dynamic sublane slices are only
    # legal on 32-bit tiles.
    c32[:] = c_ref[:].astype(jnp.int32)
    if accumulate:
        a32[:] = a_ref[:].astype(jnp.int32)

    nit = XC // U

    def body(k, l_prev):
        # One slab load/store of U consecutive x positions amortizes
        # per-step loop and addressing overhead; the recurrence itself
        # stays strictly sequential.
        base = (nit - 1 - k) * U if backward else k * U
        c_blk = c32[:, pl.ds(base, U), :]
        if accumulate:
            a_blk = a32[:, pl.ds(base, U), :]
        res = [None] * U
        order = range(U - 1, -1, -1) if backward else range(U)
        for i in order:
            l_prev = _sgm_step(l_prev, c_blk[:, i, :], p1, p2, _BIG,
                               tree_min=False)
            res[i] = (a_blk[:, i, :] + l_prev) if accumulate else l_prev
        o32[:, pl.ds(base, U), :] = jnp.stack(res, axis=1)
        return l_prev

    carry[:] = jax.lax.fori_loop(0, nit, body, carry[:])
    out_ref[:] = o32[:].astype(out_dtype)


def hsweep_pallas(cost, acc, p1, p2, backward, out_dtype=jnp.int16):
    """One horizontal SGM sweep over cost (Hp, Wp, Dp) int16.

    acc=None: returns L (out_dtype). acc given: returns acc + L."""
    h, w, d = cost.shape
    nchunks = w // XC
    if backward:
        index_map = lambda i, j: (i, nchunks - 1 - j, 0)
    else:
        index_map = lambda i, j: (i, j, 0)

    def spec(dt):
        return pl.BlockSpec((SR, XC, d), index_map, memory_space=pltpu.VMEM)

    ins = [cost] if acc is None else [cost, acc]
    kernel = functools.partial(
        _hscan_kernel, p1=p1, p2=p2, backward=backward,
        accumulate=acc is not None, out_dtype=out_dtype,
    )
    scratch = [pltpu.VMEM((SR, XC, d), jnp.int32)] * (2 + (acc is not None))
    scratch.append(pltpu.VMEM((SR, d), jnp.int32))
    return pl.pallas_call(
        kernel,
        grid=(h // SR, nchunks),
        in_specs=[spec(x.dtype) for x in ins],
        out_specs=spec(out_dtype),
        out_shape=jax.ShapeDtypeStruct((h, w, d), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(*ins)


# ----------------------------------------------------------------------
# K3 (+K4): full-width row-sequential sweep over any set of downward or
# upward directions; diagonals are sublane shifts of the carry. Optionally
# fuses WTA so the final S volume never reaches HBM.
# ----------------------------------------------------------------------


def _wta_row(s, *, d_real, min_disp, uniq):
    """WTA on one aggregated row s (Wp, Dp) int32 -> (disp, d0, min_s),
    each (Wp,) after the final lane slice.

    All cross-lane reductions are rotate-min trees (_min_lanes); the
    min + argmin pair comes from ONE packed tree — key = s * Dp + lane,
    whose minimum simultaneously carries the lowest cost and, among ties,
    the smallest disparity (OpenCV's tie-break)."""
    big = jnp.int32(_BIG)
    dp = s.shape[-1]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)

    m = _min_lanes(s * dp + d_idx)
    min_s = m // dp
    d0 = m - min_s * dp

    cm = _min_lanes(jnp.where(d_idx == d0 - 1, s, big))
    cp = _min_lanes(jnp.where(d_idx == d0 + 1, s, big))

    invalid = jnp.zeros(d0.shape, dtype=jnp.bool_)
    if uniq > 0:
        near = jnp.abs(d_idx - d0) <= 1
        competitor = _min_lanes(jnp.where(near, big, s))
        invalid = competitor * (100 - uniq) < min_s * 100

    denom = jnp.maximum(cm + cp - 2 * min_s, 1)
    delta16 = jax.lax.div((cm - cp) * 16 + denom, 2 * denom)
    interior = (d0 > 0) & (d0 < d_real - 1)
    delta16 = jnp.where(interior, delta16, 0)
    disp16 = (min_disp + d0) * 16 + delta16
    disp = disp16.astype(jnp.float32) / 16.0
    disp = jnp.where(invalid, jnp.float32(min_disp - 1), disp)
    # LR consistency runs outside on these maps (ops/wta.lr_invalidate);
    # uniqueness-rejected pixels are excluded as claimants via big cost.
    min_s = jnp.where(invalid, big, min_s)
    return disp[..., 0], d0[..., 0], min_s[..., 0]


def _pick_wch(wp: int, cap: int = 640) -> int:
    """Largest lane-aligned divisor of wp that is <= cap."""
    best = LANE
    for k in range(1, wp // LANE + 1):
        c = k * LANE
        if wp % c == 0 and c <= cap:
            best = c
    return best


def _rowsweep_kernel(c_ref, a_ref, *rest, p1, p2, dxs, reverse, rows,
                     wta, out_dtype, d_real, min_disp, uniq):
    has_diag = any(dx != 0 for dx in dxs)
    if wta:
        disp_ref, d0_ref, mins_ref = rest[:3]
        scratch = rest[3:]
    else:
        out_ref = rest[0]
        scratch = rest[1:]
    carry, c_row, a_row = scratch[:3]
    shifted = scratch[3] if has_diag else None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    wp, dp = c_ref.shape[1], c_ref.shape[2]
    wch = _pick_wch(wp)
    sub = jax.lax.broadcasted_iota(jnp.int32, (wp, dp), 0)

    # Rows are a static loop (2 or 4); the row itself is staged into int32
    # scratch (dynamic sublane slices need 32-bit tiles) and processed in
    # lane-aligned W chunks via fori_loop so WTA temporaries are reused
    # across chunks instead of spilling a full 1080p row (~20 MB) at once.
    for k in range(rows):
        rr = rows - 1 - k if reverse else k
        c_row[:] = c_ref[rr, :, :].astype(jnp.int32)
        a_row[:] = a_ref[rr, :, :].astype(jnp.int32)
        for t, dx in enumerate(dxs):
            if dx != 0:
                # Predecessor of (y, x) is (y -/+ 1, x - dx): shift the
                # carry row along W; the vacated edge column restarts the
                # path (zero carry == fresh start, as in ops/sgm).
                # pltpu.roll is circular (and needs shift >= 0), so mask
                # the wrapped column(s).
                prev = pltpu.roll(carry[t, :, :], dx % wp, 0)
                if dx > 0:
                    prev = jnp.where(sub < dx, 0, prev)
                else:
                    prev = jnp.where(sub >= wp + dx, 0, prev)
                shifted[t, :, :] = prev

        def chunk(j, _):
            sl = pl.ds(j * wch, wch)
            c = c_row[sl, :]
            total = a_row[sl, :]
            for t, dx in enumerate(dxs):
                prev = carry[t, sl, :] if dx == 0 else shifted[t, sl, :]
                l_cur = _sgm_step(prev, c, p1, p2, _BIG)
                carry[t, sl, :] = l_cur
                total = total + l_cur
            if wta:
                disp, d0, mins = _wta_row(total, d_real=d_real,
                                          min_disp=min_disp, uniq=uniq)
                disp_ref[0, j, rr, :] = disp
                d0_ref[0, j, rr, :] = d0
                mins_ref[0, j, rr, :] = mins
            else:
                a_row[sl, :] = total  # reuse the staging row as out buffer
            return 0

        jax.lax.fori_loop(0, wp // wch, chunk, 0)
        if not wta:
            out_ref[rr, :, :] = a_row[:].astype(out_dtype)


def rowsweep_pallas(cost, acc, cfg, dxs: Sequence[int], reverse: bool,
                    wta: bool, out_dtype=jnp.int16):
    """acc + sum of row-direction sweeps; dy = +1 (or -1 with reverse).

    dxs lists the column offsets of the propagation directions, e.g.
    [0] = vertical, [0, 1, -1] = vertical + both diagonals. With wta=True
    returns (disp_nolr, d0, min_s) maps instead of the volume."""
    h, w, d = cost.shape
    # Band height bounded by VMEM: double-buffered in/out blocks plus the
    # (n_dirs, W, D) int32 carry (and, for diagonals, shifted-carry) scratch.
    small = max(cost.dtype.itemsize, acc.dtype.itemsize,
                2 if wta else jnp.dtype(out_dtype).itemsize) <= 2
    rows = 4 if (small and len(dxs) == 1) else 2
    nbands = h // rows

    if reverse:
        index_map = lambda i: (nbands - 1 - i, 0, 0)
    else:
        index_map = lambda i: (i, 0, 0)
    vol_spec = pl.BlockSpec((rows, w, d), index_map, memory_space=pltpu.VMEM)
    # Map outputs are (nbands, nchunks, rows, wch): the last two dims equal
    # the array's (always a legal block regardless of sublane tiling; wch
    # stays on lanes — a rows-sized lane dim would be padded to 128 and
    # blow VMEM), the chunk index is written dynamically by the kernel.
    wch = _pick_wch(w)
    nch = w // wch
    if reverse:
        map_im = lambda i: (nbands - 1 - i, 0, 0, 0)
    else:
        map_im = lambda i: (i, 0, 0, 0)
    map_spec = pl.BlockSpec((1, nch, rows, wch), map_im,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _rowsweep_kernel, p1=cfg.p1, p2=cfg.p2, dxs=tuple(dxs),
        reverse=reverse, rows=rows, wta=wta, out_dtype=out_dtype,
        d_real=cfg.num_disp, min_disp=cfg.min_disp,
        uniq=cfg.uniqueness_ratio,
    )
    if wta:
        out_specs = (map_spec, map_spec, map_spec)
        out_shape = (
            jax.ShapeDtypeStruct((nbands, nch, rows, wch), jnp.float32),
            jax.ShapeDtypeStruct((nbands, nch, rows, wch), jnp.int32),
            jax.ShapeDtypeStruct((nbands, nch, rows, wch), jnp.int32),
        )
    else:
        out_specs = vol_spec
        out_shape = jax.ShapeDtypeStruct((h, w, d), out_dtype)
    scratch = [
        pltpu.VMEM((len(dxs), w, d), jnp.int32),  # carries
        pltpu.VMEM((w, d), jnp.int32),            # staged cost row
        pltpu.VMEM((w, d), jnp.int32),            # staged acc row / out
    ]
    if any(dx != 0 for dx in dxs):
        scratch.append(pltpu.VMEM((len(dxs), w, d), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=[vol_spec, vol_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=INTERPRET,
    )(cost, acc)
    if wta:
        # (nbands, nch, rows, wch) -> (H, W).
        return tuple(
            m.transpose(0, 2, 1, 3).reshape(h, w) for m in out
        )
    return out


# ----------------------------------------------------------------------
# Orchestration.
# ----------------------------------------------------------------------


def sgm_disparity(left, right, cfg):
    """Full Pallas matcher, all four reference modes. Raises
    NotImplementedError outside kernel support; pipeline.raw_disparity
    then uses the XLA path."""
    h, w = left.shape
    if not pallas_supported(cfg, (h, w)):
        raise NotImplementedError

    acc_dt = _acc_dtype(cfg)
    c = bt_cost_volume_pallas(
        left.astype(jnp.float32), right.astype(jnp.float32), cfg
    )

    p1, p2 = cfg.p1, cfg.p2
    lw = hsweep_pallas(c, None, p1, p2, backward=False, out_dtype=jnp.int16)
    swe = hsweep_pallas(c, lw, p1, p2, backward=True, out_dtype=acc_dt)

    paths = cfg.num_paths
    if paths == 3:
        disp, d0, min_s = rowsweep_pallas(c, swe, cfg, [0], False, True)
    elif paths == 4:
        s3 = rowsweep_pallas(c, swe, cfg, [0], False, False, out_dtype=acc_dt)
        disp, d0, min_s = rowsweep_pallas(c, s3, cfg, [0], True, True)
    elif paths == 5:
        disp, d0, min_s = rowsweep_pallas(c, swe, cfg, [0, 1, -1], False,
                                          True)
    else:  # 8
        s5 = rowsweep_pallas(c, swe, cfg, [0, 1, -1], False, False,
                             out_dtype=acc_dt)
        disp, d0, min_s = rowsweep_pallas(c, s5, cfg, [0, -1, 1], True, True)

    disp, d0, min_s = disp[:h, :w], d0[:h, :w], min_s[:h, :w]
    if cfg.disp12_max_diff >= 0:
        from .wta import lr_invalidate

        valid = min_s < _BIG
        bad = lr_invalidate(d0, min_s, valid, cfg.disp12_max_diff,
                            cfg.min_disp, num_disp=cfg.num_disp)
        disp = jnp.where(bad, jnp.float32(cfg.min_disp - 1), disp)
    return disp
