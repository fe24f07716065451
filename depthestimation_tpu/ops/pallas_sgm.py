"""Pallas TPU kernels for the SGM matcher hot path.

Replaces the XLA reference implementations in ops/costs.py, ops/sgm.py and
ops/wta.py on TPU (reference semantics: cv2.StereoSGBM internals,
stereo_core.py:63-75,231). Same math, kernelized for the VPU and sized for
the ~16 MB VMEM budget (every block is a (ROWS, XCHUNK, D) tile; scan
carries live in scratch that persists across grid steps):

  K1  cost volume: BT pixel cost on prefiltered images + fused
      block_size^2 SAD box-sum. Per-band inputs are DMA'd from HBM into
      aligned scratch; the per-disparity right-image shift is a rolling
      buffer (roll right one lane per d, read a static window). Output is
      (H, D, W)-ordered, transposed once to the (H, W, D) sweep layout.
  K2a horizontal forward scan: grid (bands, x-chunks), carry (ROWS, D) in
      scratch, writes L_fwd.
  K2b horizontal backward scan: reversed x-chunk index map, writes
      L_fwd + L_bwd.
  K3  vertical sweep: grid (x-chunks, bands), carry (XCHUNK, D) in
      scratch; down and up via a reversed band index map. Pure vertical
      paths only — diagonal modes ('sgbm'/'hh') currently fall back to
      the XLA path, whose scans handle carry shifts across full rows.
  K4  WTA: argmin + OpenCV uniqueness + integer subpixel on the 1/16
      grid; the OpenCV scatter-min LR check runs outside on the (H, W)
      maps (ops/wta.lr_invalidate).

Aggregation dtype is int32: int16 would halve bandwidth but its packed
(16, 128) tiling forbids the single-row middle-dim loads/stores the scans
make. P1/P2 derivation: stereo_core.py:51-52.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import costs as xcosts

__all__ = ["sgm_disparity", "pallas_supported"]

ROWS = 8      # row-band height (cost kernel, vertical sweeps, WTA)
SROWS = 32    # row-band height for the horizontal scan kernels
UNROLL = 4    # x positions per horizontal-scan loop iteration
LANE = 128
INTERPRET = False  # set True to run kernels in interpreter mode (CPU tests)


def pallas_supported(cfg, shape: Tuple[int, int]) -> bool:
    if cfg.num_disp % LANE != 0:
        return False
    if cfg.num_paths not in (3, 4):
        # Diagonal path modes use the XLA scans (carry shifts cross the
        # x-chunk boundary).
        return False
    return True


# ----------------------------------------------------------------------
# K1: BT cost volume with fused SAD box-sum.
# ----------------------------------------------------------------------


def _cost_kernel(u_hbm, u0_hbm, u1_hbm, v_hbm, v0_hbm, v1_hbm, out_ref,
                 u_s, u0_s, u1_s, v_s, v0_s, v1_s, sems, *,
                 d_chunk, min_disp, block_size, pad, w, rows_al, real_h):
    """Grid (bands, d-chunks), d fastest. DMA the band's slabs at chunk 0;
    the rolling right buffers persist in scratch across d-chunks."""
    r = block_size // 2
    i = pl.program_id(0)
    j = pl.program_id(1)

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
    w_ext = w + 2 * r

    def body(dd, _):
        v = v_s[:, base : base + w_ext]
        v0 = v0_s[:, base : base + w_ext]
        v1 = v1_s[:, base : base + w_ext]
        ue = u[:, :w_ext]
        u0e = u0[:, :w_ext]
        u1e = u1[:, :w_ext]
        c0 = jnp.maximum(jnp.maximum(ue - v1, v0 - ue), 0.0)
        c1 = jnp.maximum(jnp.maximum(v - u1e, u0e - v), 0.0)
        pc = jnp.minimum(c0, c1)
        # Right-edge box taps replicate the last valid cost column (OpenCV
        # clamps window taps on the cost row).
        if r > 0:
            edge = pc[:, w + r - 1 : w + r]
            pc = jnp.concatenate(
                [pc[:, : w + r], jnp.broadcast_to(edge, (pc.shape[0], r))],
                axis=1,
            )
        acc_v = pc[:ROWS, :]
        for k in range(1, block_size):
            acc_v = acc_v + pc[k : k + ROWS, :]
        acc = acc_v[:, :w]
        for k in range(1, block_size):
            acc = acc + acc_v[:, k : k + w]
        acc = acc.astype(jnp.int32)
        if real_h is not None:
            # Zero the rows beyond the real image: a zero-cost pad row
            # makes every SGM sweep entering it carry L=0, so the first
            # real row sees exactly the fresh-start carry the unpadded
            # XLA reference uses (bit-exact under band padding).
            row = i * ROWS + jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
            acc = jnp.where(row < real_h, acc, 0)
        # Output layout (rows, D, W): lanes span W -> middle-dim write.
        out_ref[:, dd, :] = acc
        # Roll the scratch buffers in place (VMEM->VMEM); keeping them as
        # register-carried loop state explodes compile time.
        v_s[:] = pltpu.roll(v_s[:], 1, 1)
        v0_s[:] = pltpu.roll(v0_s[:], 1, 1)
        v1_s[:] = pltpu.roll(v1_s[:], 1, 1)
        return 0

    jax.lax.fori_loop(0, d_chunk, body, 0)


def bt_cost_volume_pallas(left, right, cfg, out_h=None):
    """(H, W) prefilter+BT+SAD -> (H, W, D) int32 cost volume.

    out_h: pad the output to this many rows (multiple of ROWS); the pad
    rows are written as zeros so the SGM sweeps entering them carry L=0 —
    the first real row then sees exactly the fresh-start carry of the
    unpadded XLA reference (bit-exact band padding). Padding is applied
    to the *prefiltered* rows here, never to the raw images: replicating
    a raw row changes its Sobel response and corrupts the bottom r real
    rows' SAD box sums, whereas replicating prefiltered rows reproduces
    OpenCV's clamped cost-row taps exactly."""
    h, w = left.shape
    d_num = cfg.num_disp
    bs = cfg.block_size
    r = bs // 2
    pad = cfg.min_disp + d_num

    pl_img = xcosts.xsobel_prefilter(left, cfg.prefilter_cap)
    pr_img = xcosts.xsobel_prefilter(right, cfg.prefilter_cap)
    u0, u1 = xcosts._half_sample_envelope(pl_img)
    v0, v1 = xcosts._half_sample_envelope(pr_img)

    if out_h is None:
        h_pad = (-h) % ROWS
        hp = h + h_pad
        real_h = None
        ret_h = h
    else:
        if out_h % ROWS != 0 or out_h < h:
            raise ValueError("out_h must be a multiple of ROWS and >= h")
        hp = out_h
        h_pad = hp - h
        real_h = h if h_pad else None
        ret_h = hp
    rows_ext = ROWS + 2 * r
    rows_al = -(-rows_ext // 8) * 8
    w_l = w + 2 * r
    w_r = pad + w + 2 * r
    wl_al = -(-w_l // LANE) * LANE
    wr_al = -(-w_r // LANE) * LANE

    # Slabs are stored pre-banded: band i occupies rows
    # [i*rows_al, (i+1)*rows_al), so the per-band DMA source is a plain
    # sublane-aligned contiguous row range.
    def band_stack(x, width_al):
        x = jnp.pad(
            x,
            ((r, r + h_pad + (rows_al - rows_ext)), (0, width_al - x.shape[1])),
            mode="edge",
        )
        bands = [x[i * ROWS : i * ROWS + rows_al] for i in range(hp // ROWS)]
        return jnp.concatenate(bands, axis=0)

    def prep_left(x):
        return band_stack(jnp.pad(x, ((0, 0), (r, r)), mode="edge"), wl_al)

    def prep_right(x):
        return band_stack(
            jnp.pad(x, ((0, 0), (pad + r, r)), mode="edge"), wr_al
        )

    u, u0p, u1p = map(prep_left, (pl_img, u0, u1))
    v, v0p, v1p = map(prep_right, (pr_img, v0, v1))

    d_chunk = min(d_num, 64)
    grid = (hp // ROWS, d_num // d_chunk)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec(
        (ROWS, d_chunk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _cost_kernel, d_chunk=d_chunk, min_disp=cfg.min_disp,
        block_size=bs, pad=pad, w=w, rows_al=rows_al, real_h=real_h,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[any_spec] * 6,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((hp, d_num, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows_al, wl_al), jnp.float32),
            pltpu.VMEM((rows_al, wl_al), jnp.float32),
            pltpu.VMEM((rows_al, wl_al), jnp.float32),
            pltpu.VMEM((rows_al, wr_al), jnp.float32),
            pltpu.VMEM((rows_al, wr_al), jnp.float32),
            pltpu.VMEM((rows_al, wr_al), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(u, u0p, u1p, v, v0p, v1p)
    # (H, D, W) -> (H, W, D): sweeps/WTA read (., D) planes, D on lanes.
    return jnp.swapaxes(out, 1, 2)[:ret_h]


# ----------------------------------------------------------------------
# SGM scan step (shared): int32 throughout.
# ----------------------------------------------------------------------

_BIG = 2**20

def _pick_chunk(w: int, max_chunk: int = 512) -> int:
    """Largest lane-aligned (multiple-of-128) divisor of w that is
    <= max_chunk; falls back to the full width when none exists."""
    best = None
    for k in range(1, w // LANE + 1):
        c = k * LANE
        if w % c == 0 and c <= max_chunk:
            best = c
    return best if best is not None else w




def _sgm_step(l_prev, c, p1, p2, big):
    """One SGM recurrence step. l_prev, c: (N, D) int32.

    The d±1 neighbor reads are circular lane rolls with the wrapped lane
    masked to `big` — Mosaic lowers pltpu.roll natively, whereas a lane
    concatenate of offset slices fails to compile ("result/input offset
    mismatch on non-concat dimension")."""
    d = l_prev.shape[-1]
    min_prev = jnp.min(l_prev, axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, l_prev.shape, 1)
    up = jnp.where(lane == d - 1, big, pltpu.roll(l_prev, d - 1, 1))
    dn = jnp.where(lane == 0, big, pltpu.roll(l_prev, 1, 1))
    best = jnp.minimum(jnp.minimum(l_prev, jnp.minimum(up, dn) + p1),
                       min_prev + p2)
    return c + best - min_prev


# ----------------------------------------------------------------------
# K2: horizontal scans (forward, then backward+accumulate).
# ----------------------------------------------------------------------


def _hscan_kernel(*refs, p1, p2, chunk, backward, accumulate, unroll):
    if accumulate:
        c_ref, acc_ref, out_ref, carry = refs
    else:
        c_ref, out_ref, carry = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    nit = chunk // unroll

    def body(k, l_prev):
        # One slab load/store of `unroll` consecutive x positions
        # amortizes per-step loop and addressing overhead; the recurrence
        # itself stays strictly sequential.
        base = (nit - 1 - k) * unroll if backward else k * unroll
        c_blk = c_ref[:, pl.ds(base, unroll), :]
        if accumulate:
            a_blk = acc_ref[:, pl.ds(base, unroll), :]
        res = [None] * unroll
        order = range(unroll - 1, -1, -1) if backward else range(unroll)
        for i in order:
            l_prev = _sgm_step(l_prev, c_blk[:, i, :], p1, p2, _BIG)
            res[i] = (a_blk[:, i, :] + l_prev) if accumulate else l_prev
        out_ref[:, pl.ds(base, unroll), :] = jnp.stack(res, axis=1)
        return l_prev

    carry[:] = jax.lax.fori_loop(0, nit, body, carry[:])


def _hscan(cost, acc, p1, p2, backward):
    h, w, d = cost.shape
    # VMEM: 3 blocks (c, acc, out) double-buffered -> keep chunks small.
    chunk = _pick_chunk(w, max_chunk=128)
    nchunks = w // chunk
    unroll = UNROLL if chunk % UNROLL == 0 else 1
    if backward:
        index_map = lambda i, j: (i, nchunks - 1 - j, 0)
    else:
        index_map = lambda i, j: (i, j, 0)
    rows = SROWS if h % SROWS == 0 else ROWS
    spec = pl.BlockSpec((rows, chunk, d), index_map, memory_space=pltpu.VMEM)

    ins = [cost] if acc is None else [cost, acc]
    kernel = functools.partial(
        _hscan_kernel, p1=p1, p2=p2, chunk=chunk, backward=backward,
        accumulate=acc is not None, unroll=unroll,
    )
    return pl.pallas_call(
        kernel,
        grid=(h // rows, nchunks),
        in_specs=[spec] * len(ins),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, w, d), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(*ins)


def hsweep_pallas(cost, p1, p2):
    """cost (H, W, D) int32 -> L_left + L_right (H, W, D) int32."""
    fwd = _hscan(cost, None, p1, p2, backward=False)
    return _hscan(cost, fwd, p1, p2, backward=True)


# ----------------------------------------------------------------------
# K3: vertical sweeps (down / up) with a persistent column carry.
# ----------------------------------------------------------------------


def _vscan_kernel(c_ref, acc_ref, out_ref, carry, *, p1, p2, reverse, rows):
    i = pl.program_id(1)  # band index (fastest grid dim)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    def body(k, l_prev):
        rr = rows - 1 - k if reverse else k
        c = c_ref[rr, :, :]
        l_cur = _sgm_step(l_prev, c, p1, p2, _BIG)
        out_ref[rr, :, :] = acc_ref[rr, :, :] + l_cur
        return l_cur

    carry[:] = jax.lax.fori_loop(0, rows, body, carry[:])


def vsweep_pallas(cost, acc, p1, p2, reverse=False):
    """out = acc + L_vertical; (H, W, D) int32 volumes."""
    h, w, d = cost.shape
    nbands = h // ROWS
    chunk = _pick_chunk(w)
    nchunks = w // chunk

    if reverse:
        index_map = lambda j, i: (nbands - 1 - i, j, 0)
    else:
        index_map = lambda j, i: (i, j, 0)
    spec = pl.BlockSpec((ROWS, chunk, d), index_map, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _vscan_kernel, p1=p1, p2=p2, reverse=reverse, rows=ROWS
    )
    return pl.pallas_call(
        kernel,
        grid=(nchunks, nbands),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, w, d), jnp.int32),
        scratch_shapes=[pltpu.VMEM((chunk, d), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(cost, acc)


# ----------------------------------------------------------------------
# K4: WTA (argmin + uniqueness + integer subpixel); LR check outside.
# ----------------------------------------------------------------------


def _wta_kernel(s_ref, disp_ref, d0_ref, mins_ref, *, num_disp, min_disp,
                uniq):
    s = s_ref[:, :, :]  # (ROWS, chunk, D) int32
    big = jnp.int32(_BIG)

    min_s = jnp.min(s, axis=-1)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    is_min = s == min_s[..., None]
    d0 = jnp.min(jnp.where(is_min, d_idx, num_disp), axis=-1)

    cm = jnp.min(jnp.where(d_idx == (d0[..., None] - 1), s, big), axis=-1)
    cp = jnp.min(jnp.where(d_idx == (d0[..., None] + 1), s, big), axis=-1)

    invalid = jnp.zeros(d0.shape, dtype=jnp.bool_)
    if uniq > 0:
        near = jnp.abs(d_idx - d0[..., None]) <= 1
        competitor = jnp.min(jnp.where(near, big, s), axis=-1)
        invalid = competitor * (100 - uniq) < min_s * 100

    denom = jnp.maximum(cm + cp - 2 * min_s, 1)
    delta16 = jax.lax.div((cm - cp) * 16 + denom, 2 * denom)
    interior = (d0 > 0) & (d0 < num_disp - 1)
    delta16 = jnp.where(interior, delta16, 0)
    disp16 = (min_disp + d0) * 16 + delta16
    disp = disp16.astype(jnp.float32) / 16.0
    disp_ref[:, :] = jnp.where(invalid, jnp.float32(min_disp - 1), disp)
    # LR consistency runs outside on these maps (ops/wta.lr_invalidate);
    # uniqueness-rejected pixels are excluded as claimants via big cost.
    d0_ref[:, :] = d0
    mins_ref[:, :] = jnp.where(invalid, big, min_s)


def wta_pallas(s, cfg):
    """(H, W, D) int32 aggregated volume -> (disp_nolr, d0, min_s) maps.

    disp_nolr carries uniqueness + subpixel; the caller applies the OpenCV
    scatter-min LR check (ops/wta.lr_invalidate) on the maps."""
    h, w, d = s.shape
    chunk = _pick_chunk(w)
    nchunks = w // chunk
    spec = pl.BlockSpec((ROWS, chunk, d), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((ROWS, chunk), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _wta_kernel, num_disp=d, min_disp=cfg.min_disp,
        uniq=cfg.uniqueness_ratio,
    )
    return pl.pallas_call(
        kernel,
        grid=(h // ROWS, nchunks),
        in_specs=[spec],
        out_specs=(map_spec, map_spec, map_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=INTERPRET,
    )(s)


# ----------------------------------------------------------------------
# Orchestration.
# ----------------------------------------------------------------------


def sgm_disparity(left, right, cfg):
    """Full Pallas matcher (3/4-path modes). Raises NotImplementedError
    outside kernel support; pipeline.raw_disparity then uses XLA."""
    h, w = left.shape
    if not pallas_supported(cfg, (h, w)):
        raise NotImplementedError

    # Pad the cost volume to the horizontal-scan band height; pad rows are
    # zeros (bt_cost_volume_pallas out_h) so vertical sweeps crossing the
    # pad stay bit-exact vs the unpadded reference.
    h_pad = (-h) % SROWS
    c = bt_cost_volume_pallas(
        left.astype(jnp.float32), right.astype(jnp.float32), cfg,
        out_h=h + h_pad,
    )

    p1, p2 = cfg.p1, cfg.p2
    acc = hsweep_pallas(c, p1, p2)
    if cfg.num_paths == 3:
        s = vsweep_pallas(c, acc, p1, p2, reverse=False)
    else:  # 4
        acc = vsweep_pallas(c, acc, p1, p2, reverse=False)
        s = vsweep_pallas(c, acc, p1, p2, reverse=True)

    disp, d0, min_s = wta_pallas(s, cfg)
    if cfg.disp12_max_diff >= 0:
        from .wta import lr_invalidate

        valid = min_s < _BIG
        bad = lr_invalidate(d0, min_s, valid, cfg.disp12_max_diff,
                            cfg.min_disp, num_disp=cfg.num_disp)
        disp = jnp.where(bad, jnp.float32(cfg.min_disp - 1), disp)
    return disp[:h]
