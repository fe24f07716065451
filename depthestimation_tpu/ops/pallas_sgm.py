"""Pallas TPU kernels for the SGM matcher hot path.

Replaces the XLA reference implementations in ops/costs.py, ops/sgm.py and
ops/wta.py on TPU (reference semantics: cv2.StereoSGBM internals,
stereo_core.py:63-75,231). The design goal is minimum HBM traffic: every
volume is int16 and every kernel fuses as many scan directions as its
data order allows; layout moves between kernels are XLA transposes
(strided-DMA copies, measured ~1.6 ms each at 1080p/128d).

Kernel pipeline (volumes are (Hp, Wp, Dp) with D on lanes; Hp/Wp/Dp are the
image/disparity sizes padded to band/lane multiples — padding is *exact*,
see `Padding` below):

  K1 cost      grid (row-bands, x-chunks), output x-major (Wp, Hp, Dp).
               BT pixel cost on prefiltered images + fused SAD box-sum:
               per output column one (rows, Dp) tile is built from a lane
               slice of each x-reversed right slab (ascending d ==
               ascending reversed x), y-summed in-tile, and the x window
               is a RUNNING sum over a ring of block_size y-sums. int16
               out; OpenCV's cost-row edge replication for SAD taps at
               x > w-1 is handled in-kernel (clamp_tap). The
               row-major twin the row sweeps read is an XLA transpose
               (strided-DMA copy; A/B-tested equal to in-kernel emits).
  K2 hscan     grid (row-bands, x-chunks). Horizontal L->R scan; the
               R->L scan runs with reversed x-chunk index maps and fuses
               the accumulate (S_we = L_lr + L_rl). Blocks are tall and
               narrow — (rows up to full Hp) x HS_XC x Dp — so every
               sequential scan step is one full-height (rows, Dp) VPU
               plane; the x loop is statically unrolled (static mid-dim
               slices work on int16 tiles, unlike dynamic ones).
  K3 rowsweep  grid (row-bands). Full-width row-sequential scan computing
               any set of downward (or upward, via reversed index maps)
               directions in one pass: vertical and both diagonals differ
               only by a per-row sublane shift of the carry. Chunk offsets
               are static so int16 blocks are sliced directly (no int32
               staging pass). Fuses the accumulate; the last pass emits
               the full aggregated volume S (int16).
  WTA tail     argmin + OpenCV uniqueness + integer subpixel + LR run as
               XLA ops on S (ops/wta.wta_disparity): XLA's minor-dim
               reduces beat an in-kernel rotate-tree argmin ~2x measured
               on-chip (round 4), and multi-output fusion computes
               min/argmin/cm/cp/competitor in ~2 volume passes.

Mode composition (path sets from ops/sgm._PATHS; modes stereo_core.py:55-61):
  sgbm_3way: K1 -> K2(fwd) -> K2(bwd+acc) -> K3([N]) -> WTA tail
  hh4:       K1 -> K2 -> K2 -> K3([N]) -> K3([S]) -> WTA tail
  sgbm:      K1 -> K2 -> K2 -> K3([N, NW, NE]) -> WTA tail
  hh:        K1 -> K2 -> K2 -> K3([N, NW, NE]) -> K3([S, SE, SW]) -> WTA tail

Padding (all exact, validated by the bit-exactness suite):
  rows/cols: zero-cost pad rows (bottom) and cols (right). A zero-cost
    band propagates L = 0 through any scan, so the first real row/col a
    sweep enters sees exactly the fresh-start (zero) carry the unpadded
    XLA reference uses.
  disparities: pad lanes get C_pad = Cmax + 2*P2. Any lane with cost
    >= Cmax + 2*P2 keeps L_pad >= C_pad >= min-over-real-lanes + (P2 - P1)
    at every step, so pad lanes never win the running min and never
    undercut the P2 escape of the last real lane's d+1 neighbor; the WTA
    tail slices them off before its reductions.

Storage dtypes are int16 whenever the worst-case magnitude
k * (Cmax + 3*P2) (k = number of directions summed into the stored
tensor) fits; per-direction L always fits int16 for OpenCV's parameter
range (block_size <= 11, prefilter_cap <= 63). P1/P2: stereo_core.py:51-52.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import costs as xcosts

__all__ = ["sgm_disparity", "pallas_supported", "bt_cost_volume_pallas",
           "hsweep_pallas", "rowsweep_pallas"]

LANE = 128
CROWS = 4    # row-band height of the cost kernel
HS_XC = 16   # x positions per horizontal-scan block (re-tuned round 5 on
             # the zero-pad Hp layout: 16 beats 32 by 1.3 ms on the K2
             # pair AND compiles 3.3x faster; 8 is a Mosaic compile cliff)
INTERPRET = False  # set True to run kernels in interpreter mode (CPU tests)

_BIG = 2**20
# v5e has 128 MiB of VMEM; Mosaic's default scoped limit is 16 MiB, which
# is what produced the round-2 Dp=256 OOM. Kernels size their blocks
# against this budget and pass it as vmem_limit_bytes.
_VMEM_BUDGET = 100 * 2**20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cost_bounds(cfg) -> Tuple[int, int]:
    """(Cmax, C_pad): max real block cost and the pad-lane cost.

    BT: per-pixel cost <= 2*prefilter_cap (clipped Sobel + clipped value
    term). Census: per-pixel cost <= 24 (radius-2 Hamming bits)."""
    if cfg.cost == "census":
        cmax = cfg.block_size ** 2 * 24
    else:
        cmax = cfg.block_size ** 2 * 2 * cfg.prefilter_cap
    return cmax, cmax + 2 * cfg.p2


def _ldir_bound(cfg) -> int:
    """Worst-case per-direction aggregated cost (pad lanes included)."""
    cmax, _ = _cost_bounds(cfg)
    return cmax + 3 * cfg.p2


def _stored_paths(cfg) -> int:
    """Directions summed into the largest *intermediate* stored partial
    sum. The FINAL pass's full sum uses its own bound (_final_dtype):
    real lanes only, since pad lanes are sliced off before the WTA tail."""
    return {3: 2, 4: 3, 5: 2, 8: 5}[cfg.num_paths]


def _acc_dtype(cfg):
    if _stored_paths(cfg) * _ldir_bound(cfg) < 32600:
        return jnp.int16
    return jnp.int32


def _final_dtype(cfg):
    """Storage dtype of the final aggregated volume S. Per-direction L on a
    REAL lane is bounded by Cmax + P2 (the classic SGM bound: the neighbor
    term never exceeds min_prev + P2, so L <= C + P2), and only real lanes
    reach the WTA tail — pad lanes are sliced off first, so their wider
    Cmax + 3*P2 bound is irrelevant here. int16 would silently wrap for
    e.g. block_size=7 'hh' (8 * (Cmax + P2) = 36 848) or block_size=11
    sgbm_3way, so those configs store S as int32."""
    cmax, _ = _cost_bounds(cfg)
    if cfg.num_paths * (cmax + cfg.p2) < 32600:
        return jnp.int16
    return jnp.int32


def pallas_supported(cfg, shape: Tuple[int, int]) -> bool:
    if cfg.cost not in ("bt", "census"):
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
# K1: BT cost volume with fused SAD box-sum, produced x-major (Wp, Hp, Dp)
# so every store is whole VMEM tiles and the hsweeps consume it directly.
# ----------------------------------------------------------------------

K1_ROWS = 64  # output rows per band (small inputs; see _k1_rows)
# Output columns per grid step. Must be 128: HBM slices feeding the window
# DMAs need 128-aligned lane offsets/lengths (Mosaic tiled-memref rule),
# and chunk starts advance in K1_XC steps.
K1_XC = 128


def _k1_rows(h: int) -> int:
    """Taller K1 bands amortize window DMAs and ring warm-up (~128 rows
    measured -1.2 ms on the 1080p headline); but the band height also sets
    Hp = round_up(h, rows), and EVERY downstream kernel, transpose and the
    WTA tail pays for the pad rows (128-row bands put 1080p at Hp=1152,
    6.7% waste). Pick the multiple-of-8 height near 128 that minimizes
    padding — at 1080 that is 120 (Hp=1080, zero pad). Small inputs keep
    64 so the padded output stays small."""
    if h < 512:
        return K1_ROWS
    best = None
    for b in range(144, 88, -8):
        hp = _round_up(h, b)
        if best is None or hp < best[0]:
            best = (hp, b)
    return best[1]


def _cost_kernel(*refs, nwin, d_real, dp, min_disp, block_size, w, rows,
                 rows_al, xc, s_base, h, c_pad_val, census):
    """Grid (row-bands, x-chunks). Per chunk, nwin small windows are DMA'd
    from HBM at dynamic offsets; every in-window access is then a *static*
    lane slice. For each output column x the (rows, Dp) cost tile is built
    from one lane slice per right-image slab — the right slabs are stored
    x-REVERSED so the D axis of C(x, y, d) = f(right[x - min_disp - d]) is
    a contiguous, ascending lane range. A running sum over a ring of
    block_size y-summed tiles turns the SAD x-window into one add + one
    subtract per column.

    Pixel cost: BT (3 prefilter slabs per side, f32) or census Hamming
    (1 packed int32 census slab per side, XOR + VPU popcount)."""
    r = block_size // 2
    i = pl.program_id(0)
    j = pl.program_id(1)
    nx = pl.num_programs(1)
    x0 = j * xc

    # Window DMAs, double-buffered across chunks: slot = parity of the
    # global step; the NEXT chunk's windows start before this chunk's
    # compute, so the copies overlap the ring computation. Left windows
    # cover x in [x0 - r, ...) at lane offset x0 (the slabs carry r
    # columns of left edge-padding); right windows cover every lane slice
    # any column in the chunk needs. All offsets/lengths are 128-aligned
    # by construction (xc = 128, aligned scratch widths); multiple_of
    # communicates what Mosaic cannot prove about s_base - j*xc.
    hbms = refs[:nwin]
    out_ref = refs[nwin]
    wins = refs[nwin + 1: 2 * nwin + 1]
    sems = refs[2 * nwin + 1]
    nl = nwin // 2  # left slabs come first

    def dma(slot, bi, bx0, k):
        start = bx0 if k < nl else s_base - bx0
        start = pl.multiple_of(start, LANE)
        vmem = wins[k]
        return pltpu.make_async_copy(
            hbms[k].at[pl.ds(bi * rows, rows_al),
                       pl.ds(start, vmem.shape[2])],
            vmem.at[slot],
            sems.at[slot * nwin + k],
        )

    t = i * nx + j
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for k in range(nwin):
            dma(0, i, x0, k).start()

    # Prefetch the next grid step's windows (wrapping to the next band).
    last_chunk = j == nx - 1
    ni = jnp.where(last_chunk, i + 1, i)
    nx0 = jnp.where(last_chunk, 0, x0 + xc)

    @pl.when(t + 1 < pl.num_programs(0) * nx)
    def _():
        for k in range(nwin):
            dma(1 - slot, ni, nx0, k).start()

    for k in range(nwin):
        dma(slot, i, x0, k).wait()

    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, dp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, dp), 1)
    live_row = (i * rows + sub) < h
    pad_lane = lane >= d_real

    if census:
        cw, vw_c = wins

        def pc_tile(dx):
            """(rows_al, dp) census Hamming cost for column x0 + dx."""
            o = (xc - 1 + r) - dx
            v = vw_c[slot, :, o: o + dp]
            ul = cw[slot, :, dx + r: dx + r + 1]
            x = jax.lax.bitwise_xor(v, ul)
            # 24-bit popcount, shift/add only (no int multiply — Mosaic
            # lowers vector int32 multiplies poorly).
            x = x - ((x >> 1) & 0x55555555)
            x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
            x = (x + (x >> 4)) & 0x0F0F0F0F
            x = x + (x >> 8)
            x = (x + (x >> 16)) & 0x3F
            return x.astype(jnp.float32)
    else:
        uw, u0w, u1w, vw, v0w, v1w = wins

        def pc_tile(dx):
            """(rows_al, dp) BT pixel cost for column x0 + dx (dx static)."""
            # Right-slab lane slice: ascending d = ascending reversed-x.
            o = (xc - 1 + r) - dx
            v = vw[slot, :, o: o + dp]
            v0 = v0w[slot, :, o: o + dp]
            v1 = v1w[slot, :, o: o + dp]
            # Left values at x are scalars per row: single-lane broadcasts.
            ul = uw[slot, :, dx + r: dx + r + 1]
            u0l = u0w[slot, :, dx + r: dx + r + 1]
            u1l = u1w[slot, :, dx + r: dx + r + 1]
            c0 = jnp.maximum(jnp.maximum(ul - v1, v0 - ul), 0.0)
            c1 = jnp.maximum(jnp.maximum(v - u1l, u0l - v), 0.0)
            return jnp.minimum(c0, c1)

    def ybox(tile):
        acc = tile[0:rows, :]
        for k2 in range(1, block_size):
            acc = acc + tile[k2: k2 + rows, :]
        return acc

    # Ring warm-up: tiles for taps x0 - r .. x0 + r - 1; each loop step
    # adds the tap at x0 + k + r so the ring holds exactly the bs taps of
    # output column x0 + k. The window sum is RUNNING (one add + one sub
    # per column instead of bs - 1 adds): BT costs are small integers in
    # f32, so the running add/sub stays exact (< 2^24).
    #
    # Edge clamping: OpenCV replicates the last real cost column for SAD
    # taps at x > w-1. Taps arrive in ascending column order, so the tile
    # computed at tx == w-1 is saved and substituted for every later tap
    # — two selects per column, which is what lets the kernel cover the
    # last r real columns exactly (the round-4 version patched them with
    # an XLA strip recompute whose .at[].set() forced a full-volume copy,
    # measured 1.7 ms at 1080p).
    saved = jnp.zeros((rows, dp), jnp.float32)

    def clamp_tap(dx, saved):
        t = ybox(pc_tile(dx))
        tx = x0 + dx
        t = jnp.where(tx > w - 1, saved, t)
        saved = jnp.where(tx == w - 1, t, saved)
        return t, saved

    ring = []
    racc = None
    for k in range(2 * r):
        t, saved = clamp_tap(k - r, saved)
        ring.append(t)
        racc = t if racc is None else racc + t
    for k in range(xc):
        new, saved = clamp_tap(k + r, saved)
        ring.append(new)
        racc = new if racc is None else racc + new
        acc = racc.astype(jnp.int32)
        live = live_row & (x0 + k < w)
        acc = jnp.where(live, acc, 0)
        acc = jnp.where(pad_lane, c_pad_val, acc)
        out_ref[k] = acc.astype(jnp.int16)
        old = ring.pop(0)
        racc = None if len(ring) == 0 else racc - old


def bt_cost_volume_pallas(left, right, cfg):
    """(H, W) grayscale pair -> int16 cost volume in BOTH layouts:
    (x-major (Wp, Hp, Dp), row-major (Hp, Wp, Dp)). The kernel writes
    x-major only; the row-major twin is an XLA swapaxes (a strided-DMA
    copy — A/B-tested equal to emitting it in-kernel, with ~2x faster
    compiles and no Dp=256 VMEM blowup).

    Prefilter + BT + SAD per costs.bt_cost_volume semantics (OpenCV
    calcPixelCostBT, stereo_core.py:63-75). Hp/Wp/Dp rounded up to
    band/lane multiples; pad semantics in the module docstring. Padding is
    applied to the *prefiltered* images (edge replication), never to the
    raw images: replicating a raw row would change its Sobel response.

    OpenCV replicates the cost row's last real column for SAD taps at
    x > w-1; the kernel's clamp_tap handles this in-band (the saved w-1
    tile substitutes for any later tap), so no XLA patch pass runs."""
    h, w = left.shape
    d_real = cfg.num_disp
    dp = _round_up(d_real, LANE)
    bs = cfg.block_size
    r = bs // 2
    min_disp = cfg.min_disp
    census = cfg.cost == "census"

    k1_rows = _k1_rows(h)
    hp = _round_up(h, k1_rows)
    wp = _round_up(w, LANE)
    _, c_pad_val = _cost_bounds(cfg)

    if census:
        # Packed radius-2 census words (24 bits, int32), computed in XLA
        # on the raw images (cheap shifted compares); the kernel's pixel
        # cost is XOR + popcount on these slabs. Edge-padding the census
        # MAP below reproduces census_cost_volume's cost-volume edge
        # replication exactly: the replicated row/column's pixel cost is
        # the XOR of the replicated words.
        lefts = [xcosts._census_transform(left, 2)]
        rights = [xcosts._census_transform(right, 2)]
        win_dtype = jnp.int32
    else:
        pl_img = xcosts.xsobel_prefilter(left, cfg.prefilter_cap)
        pr_img = xcosts.xsobel_prefilter(right, cfg.prefilter_cap)
        u0, u1 = xcosts._half_sample_envelope(pl_img)
        v0, v1 = xcosts._half_sample_envelope(pr_img)
        lefts = [pl_img, u0, u1]
        rights = [pr_img, v0, v1]
        win_dtype = jnp.float32
    nwin = 2 * len(lefts)

    rows_ext = k1_rows + 2 * r
    rows_al = _round_up(rows_ext, 8)
    uwin_al = _round_up(K1_XC + 2 * r, LANE)
    vwin_al = _round_up(dp + K1_XC + 2 * r, LANE)
    # Left pad of the right slab: at least min_disp + dp + r (clamps every
    # v index any tap can produce to column 0) plus slack for the aligned
    # window length, adjusted so the per-chunk window start
    # s_base - j*K1_XC is a multiple of 128 (Mosaic DMA alignment).
    lpad = min_disp + dp + r + LANE
    lpad += (min_disp - K1_XC - r - lpad) % LANE
    wl_al = wp + uwin_al
    wr_al = _round_up(lpad + wp + r + vwin_al, LANE)
    # Reversed-slab coords: column x's disparity slice sits at in-window
    # offset (K1_XC - 1 + r) - dx of the window starting at s_base - x0.
    s_base = wr_al - lpad + min_disp - K1_XC - r
    assert s_base % LANE == 0

    def prep(x, width_al, left_pad):
        x = jnp.pad(x, ((r, r + (hp - h) + (rows_al - rows_ext)),
                        (left_pad, width_al - x.shape[1] - left_pad)),
                    mode="edge")
        return x

    operands = ([prep(t, wl_al, r) for t in lefts]
                + [prep(t, wr_al, lpad)[:, ::-1] for t in rights])

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec(
        (K1_XC, k1_rows, dp), lambda i, j: (j, i, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _cost_kernel, nwin=nwin, d_real=d_real, dp=dp, min_disp=cfg.min_disp,
        block_size=bs, w=w, rows=k1_rows, rows_al=rows_al, xc=K1_XC,
        s_base=s_base, h=h, c_pad_val=c_pad_val, census=census,
    )
    c_t = pl.pallas_call(
        kernel,
        grid=(hp // k1_rows, wp // K1_XC),
        in_specs=[any_spec] * nwin,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((wp, hp, dp), jnp.int16),
        scratch_shapes=(
            [pltpu.VMEM((2, rows_al, uwin_al), win_dtype)] * (nwin // 2)
            + [pltpu.VMEM((2, rows_al, vwin_al), win_dtype)] * (nwin // 2)
            + [pltpu.SemaphoreType.DMA((2 * nwin,))]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=INTERPRET,
    )(*operands)

    # Row-major twin for the row sweeps via an XLA transpose (a strided
    # DMA copy; A/B-tested equal to emitting the twin in-kernel, and it
    # compiles ~2x faster with no Dp=256 blowup).
    return c_t, jnp.swapaxes(c_t, 0, 1)


# ----------------------------------------------------------------------
# SGM scan step (shared): int32 math throughout.
# ----------------------------------------------------------------------


def _min_lanes(x):
    """All-lanes minimum broadcast back to every lane, via a log2(D)
    rotate-and-min tree. Mosaic's native cross-lane jnp.min lowering costs
    ~20x more than this tree (measured ~7 ms vs ~0.3 ms per 1080p/128-lane
    volume pass), so every lane reduction in the hot path goes through
    here. Correct for any width: the doubling shifts reach every circular
    offset in [0, 2^ceil(log2 D)), a superset of all D offsets."""
    d = x.shape[-1]
    k = 1
    while k < d:
        x = jnp.minimum(x, pltpu.roll(x, k, x.ndim - 1))
        k *= 2
    return x


def _edge_vectors(n, d, p1):
    """Additive neighbor masks: e_up/e_dn carry P1 plus a _BIG bump on the
    lane whose circular roll wrapped, so min(up + e_up, dn + e_dn) is the
    P1-penalized neighbor term with the out-of-range neighbor excluded —
    one add instead of a where, and the +P1 rides along for free."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, d), 1)
    e_up = jnp.where(lane == d - 1, _BIG + p1, p1)
    e_dn = jnp.where(lane == 0, _BIG + p1, p1)
    return e_up, e_dn


def _sgm_step(l_prev, c, p2, e_up, e_dn):
    """One SGM recurrence step. l_prev, c: (N, D) int32.

    The d+-1 neighbor reads are circular lane rolls; the wrapped lane is
    excluded via the additive _BIG in e_up/e_dn (values stay < 2**22, no
    overflow). min_prev is the rotate-and-min lane tree (_min_lanes);
    Mosaic's native cross-lane jnp.min costs ~20x more."""
    d = l_prev.shape[-1]
    min_prev = _min_lanes(l_prev)
    up = pltpu.roll(l_prev, d - 1, l_prev.ndim - 1) + e_up
    dn = pltpu.roll(l_prev, 1, l_prev.ndim - 1) + e_dn
    best = jnp.minimum(jnp.minimum(l_prev, jnp.minimum(up, dn)),
                       min_prev + p2)
    return c + best - min_prev


# ----------------------------------------------------------------------
# K2: horizontal scans (forward, then backward fused with the accumulate).
# ----------------------------------------------------------------------


def _hscan_kernel(*refs, p1, p2, backward, accumulate, out_dtype, xc):
    if accumulate:
        c_ref, a_ref, out_ref, carry = refs
    else:
        c_ref, out_ref, carry = refs
        a_ref = None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    n, d = c_ref.shape[1], c_ref.shape[2]
    e_up, e_dn = _edge_vectors(n, d, p1)

    # The scan itself: statically unrolled over the block's x positions
    # (the leading, untiled block axis — each read is whole VMEM tiles),
    # each step one full-height (rows, Dp) plane. The carry round-trips
    # VMEM once per block, not once per step.
    l_prev = carry[:]
    order = range(xc - 1, -1, -1) if backward else range(xc)
    for i in order:
        c = c_ref[i].astype(jnp.int32)
        l_prev = _sgm_step(l_prev, c, p2, e_up, e_dn)
        if accumulate:
            o = a_ref[i].astype(jnp.int32) + l_prev
        else:
            o = l_prev
        out_ref[i] = o.astype(out_dtype)
    carry[:] = l_prev


def _hs_rows(h, d, dtypes) -> int:
    """Tallest row-band (divisor of h, multiple of 8) whose double-buffered
    blocks + carry fit the VMEM budget."""
    per_row = sum(2 * HS_XC * d * jnp.dtype(t).itemsize for t in dtypes)
    per_row += d * 4  # carry
    rows = h
    while rows > 8 and (rows * per_row > _VMEM_BUDGET or h % rows):
        rows = _round_up(rows // 2, 8)
    return rows


def hsweep_pallas(cost_t, acc_t, p1, p2, backward, out_dtype=jnp.int16,
                  row_major_out=False):
    """One horizontal SGM sweep over the TRANSPOSED cost volume.

    Operands are x-major: (Wp, Hp, Dp). The scan axis being the leading
    (untiled) block dimension is what makes every per-step access a
    whole-tile read/write; in row-major (Hp, Wp, Dp) each step would be a
    strided sublane gather (measured: ~10x slower and ~20x the compile
    time). With row_major_out the result comes back (Hp, Wp, Dp) via an
    XLA transpose (a strided-DMA copy; A/B-tested equal to emitting the
    transposed layout in-kernel, with ~2x faster compiles).

    acc_t=None: returns L (out_dtype). acc_t given: returns acc_t + L."""
    w, h, d = cost_t.shape
    nchunks = w // HS_XC
    if backward:
        index_map = lambda i, j: (nchunks - 1 - j, i, 0)
    else:
        index_map = lambda i, j: (j, i, 0)

    ins = [cost_t] if acc_t is None else [cost_t, acc_t]
    rows = _hs_rows(h, d, [x.dtype for x in ins] + [out_dtype])
    spec = pl.BlockSpec((HS_XC, rows, d), index_map, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _hscan_kernel, p1=p1, p2=p2, backward=backward,
        accumulate=acc_t is not None, out_dtype=out_dtype, xc=HS_XC,
    )
    out = pl.pallas_call(
        kernel,
        grid=(h // rows, nchunks),
        in_specs=[spec] * len(ins),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((w, h, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 2**20,
        ),
        interpret=INTERPRET,
    )(*ins)
    return jnp.swapaxes(out, 0, 1) if row_major_out else out


# ----------------------------------------------------------------------
# K3 (+K4): full-width row-sequential sweep over any set of downward or
# upward directions; diagonals are sublane shifts of the carry. Optionally
# fuses WTA so the final S volume never reaches HBM.
# ----------------------------------------------------------------------


def _rowsweep_kernel(c_ref, a_ref, out_ref, *scratch, p1, p2, dxs,
                     reverse, rows, out_dtype):
    has_diag = any(dx != 0 for dx in dxs)
    carry = scratch[0]
    shifted = scratch[1] if has_diag else None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    wp, dp = c_ref.shape[1], c_ref.shape[2]
    sub = jax.lax.broadcasted_iota(jnp.int32, (wp, dp), 0)
    e_up, e_dn = _edge_vectors(wp, dp, p1)

    # Rows are a static loop; each row is one full-width (Wp, Dp) step —
    # int16 blocks are sliced directly with static indices (no staging).
    for k in range(rows):
        rr = rows - 1 - k if reverse else k
        for t, dx in enumerate(dxs):
            if dx != 0:
                # Predecessor of (y, x) is (y -/+ 1, x - dx): shift the
                # carry row along W; the vacated edge column restarts the
                # path (zero carry == fresh start, as in ops/sgm).
                # pltpu.roll is circular (and needs shift >= 0), so mask
                # the wrapped column(s). Snapshot before any dir updates.
                prev = pltpu.roll(carry[t, :, :], dx % wp, 0)
                if dx > 0:
                    prev = jnp.where(sub < dx, 0, prev)
                else:
                    prev = jnp.where(sub >= wp + dx, 0, prev)
                shifted[t, :, :] = prev

        c = c_ref[rr, :, :].astype(jnp.int32)
        total = a_ref[rr, :, :].astype(jnp.int32)
        for t, dx in enumerate(dxs):
            prev = carry[t, :, :] if dx == 0 else shifted[t, :, :]
            l_cur = _sgm_step(prev, c, p2, e_up, e_dn)
            carry[t, :, :] = l_cur
            total = total + l_cur
        out_ref[rr, :, :] = total.astype(out_dtype)


RS_CAP = 8  # max rows per K3 band (re-tuned after the WTA-tail change)


def _rs_rows(h, w, d, dtypes, ndirs, has_diag, cap=None) -> int:
    """Tallest row-band (divisor of h, <= cap) within the VMEM budget,
    leaving ~24 MB headroom for the step/WTA temporaries Mosaic
    materializes. cap=8 held for the WTA pass too after round-3 tuning
    (an earlier, larger-bodied WTA variant broke Mosaic at 8 rows; the
    packed-tree version compiles and is faster at 8)."""
    if cap is None:
        cap = RS_CAP
    fixed = ndirs * w * d * 4 * (2 if has_diag else 1)
    per_row = sum(2 * w * d * jnp.dtype(t).itemsize for t in dtypes)
    rows = cap
    while rows > 1 and (fixed + rows * per_row > _VMEM_BUDGET - 24 * 2**20
                        or h % rows):
        rows //= 2
    return rows


def rowsweep_pallas(cost, acc, cfg, dxs: Sequence[int], reverse: bool,
                    wta: bool = False, out_dtype=jnp.int16):
    """acc + sum of row-direction sweeps; dy = +1 (or -1 with reverse).

    dxs lists the column offsets of the propagation directions, e.g.
    [0] = vertical, [0, 1, -1] = vertical + both diagonals. Returns the
    accumulated volume; the WTA itself runs as an XLA tail in
    sgm_disparity (XLA's minor-dim reduces beat an in-kernel
    rotate-tree argmin ~2x, measured on-chip). `wta` is retained for
    signature compatibility and must be False."""
    assert not wta, "fused WTA was removed; use the XLA tail (ops/wta)"
    h, w, d = cost.shape
    has_diag = any(dx != 0 for dx in dxs)
    dtypes = [cost.dtype, acc.dtype, out_dtype]
    rows = _rs_rows(h, w, d, dtypes, len(dxs), has_diag)
    nbands = h // rows

    if reverse:
        index_map = lambda i: (nbands - 1 - i, 0, 0)
    else:
        index_map = lambda i: (i, 0, 0)
    vol_spec = pl.BlockSpec((rows, w, d), index_map, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _rowsweep_kernel, p1=cfg.p1, p2=cfg.p2, dxs=tuple(dxs),
        reverse=reverse, rows=rows, out_dtype=out_dtype,
    )
    scratch = [
        pltpu.VMEM((len(dxs), w, d), jnp.int32),  # carries
    ]
    if has_diag:
        scratch.append(pltpu.VMEM((len(dxs), w, d), jnp.int32))
    return pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=[vol_spec, vol_spec],
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct((h, w, d), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 2**20,
        ),
        interpret=INTERPRET,
    )(cost, acc)


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
    # K1 emits the volume x-major for the horizontal sweeps; the row-major
    # twin the row sweeps read is an XLA swapaxes (strided-DMA copy,
    # measured ~1.6 ms at 1080p/128d), as is K2's row_major_out.
    c_t, c = bt_cost_volume_pallas(
        left.astype(jnp.float32), right.astype(jnp.float32), cfg
    )

    p1, p2 = cfg.p1, cfg.p2
    lw_t = hsweep_pallas(c_t, None, p1, p2, backward=False,
                         out_dtype=jnp.int16)
    swe = hsweep_pallas(c_t, lw_t, p1, p2, backward=True, out_dtype=acc_dt,
                        row_major_out=True)

    # Final sweep materializes the aggregated volume S and the WTA runs as
    # an XLA tail: XLA's minor-dim reduces beat the in-kernel rotate-tree
    # argmin measured head-to-head (min+argmin 2.8 ms vs 6.6 ms per 1080p
    # frame; whole tail incl. LR 15.2 ms vs 20.5 ms fused), and the extra
    # S write costs ~0.7 ms. S is int16 only when the real-lane full-sum
    # bound num_paths * (Cmax + P2) fits (_final_dtype) — wider configs
    # (e.g. block_size=7 'hh') store int32 to avoid silent wraparound.
    final_dt = _final_dtype(cfg)
    paths = cfg.num_paths
    if paths == 3:
        s = rowsweep_pallas(c, swe, cfg, [0], False, False,
                            out_dtype=final_dt)
    elif paths == 4:
        s3 = rowsweep_pallas(c, swe, cfg, [0], False, False, out_dtype=acc_dt)
        s = rowsweep_pallas(c, s3, cfg, [0], True, False,
                            out_dtype=final_dt)
    elif paths == 5:
        s = rowsweep_pallas(c, swe, cfg, [0, 1, -1], False, False,
                            out_dtype=final_dt)
    else:  # 8
        s5 = rowsweep_pallas(c, swe, cfg, [0, 1, -1], False, False,
                             out_dtype=acc_dt)
        s = rowsweep_pallas(c, s5, cfg, [0, -1, 1], True, False,
                            out_dtype=final_dt)

    from .wta import wta_disparity

    # The tail runs on the PADDED volume (pad lanes masked by a fused
    # iota compare, pad rows/cols cropped from the final map) — slicing
    # S first would materialize a half-GB copy (measured 1.7 ms at
    # 1080p/128d on v5e).
    return wta_disparity(s, cfg.min_disp, cfg.uniqueness_ratio,
                         cfg.disp12_max_diff, num_disp=cfg.num_disp,
                         crop=(h, w))
