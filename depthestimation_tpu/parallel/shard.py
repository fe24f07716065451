"""Sharded stereo pipeline: frame DP + spatial tile parallelism with halo
exchange + disparity-range sharding.

The SGM per-direction recurrence L_r(p,d) is a scan along the path; with
rows sharded over the 'tile' axis the vertical/diagonal scans need state
from the neighboring tile. Aggregation influence decays geometrically with
distance (each step re-normalizes by min_d' L), so a halo of H_halo rows
exchanged via collective permute makes the tiled result converge to the
monolithic one; halo rows are computed redundantly and cropped. This is
the ring/blockwise pattern of sequence parallelism applied to scanlines
(SURVEY.md section 5 'long-context analogue').

Disparity-range sharding splits the D axis of the H x W x D cost volume
across 'model'. Two variants: disp_sharded_blockmatch (local WTA + global
argmin over shards) and disp_sharded_sgm — the FULL SGM matcher with the
lane-coupled terms (min_d', d+-1 shard-boundary neighbors, WTA/uniqueness
reductions) carried over pmin/ppermute collectives, bit-identical to the
single-device matcher.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import SGMConfig
from ..ops import costs, sgm, wta
from ..pipeline import postprocess_and_depth, raw_disparity

__all__ = [
    "tile_sharded_disparity",
    "disp_sharded_blockmatch",
    "disp_sharded_sgm",
    "batch_pipeline",
    "DEFAULT_HALO",
]

DEFAULT_HALO = 64  # rows; SGM influence at this distance is < P2/halo ~ negligible


def _halo_exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Append `halo` rows from the next tile and prepend `halo` rows from
    the previous tile (collective permute along the tile ring).

    x: (H_local, W) or (H_local, W, C). Edge tiles receive edge-replicated
    rows (same border behavior as the monolithic pipeline).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x[:halo]  # rows this tile sends upward (they become the
    bot_rows = x[-halo:]  # next tile's top halo) and downward.

    # from_prev[i] = bot_rows of tile i-1 ; from_next[i] = top_rows of i+1
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    # Edge tiles: replicate their own edge rows (ppermute leaves zeros on
    # unreceived shards; replace them).
    first = idx == 0
    last = idx == n - 1
    edge_top = jnp.broadcast_to(x[:1], from_prev.shape)
    edge_bot = jnp.broadcast_to(x[-1:], from_next.shape)
    from_prev = jnp.where(first, edge_top, from_prev)
    from_next = jnp.where(last, edge_bot, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=0)


def tile_sharded_disparity(mesh: Mesh, cfg: SGMConfig, halo: int = DEFAULT_HALO,
                           axis: str = "tile"):
    """Build a function (left, right) -> disparity with rows sharded over
    `axis`. Inputs/outputs are (H, W) global arrays; each tile computes the
    matcher on its rows + halo rows, then crops."""

    def local_fn(left, right):
        left_h = _halo_exchange_rows(left, halo, axis)
        right_h = _halo_exchange_rows(right, halo, axis)
        disp = raw_disparity(left_h, right_h, cfg)
        return disp[halo:-halo]

    in_spec = P(axis, None)
    return shard_map(
        local_fn, mesh=mesh, in_specs=(in_spec, in_spec), out_specs=in_spec,
        # Pallas outputs carry no varying-mesh-axes info; skip vma checks.
        check_vma=False,
    )


def disp_sharded_blockmatch(mesh: Mesh, cfg: SGMConfig, axis: str = "model"):
    """Disparity-range-sharded block matching: each device computes its D/n
    slice of the cost volume, local WTA, then a global argmin over shards
    (pmin on (cost, disparity) pairs).

    Returns a function (left, right) -> integer disparity (no SGM; the
    tensor-parallel analogue for very large disparity ranges, e.g. 4K/512d
    where the full volume exceeds one chip's HBM).
    """
    n = mesh.shape[axis]
    assert cfg.num_disp % n == 0
    d_local = cfg.num_disp // n

    def local_fn(left, right):
        # left/right replicated; each shard builds D/n disparity planes.
        # Shard i covers disparities [min_disp + i*d_local, ...); the
        # shard offset is applied by pre-shifting the right image (the roll
        # wrap lands inside the left band that is cropped downstream).
        shard = jax.lax.axis_index(axis)
        d0 = shard * d_local
        right_shifted = jnp.roll(right, d0, axis=1)
        c = costs.bt_cost_volume(
            left, right_shifted, d_local, cfg.min_disp,
            cfg.block_size, cfg.prefilter_cap,
        )
        local_min = jnp.min(c, axis=-1)
        local_arg = jnp.argmin(c, axis=-1) + d0 + cfg.min_disp

        # Global WTA over the shard axis: min with argmin tie-break.
        all_min = jax.lax.all_gather(local_min, axis)  # (n, H, W)
        all_arg = jax.lax.all_gather(local_arg, axis)
        best = jnp.argmin(all_min, axis=0)
        disp = jnp.take_along_axis(all_arg, best[None], axis=0)[0]
        return disp.astype(jnp.float32)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        # The all_gather+argmin result is replicated over the shard axis,
        # but axis_index-dependent intermediates defeat static inference.
        check_vma=False,
    )


def _shift_right_replicated(right: jax.Array, d0) -> jax.Array:
    """right_shifted[x] = right[max(x - d0, 0)] — the edge-replicated column
    shift that makes a shard's local cost volume BIT-IDENTICAL to lanes
    [d0, d0 + d_local) of the monolithic volume (costs._shift_right_stack
    clamps out-of-image samples to column 0; jnp.roll would wrap instead)."""
    w = right.shape[-1]
    x = jnp.arange(w)
    return right[..., jnp.maximum(x - d0, 0)]


def disp_sharded_sgm(mesh: Mesh, cfg: SGMConfig, axis: str = "model"):
    """Disparity-range-sharded FULL SGM matcher (BASELINE config #5; the
    tensor-parallel axis for volumes too large for one chip's HBM).

    Each device holds D/n lanes of the cost volume and runs the complete
    pipeline — every SGM path direction, WTA with uniqueness + subpixel,
    and the LR consistency check — with the lane-coupled terms going
    through collectives:

      - min_d' L(p-r, d')  ->  local lane min + lax.pmin over the shard axis
      - L(p-r, d -/+ 1) at shard boundaries -> one-lane lax.ppermute with
        the ring edges masked to +inf (global d = 0 / D-1 semantics)
      - WTA min/argmin    ->  packed (cost * D + d) local tree + lax.pmin,
        preserving OpenCV's smallest-d tie-break globally
      - cm/cp/competitor  ->  masked local mins + lax.pmin

    The result is bit-identical to the single-device XLA matcher
    (tests/test_sharding.py::test_disp_sharded_sgm_exact).
    """
    n = mesh.shape[axis]
    assert cfg.num_disp % n == 0, "num_disp must divide the shard axis"
    d_local = cfg.num_disp // n
    d_total = cfg.num_disp
    big = jnp.float32(1e9)
    bigi = jnp.int32(2**20)
    p1, p2 = float(cfg.p1), float(cfg.p2)

    fwd = [(i, i + 1) for i in range(n - 1)]   # shard i -> i+1
    bwd = [(i + 1, i) for i in range(n - 1)]   # shard i+1 -> i

    def sharded_step(l_prev, c):
        """One SGM recurrence step on the local lane slice (N, d_local)."""
        shard = jax.lax.axis_index(axis)
        min_prev = jax.lax.pmin(
            jnp.min(l_prev, axis=-1, keepdims=True), axis
        )
        # d+1 neighbor: local shift; the last lane reads the next shard's
        # first lane (or +inf on the global last lane).
        from_next = jax.lax.ppermute(l_prev[..., :1], axis, bwd)
        from_next = jnp.where(shard == n - 1, big, from_next)
        up = jnp.concatenate([l_prev[..., 1:], from_next], axis=-1)
        # d-1 neighbor symmetric.
        from_prev = jax.lax.ppermute(l_prev[..., -1:], axis, fwd)
        from_prev = jnp.where(shard == 0, big, from_prev)
        dn = jnp.concatenate([from_prev, l_prev[..., :-1]], axis=-1)
        best = jnp.minimum(
            jnp.minimum(l_prev, jnp.minimum(up, dn) + p1), min_prev + p2
        )
        return c + best - min_prev

    def aggregate_dir(cost, dy, dx):
        step = lambda l, c: (sharded_step(l, c),) * 2
        if dy == 0:
            seq = jnp.swapaxes(cost, 0, 1)
            _, out = jax.lax.scan(step, jnp.zeros_like(seq[0]), seq,
                                  reverse=(dx < 0))
            return jnp.swapaxes(out, 0, 1)

        def row_step(l_prev, c_row):
            return step(sgm._shift_cols(l_prev, dx), c_row)

        _, out = jax.lax.scan(row_step, jnp.zeros_like(cost[0]), cost,
                              reverse=(dy < 0))
        return out

    def local_cost(left, right, d0):
        """Lanes [d0, d0 + d_local) of the monolithic BT cost volume:
        prefilter + envelopes run on the TRUE image columns first, then the
        right-side arrays are edge-shifted by the shard offset (shifting
        the raw image would corrupt the Sobel response at the seam)."""
        pl_ = costs.xsobel_prefilter(left, cfg.prefilter_cap)
        pr_ = costs.xsobel_prefilter(right, cfg.prefilter_cap)
        u0, u1 = costs._half_sample_envelope(pl_)
        v0, v1 = costs._half_sample_envelope(pr_)

        def stack(arr):
            return costs._shift_right_stack(
                _shift_right_replicated(arr, d0), cfg.min_disp, d_local
            )

        v, v0s, v1s = stack(pr_), stack(v0), stack(v1)
        u, u0e, u1e = pl_[:, :, None], u0[:, :, None], u1[:, :, None]
        c0 = jnp.maximum(jnp.maximum(u - v1s, v0s - u), 0.0)
        c1 = jnp.maximum(jnp.maximum(v - u1e, u0e - v), 0.0)
        return costs._block_sum(jnp.minimum(c0, c1), cfg.block_size)

    def local_fn(left, right):
        shard = jax.lax.axis_index(axis)
        d0 = shard * d_local
        c = local_cost(left, right, d0).astype(jnp.float32)

        s = jnp.zeros_like(c)
        for dy, dx in sgm.sgm_directions(cfg.num_paths):
            s = s + aggregate_dir(c, dy, dx)

        # ---- WTA over the global D axis (ops/wta semantics) ----
        s_i = jnp.round(s).astype(jnp.int32)
        d_idx = d0 + jax.lax.broadcasted_iota(jnp.int32, s_i.shape, 2)
        pack = s_i * d_total + d_idx
        m = jax.lax.pmin(jnp.min(pack, axis=-1), axis)
        min_s = m // d_total
        dsel = m - min_s * d_total

        def masked_min(mask_vals):
            return jax.lax.pmin(jnp.min(mask_vals, axis=-1), axis)

        cm = masked_min(jnp.where(d_idx == dsel[..., None] - 1, s_i, bigi))
        cp = masked_min(jnp.where(d_idx == dsel[..., None] + 1, s_i, bigi))

        invalid = jnp.zeros(dsel.shape, dtype=bool)
        if cfg.uniqueness_ratio > 0:
            near = jnp.abs(d_idx - dsel[..., None]) <= 1
            competitor = masked_min(jnp.where(near, bigi, s_i))
            invalid = competitor * (100 - cfg.uniqueness_ratio) < min_s * 100

        if cfg.disp12_max_diff >= 0:
            invalid = invalid | wta.lr_invalidate(
                dsel, min_s, ~invalid, cfg.disp12_max_diff, cfg.min_disp,
                num_disp=d_total,
            )

        denom = jnp.maximum(cm + cp - 2 * min_s, 1)
        delta16 = jax.lax.div((cm - cp) * 16 + denom, 2 * denom)
        interior = (dsel > 0) & (dsel < d_total - 1)
        delta16 = jnp.where(interior, delta16, 0)
        disp = ((cfg.min_disp + dsel) * 16 + delta16).astype(jnp.float32) / 16.0
        return jnp.where(invalid, jnp.float32(cfg.min_disp - 1), disp)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        # axis_index-dependent shards defeat static replication inference.
        check_vma=False,
    )


def batch_pipeline(mesh: Mesh, cfg: SGMConfig, downscale_factor: float = 1.0,
                   fast_mode: bool = True, data_axis: str = "data",
                   tile_axis: Optional[str] = "tile",
                   halo: int = DEFAULT_HALO):
    """Full sharded pipeline over a batch of frames (B, H, W):
    B sharded over 'data' (frame DP), rows over 'tile' (halo exchange).

    Returns a jitted function (left_batch, right_batch) -> (disp_batch,
    depth_batch_or_None).
    """
    use_tile = tile_axis is not None and mesh.shape.get(tile_axis, 1) > 1

    def per_frame(left, right):
        if use_tile:
            left_h = _halo_exchange_rows(left, halo, tile_axis)
            right_h = _halo_exchange_rows(right, halo, tile_axis)
            disp = raw_disparity(left_h, right_h, cfg)[halo:-halo]
        else:
            disp = raw_disparity(left, right, cfg)
        return postprocess_and_depth(disp, cfg, downscale_factor, fast_mode)

    row_spec = tile_axis if use_tile else None
    spec = P(data_axis, row_spec, None)
    has_depth = cfg.focal_length is not None and cfg.baseline is not None

    def local_fn(lb, rb):
        # Frames on one device run sequentially (lax.map, traced once):
        # DP parallelism is across devices, and unlike vmap this composes
        # with the Pallas matcher's manual-DMA kernels.
        disp, depth = jax.lax.map(lambda ab: per_frame(*ab), (lb, rb))
        if depth is None:
            return disp
        return disp, depth

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec),
        out_specs=(spec, spec) if has_depth else spec,
        # Pallas outputs carry no varying-mesh-axes info; skip vma checks.
        check_vma=False,
    )

    @jax.jit
    def run(lb, rb):
        out = fn(lb, rb)
        if has_depth:
            return out
        return out, None

    return run
