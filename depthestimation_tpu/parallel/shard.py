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
across 'model'; WTA then reduces (min, argmin) over the shard axis with
psum-style collectives. SGM couples all d through min_d', so disp sharding
pairs with the pure block-matching path (num_paths == 0).
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
        disp, depth = jax.vmap(per_frame)(lb, rb)
        if depth is None:
            return disp
        return disp, depth

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec),
        out_specs=(spec, spec) if has_depth else spec,
        
    )

    @jax.jit
    def run(lb, rb):
        out = fn(lb, rb)
        if has_depth:
            return out
        return out, None

    return run
