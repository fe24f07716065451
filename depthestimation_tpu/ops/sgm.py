"""Semi-global matching path aggregation (pure JAX / XLA version).

TPU-native replacement for the aggregation half of cv2.StereoSGBM
(reference stereo_core.py:63-75; OpenCV computeDisparitySGBM). Per path
direction r the recurrence is

    L_r(p, d) = C(p, d) + min( L_r(p-r, d),
                               L_r(p-r, d-1) + P1,
                               L_r(p-r, d+1) + P1,
                               min_d' L_r(p-r, d') + P2 ) - min_d' L_r(p-r, d')

with P1 = 8*bs^2, P2 = 32*bs^2 (stereo_core.py:51-52). The recurrence is
sequential along the path but parallel across the perpendicular axis and
across disparities — each scan step is a full (rows x D) or (cols x D) VPU
plane, which is how this maps efficiently onto TPU.

Path topologies (reference modes at stereo_core.py:55-61 map to path counts
in config._MODE_TO_PATHS):
  3-way: L->R, R->L, T->B                       ('sgbm_3way')
  4:     + B->T                                  ('hh4')
  5:     + TL->BR                                ('sgbm')
  8:     + BR->TL, TR->BL, BL->TR                ('hh')

A Pallas-optimized implementation of the same math lives in
ops/pallas_sgm.py; this module is the semantics reference and the CPU/test
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["aggregate", "sgm_directions"]

# (dy, dx) propagation directions for each path count.
_PATHS = {
    1: [(0, 1)],
    2: [(0, 1), (0, -1)],
    3: [(0, 1), (0, -1), (1, 0)],
    4: [(0, 1), (0, -1), (1, 0), (-1, 0)],
    5: [(0, 1), (0, -1), (1, 0), (1, 1), (1, -1)],
    8: [
        (0, 1),
        (0, -1),
        (1, 0),
        (-1, 0),
        (1, 1),
        (-1, -1),
        (1, -1),
        (-1, 1),
    ],
}


def sgm_directions(num_paths: int):
    return _PATHS[num_paths]


def _scan_step(p1: float, p2: float):
    big = jnp.float32(1e9)

    def step(l_prev, c):
        # l_prev, c: (N, D)
        min_prev = jnp.min(l_prev, axis=-1, keepdims=True)
        up = jnp.concatenate(
            [l_prev[..., 1:], jnp.full_like(l_prev[..., :1], big)], axis=-1
        )
        dn = jnp.concatenate(
            [jnp.full_like(l_prev[..., :1], big), l_prev[..., :-1]], axis=-1
        )
        best = jnp.minimum(
            jnp.minimum(l_prev, jnp.minimum(up, dn) + p1), min_prev + p2
        )
        l_cur = c + best - min_prev
        return l_cur, l_cur

    return step


def _shift_cols(x: jax.Array, dx: int) -> jax.Array:
    """Shift the column axis of an (N_cols, D) carry by dx, zero-filling the
    vacated edge (a zero carry row acts as 'no predecessor': L = C)."""
    if dx == 0:
        return x
    if dx > 0:
        return jnp.concatenate([jnp.zeros_like(x[:dx]), x[:-dx]], axis=0)
    return jnp.concatenate([x[-dx:], jnp.zeros_like(x[:-dx])], axis=0)


def _aggregate_dir(cost: jax.Array, dy: int, dx: int, p1: float, p2: float):
    """Aggregate one direction over cost (H, W, D) -> L (H, W, D)."""
    step = _scan_step(p1, p2)

    if dy == 0:
        # Horizontal: scan over W; carry is (H, D).
        seq = jnp.swapaxes(cost, 0, 1)  # (W, H, D)
        init = jnp.zeros_like(seq[0])
        _, out = jax.lax.scan(step, init, seq, reverse=(dx < 0))
        return jnp.swapaxes(out, 0, 1)

    # Vertical / diagonal: scan over H; carry is (W, D), shifted by dx per
    # row step for diagonals (predecessor of (y, x) is (y-dy, x-dx)).
    def row_step(l_prev, c_row):
        # Predecessor of (y, x) is (y-dy, x-dx); the carry already holds row
        # y-dy (reverse scan handles dy<0), so shift columns by dx.
        return step(_shift_cols(l_prev, dx), c_row)

    init = jnp.zeros_like(cost[0])
    _, out = jax.lax.scan(row_step, init, cost, reverse=(dy < 0))
    return out


def aggregate(cost: jax.Array, p1: float, p2: float, num_paths: int = 4) -> jax.Array:
    """Sum of per-direction aggregated costs S = sum_r L_r, (H, W, D) f32."""
    cost = cost.astype(jnp.float32)
    s = jnp.zeros_like(cost)
    for dy, dx in _PATHS[num_paths]:
        s = s + _aggregate_dir(cost, dy, dx, float(p1), float(p2))
    return s
