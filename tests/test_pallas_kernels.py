"""Pallas kernel parity vs the XLA reference (interpret mode on CPU).

The TPU kernels (ops/pallas_sgm.py) must be bit-exact against the XLA
implementations of the same math (ops/costs.py, ops/sgm.py, ops/wta.py)
on integer-valued images — including the padded regions' semantics
(zero-cost pad rows/cols, C_pad disparity lanes; see the module docstring).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.config import SGMConfig
from depthestimation_tpu.ops import costs, pallas_sgm, sgm, wta


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pallas_sgm.INTERPRET
    pallas_sgm.INTERPRET = True
    yield
    pallas_sgm.INTERPRET = old


def make_pair(h, w, d_true=5, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w + d_true)).astype(np.float32)
    return jnp.asarray(base[:, :w]), jnp.asarray(base[:, d_true:])


@pytest.fixture(scope="module")
def pair():
    return make_pair(24, 384)


CFG = SGMConfig(num_disp=128, sgbm_mode="hh4", speckle_window_size=0)


def _jit(fn, *args):
    """Run a kernel-under-test through jax.jit: eager interpret-mode
    pallas calls dispatch each interpreter op separately (~100 s per
    call on this 2-CPU box); compiled, the same test runs in seconds."""
    return jax.jit(fn)(*args)


def ref_cost(left, right, cfg):
    return np.round(
        np.asarray(
            costs.bt_cost_volume(left, right, cfg.num_disp, cfg.min_disp,
                                 cfg.block_size, cfg.prefilter_cap)
        )
    ).astype(np.int32)


@pytest.mark.slow
def test_cost_volume_exact(pair):
    left, right = pair
    h, w = left.shape
    c_ref = ref_cost(left, right, CFG)
    # K1 emits the volume in both layouts; they must agree and match the
    # reference.
    c_t, c_rm = _jit(lambda l, r: pallas_sgm.bt_cost_volume_pallas(
        l, r, CFG), left, right)
    c_pal = np.asarray(jnp.swapaxes(c_t, 0, 1)).astype(np.int32)
    assert c_pal.shape == (64, 384, 128)  # h padded to 64
    np.testing.assert_array_equal(c_ref, c_pal[:h, :w, : CFG.num_disp])
    np.testing.assert_array_equal(np.asarray(c_rm).astype(np.int32), c_pal)
    # Pad rows are zero-cost (fresh-start property for the sweeps).
    assert (c_pal[h:, :, : CFG.num_disp] == 0).all()


@pytest.mark.slow
def test_cost_volume_pad_lanes_and_cols():
    """num_disp=48 -> 80 pad lanes at C_pad; w=360 -> 24 zero pad cols."""
    left, right = make_pair(16, 360)
    cfg = SGMConfig(num_disp=48, sgbm_mode="hh4", speckle_window_size=0)
    c_ref = ref_cost(left, right, cfg)
    c_pal = np.asarray(jnp.swapaxes(_jit(
        lambda l, r: pallas_sgm.bt_cost_volume_pallas(l, r, cfg)[0],
        left, right), 0, 1))
    assert c_pal.shape == (64, 384, 128)
    np.testing.assert_array_equal(c_ref, c_pal[:16, :360, :48])
    _, c_pad = pallas_sgm._cost_bounds(cfg)
    assert (c_pal[:16, :360, 48:] == c_pad).all()
    assert (c_pal[:, 360:, :48] == 0).all()


@pytest.mark.slow
def test_hsweep_exact(pair):
    left, right = pair
    c_ref = ref_cost(left, right, CFG)
    a_ref = np.asarray(
        sgm.aggregate(jnp.asarray(c_ref), CFG.p1, CFG.p2, 2)
    ).astype(np.int32)
    def sweep(l, r):
        c_t, _ = pallas_sgm.bt_cost_volume_pallas(l, r, CFG)  # x-major
        lw_t = pallas_sgm.hsweep_pallas(c_t, None, CFG.p1, CFG.p2,
                                        backward=False)
        # Accumulate pass writes row-major directly (in-kernel swapaxes).
        return pallas_sgm.hsweep_pallas(c_t, lw_t, CFG.p1, CFG.p2,
                                        backward=True, row_major_out=True)

    swe = _jit(sweep, left, right)
    h, w = left.shape
    np.testing.assert_array_equal(
        a_ref, np.asarray(swe).astype(np.int32)[:h, :w, : CFG.num_disp]
    )


@pytest.mark.parametrize(
    "mode,num_disp,w",
    [
        # Default tier: one canonical case (the reference's default mode).
        # Interpret-mode pallas costs ~1 min/case on this 2-CPU box, so
        # the other path topologies + full-size + gate-lift cases (VERDICT
        # round 1: Middlebury 144 disp, non-128-aligned widths) run in the
        # slow tier (pytest -m slow).
        ("sgbm_3way", 64, 256),
        pytest.param("hh4", 64, 256, marks=pytest.mark.slow),
        pytest.param("sgbm", 64, 256, marks=pytest.mark.slow),
        pytest.param("hh", 64, 256, marks=pytest.mark.slow),
        pytest.param("hh4", 128, 384, marks=pytest.mark.slow),
        pytest.param("sgbm_3way", 128, 384, marks=pytest.mark.slow),
        pytest.param("sgbm", 128, 384, marks=pytest.mark.slow),
        pytest.param("hh", 128, 384, marks=pytest.mark.slow),
        pytest.param("hh", 144, 360, marks=pytest.mark.slow),
        pytest.param("sgbm", 48, 384, marks=pytest.mark.slow),
    ],
)
def test_full_matcher_exact(mode, num_disp, w):
    left, right = make_pair(24, w, seed=3)
    cfg = SGMConfig(num_disp=num_disp, sgbm_mode=mode, speckle_window_size=0)
    assert pallas_sgm.pallas_supported(cfg, left.shape)
    c = ref_cost(left, right, cfg)
    d_xla = np.asarray(
        wta.wta_disparity(
            sgm.aggregate(jnp.asarray(c), cfg.p1, cfg.p2, cfg.num_paths),
            cfg.min_disp, cfg.uniqueness_ratio, cfg.disp12_max_diff,
        )
    )
    d_pal = np.asarray(_jit(lambda l, r: pallas_sgm.sgm_disparity(
        l, r, cfg), left, right))
    np.testing.assert_array_equal(d_xla, d_pal)


@pytest.mark.slow
def test_min_disp_nonzero():
    left, right = make_pair(16, 384, seed=7)
    cfg = SGMConfig(num_disp=32, min_disp=3, sgbm_mode="sgbm_3way",
                    speckle_window_size=0)
    c = ref_cost(left, right, cfg)
    d_xla = np.asarray(
        wta.wta_disparity(
            sgm.aggregate(jnp.asarray(c), cfg.p1, cfg.p2, cfg.num_paths),
            cfg.min_disp, cfg.uniqueness_ratio, cfg.disp12_max_diff,
        )
    )
    d_pal = np.asarray(_jit(lambda l, r: pallas_sgm.sgm_disparity(
        l, r, cfg), left, right))
    np.testing.assert_array_equal(d_xla, d_pal)


def test_final_sum_int32_when_int16_would_wrap():
    """block_size=7 'hh': 8 paths * (Cmax + P2) = 36 848 > int16 — the
    final S volume must be stored int32 (round-4 regression: it silently
    wrapped in int16 and produced garbage disparities)."""
    cfg = SGMConfig(num_disp=32, sgbm_mode="hh", block_size=7,
                    speckle_window_size=0)
    assert cfg.num_paths * (cfg.block_size ** 2 * 2 * cfg.prefilter_cap
                            + cfg.p2) > 32767
    assert pallas_sgm.pallas_supported(cfg, (12, 160))
    assert pallas_sgm._final_dtype(cfg) == jnp.int32
    left, right = make_pair(12, 160, seed=11)
    c = ref_cost(left, right, cfg)
    d_xla = np.asarray(
        wta.wta_disparity(
            sgm.aggregate(jnp.asarray(c), cfg.p1, cfg.p2, cfg.num_paths),
            cfg.min_disp, cfg.uniqueness_ratio, cfg.disp12_max_diff,
        )
    )
    d_pal = np.asarray(_jit(lambda l, r: pallas_sgm.sgm_disparity(
        l, r, cfg), left, right))
    np.testing.assert_array_equal(d_xla, d_pal)


def test_census_matcher_exact():
    """Census cost inside K1 (VERDICT r4 #5): XOR + VPU popcount on packed
    radius-2 census words, bit-exact vs the XLA census path
    (costs.census_cost_volume) through the full matcher — including the
    edge-replicated window columns the in-kernel clamp_tap covers."""
    left, right = make_pair(16, 256, seed=5)
    cfg = SGMConfig(num_disp=64, cost="census", sgbm_mode="sgbm_3way",
                    speckle_window_size=0)
    assert pallas_sgm.pallas_supported(cfg, left.shape)
    c = np.round(np.asarray(costs.census_cost_volume(
        left, right, cfg.num_disp, cfg.min_disp, cfg.block_size,
    ))).astype(np.int32)
    d_xla = np.asarray(
        wta.wta_disparity(
            sgm.aggregate(jnp.asarray(c), cfg.p1, cfg.p2, cfg.num_paths),
            cfg.min_disp, cfg.uniqueness_ratio, cfg.disp12_max_diff,
        )
    )
    d_pal = np.asarray(_jit(lambda l, r: pallas_sgm.sgm_disparity(
        l, r, cfg), left, right))
    np.testing.assert_array_equal(d_xla, d_pal)


@pytest.mark.slow
def test_census_cost_volume_exact():
    left, right = make_pair(16, 256, seed=6)
    cfg = SGMConfig(num_disp=64, cost="census", sgbm_mode="sgbm_3way",
                    speckle_window_size=0, block_size=5)
    ref = np.round(np.asarray(costs.census_cost_volume(
        left, right, cfg.num_disp, cfg.min_disp, cfg.block_size,
    ))).astype(np.int32)
    c_t, c = _jit(lambda l, r: pallas_sgm.bt_cost_volume_pallas(l, r, cfg),
                  left, right)
    h, w = left.shape
    got = np.asarray(c).astype(np.int32)[:h, :w, : cfg.num_disp]
    np.testing.assert_array_equal(ref, got)


def test_unsupported_falls_back():
    cfg = SGMConfig(num_disp=128, cost="census", block_size=41)
    # block_size 41 puts even the census bound past int16 -> unsupported.
    assert not pallas_sgm.pallas_supported(cfg, (64, 384))
    with pytest.raises(NotImplementedError):
        pallas_sgm.sgm_disparity(jnp.zeros((16, 384)), jnp.zeros((16, 384)),
                                 cfg)
