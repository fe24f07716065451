"""Pallas kernel parity vs the XLA reference (interpret mode on CPU).

The TPU kernels (ops/pallas_sgm.py) must be bit-exact against the XLA
implementations of the same math (ops/costs.py, ops/sgm.py, ops/wta.py)
on integer-valued images.
"""

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


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    h, w, d_true = 24, 384, 5
    base = rng.integers(0, 255, (h, w + d_true)).astype(np.float32)
    return jnp.asarray(base[:, :w]), jnp.asarray(base[:, d_true:])


CFG = SGMConfig(num_disp=128, sgbm_mode="hh4")


def test_cost_volume_exact(pair):
    left, right = pair
    c_ref = np.asarray(
        costs.bt_cost_volume(left, right, CFG.num_disp, 0, CFG.block_size,
                             CFG.prefilter_cap)
    )
    c_pal = np.asarray(pallas_sgm.bt_cost_volume_pallas(left, right, CFG))
    np.testing.assert_array_equal(np.round(c_ref).astype(np.int32), c_pal)


def test_hsweep_exact(pair):
    left, right = pair
    c = np.round(
        np.asarray(
            costs.bt_cost_volume(left, right, CFG.num_disp, 0, CFG.block_size,
                                 CFG.prefilter_cap)
        )
    )
    a_ref = np.asarray(sgm.aggregate(jnp.asarray(c), CFG.p1, CFG.p2, 2))
    a_pal = np.asarray(
        pallas_sgm.hsweep_pallas(jnp.asarray(c.astype(np.int32)), CFG.p1, CFG.p2)
    )
    np.testing.assert_array_equal(a_ref.astype(np.int32), a_pal)


@pytest.mark.parametrize("mode,paths", [("hh4", 4), ("sgbm_3way", 3)])
def test_full_matcher_exact(pair, mode, paths):
    left, right = pair
    cfg = SGMConfig(num_disp=128, sgbm_mode=mode)
    c = np.round(
        np.asarray(
            costs.bt_cost_volume(left, right, cfg.num_disp, 0, cfg.block_size,
                                 cfg.prefilter_cap)
        )
    )
    d_xla = np.asarray(
        wta.wta_disparity(
            sgm.aggregate(jnp.asarray(c), cfg.p1, cfg.p2, paths),
            cfg.min_disp, cfg.uniqueness_ratio, cfg.disp12_max_diff,
        )
    )
    d_pal = np.asarray(pallas_sgm.sgm_disparity(left, right, cfg))
    np.testing.assert_array_equal(d_xla, d_pal)


def test_unsupported_falls_back():
    cfg = SGMConfig(num_disp=48)  # not a multiple of 128
    assert not pallas_sgm.pallas_supported(cfg, (64, 96))
    with pytest.raises(NotImplementedError):
        pallas_sgm.sgm_disparity(jnp.zeros((16, 64)), jnp.zeros((16, 64)), cfg)
