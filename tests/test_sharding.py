"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest).

Covers the parallelism axes the reference lacks (SURVEY.md section 2c):
frame DP, row-tile parallelism with ppermute halo exchange, and
disparity-range sharding — all validated against the single-device
pipeline output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.config import SGMConfig
from depthestimation_tpu.parallel import shard as pshard
from depthestimation_tpu.parallel.mesh import make_mesh, auto_mesh_shape
from depthestimation_tpu.pipeline import raw_disparity


def _pair(h, w, d_true=6, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w + d_true)).astype(np.float32)
    base = (base + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 3.0
    return base[:, :w], base[:, d_true:]


def test_auto_mesh_shape():
    assert auto_mesh_shape(1) == (1, 1, 1)
    assert auto_mesh_shape(8) == (2, 4, 1)
    d, t, m = auto_mesh_shape(8)
    assert d * t * m == 8


def test_tile_sharded_matches_single_device():
    cfg = SGMConfig(num_disp=16, sgbm_mode="sgbm_3way", use_pallas=False)
    left, right = _pair(64, 96)
    mesh = make_mesh((1, 4, 1))
    fn = jax.jit(pshard.tile_sharded_disparity(mesh, cfg, halo=16))
    d_sharded = np.asarray(fn(jnp.asarray(left), jnp.asarray(right)))
    d_single = np.asarray(
        jax.jit(lambda l, r: raw_disparity(l, r, cfg))(
            jnp.asarray(left), jnp.asarray(right)
        )
    )
    # Halo-overlap tiling approximates the monolithic vertical scans;
    # everything except a small fraction near tile seams must agree.
    crop = np.s_[:, cfg.num_disp :]
    agree = np.isclose(d_sharded[crop], d_single[crop], atol=1 / 16.0)
    assert agree.mean() > 0.98, agree.mean()


def test_batch_pipeline_dp():
    cfg = SGMConfig(num_disp=16, sgbm_mode="sgbm_3way",
                    focal_length=100.0, baseline=0.1, use_pallas=False)
    mesh = make_mesh((4, 2, 1))
    l0, r0 = _pair(64, 64, seed=1)
    l1, r1 = _pair(64, 64, seed=2)
    lb = jnp.asarray(np.stack([l0, l1, l0, l1]))
    rb = jnp.asarray(np.stack([r0, r1, r0, r1]))
    run = pshard.batch_pipeline(mesh, cfg, fast_mode=True, halo=8)
    disp, depth = run(lb, rb)
    disp = np.asarray(disp)
    assert disp.shape == (4, 64, 64 - 16)
    assert np.asarray(depth).shape == disp.shape
    # DP determinism: identical frames -> identical outputs.
    np.testing.assert_array_equal(disp[0], disp[2])
    np.testing.assert_array_equal(disp[1], disp[3])


def test_disp_sharded_blockmatch_matches_unsharded():
    cfg = SGMConfig(num_disp=16, sgbm_mode="sgbm_3way", use_pallas=False)
    left, right = _pair(48, 64, d_true=6, seed=3)
    mesh = make_mesh((1, 1, 4), axis_names=("data", "tile", "model"))
    fn = jax.jit(pshard.disp_sharded_blockmatch(mesh, cfg, axis="model"))
    d = np.asarray(fn(jnp.asarray(left), jnp.asarray(right)))
    # Unsharded block-match WTA (argmin over full cost volume).
    from depthestimation_tpu.ops import costs

    c = costs.bt_cost_volume(
        jnp.asarray(left), jnp.asarray(right), cfg.num_disp, cfg.min_disp,
        cfg.block_size, cfg.prefilter_cap,
    )
    d_ref = np.asarray(jnp.argmin(c, axis=-1) + cfg.min_disp).astype(np.float32)
    crop = np.s_[4:-4, cfg.num_disp + 4 : -4]
    assert (d[crop] == d_ref[crop]).mean() > 0.99


@pytest.mark.parametrize("mode", ["sgbm_3way", "hh"])
def test_disp_sharded_sgm_exact(mode):
    """Full SGM + WTA + LR with the disparity axis sharded over 4 devices
    must be BIT-IDENTICAL to the single-device matcher (the lane-coupled
    recurrence terms go through pmin/ppermute — VERDICT round-1 item 10)."""
    from depthestimation_tpu.ops import sgm, wta

    cfg = SGMConfig(num_disp=32, sgbm_mode=mode, use_pallas=False,
                    speckle_window_size=0)
    left, right = _pair(32, 80, d_true=6, seed=4)
    mesh = make_mesh((1, 1, 4), axis_names=("data", "tile", "model"))
    fn = jax.jit(pshard.disp_sharded_sgm(mesh, cfg, axis="model"))
    d = np.asarray(fn(jnp.asarray(left), jnp.asarray(right)))

    from depthestimation_tpu.ops import costs

    c = costs.bt_cost_volume(
        jnp.asarray(left), jnp.asarray(right), cfg.num_disp, cfg.min_disp,
        cfg.block_size, cfg.prefilter_cap,
    )
    d_ref = np.asarray(
        wta.wta_disparity(
            sgm.aggregate(c, cfg.p1, cfg.p2, cfg.num_paths),
            cfg.min_disp, cfg.uniqueness_ratio, cfg.disp12_max_diff,
        )
    )
    np.testing.assert_array_equal(d, d_ref)


def test_halo_exchange_rows_roundtrip():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh((1, 4, 1))
    x = jnp.arange(32.0 * 4).reshape(32, 4)

    def f(xl):
        return pshard._halo_exchange_rows(xl, 2, "tile")

    out = shard_map(
        f, mesh=mesh, in_specs=P("tile", None), out_specs=P("tile", None),
        
    )(x)
    out = np.asarray(out)
    # Each tile of 8 rows becomes 12 rows: [prev 2][own 8][next 2].
    assert out.shape == (48, 4)
    tile1 = out[12:24]
    np.testing.assert_array_equal(tile1[:2], np.asarray(x[6:8]))  # prev halo
    np.testing.assert_array_equal(tile1[2:10], np.asarray(x[8:16]))  # own rows
    np.testing.assert_array_equal(tile1[10:], np.asarray(x[16:18]))  # next halo
    # Edge replication at the top tile.
    tile0 = out[:12]
    np.testing.assert_array_equal(tile0[0], np.asarray(x[0]))


def test_tile_seam_error_gate_at_scale():
    """Seam-accuracy gate backing docs/scaling.md: at DEFAULT_HALO the
    tiled matcher must diverge from the monolithic one on < 0.5% of the
    pixels around tile seams (measured 0.0014% at 1080p; this CI-sized
    run uses the same synthetic scene generator at reduced resolution)."""
    from depthestimation_tpu.io.synthetic import synthesize_stereo_pair

    h, w, d = 256, 512, 32
    left, right, _ = synthesize_stereo_pair(w, h, d, seed=2)
    gl = jnp.asarray(left[..., 0], jnp.float32)
    gr = jnp.asarray(right[..., 0], jnp.float32)
    cfg = SGMConfig(num_disp=d, sgbm_mode="hh4", use_pallas=False,
                    speckle_window_size=50)
    n_tiles = 4
    mesh = make_mesh((1, n_tiles, 1))
    tiled = np.asarray(jax.jit(
        pshard.tile_sharded_disparity(mesh, cfg, halo=pshard.DEFAULT_HALO)
    )(gl, gr))
    mono = np.asarray(jax.jit(lambda a, b: raw_disparity(a, b, cfg))(gl, gr))

    diff = np.abs(tiled - mono) > (1 / 16 + 1e-6)
    seam_rows = []
    for i in range(1, n_tiles):
        s = i * (h // n_tiles)
        seam_rows.extend(range(s - 8, s + 8))
    seam_err = diff[seam_rows].mean()
    assert seam_err < 0.005, f"seam mismatch {seam_err:.4%}"
    assert diff.mean() < 0.005, f"total mismatch {diff.mean():.4%}"
