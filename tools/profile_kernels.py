"""Per-kernel TPU timing of the Pallas SGM pipeline stages (round-3 tool).

Times each stage of the hh4 headline (1080p/128d) separately. The timing
fence is a device-side reduction of a small output slice pulled to host as
a scalar: the scalar depends on the kernel's output, so np.asarray on it
provably waits for the kernel — without dragging a half-gigabyte volume
through the (slow, ~40 MB/s) debug tunnel the chip sits behind.

Run on the real chip: python tools/profile_kernels.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from depthestimation_tpu.config import SGMConfig
from depthestimation_tpu.ops import pallas_sgm as P
from depthestimation_tpu.ops import wta


def _checksum(tree):
    # Full-array reductions: a sliced checksum would let XLA slice-fusion
    # narrow non-Pallas elementwise stages to the sliced pixels.
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def bench(name, fn, *args, n=10):
    """Throughput timing: enqueue n async dispatches, sync once — the
    ~26 ms tunnel round trip amortizes to ~2.6 ms instead of taxing every
    call (JAX dispatch is async; the device runs the calls back-to-back)."""
    def once(*a):
        out = fn(*a)  # single call: Pallas calls are side-effecting and
        return out, _checksum(out)  # would NOT CSE if built twice

    f = jax.jit(once)
    t0 = time.perf_counter()
    out, chk = f(*args)
    np.asarray(chk)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        res = f(*args)
    np.asarray(res[1])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {ms:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return out, ms


def main():
    H, W, D = 1080, 1920, 128
    cfg = SGMConfig(num_disp=D, sgbm_mode="hh4", speckle_window_size=0)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H, W + 32)).astype(np.float32)
    left = jnp.asarray(base[:, :W])
    right = jnp.asarray(base[:, 16 : W + 16])

    total = 0.0
    _, ms = bench("dispatch overhead (x+1)", lambda l, r: l[:8, :8] + 1.0,
                  left, right)
    (ct, c), ms = bench("K1 cost_volume (dual)", lambda l, r:
        P.bt_cost_volume_pallas(l, r, cfg), left, right)
    total += ms
    lw, ms = bench("K2 hsweep fwd (t)", lambda ct: P.hsweep_pallas(
        ct, None, cfg.p1, cfg.p2, backward=False), ct)
    total += ms
    swe, ms = bench("K2 hsweep bwd+acc (rm)", lambda ct, lw: P.hsweep_pallas(
        ct, lw, cfg.p1, cfg.p2, backward=True,
        out_dtype=P._acc_dtype(cfg), row_major_out=True), ct, lw)
    total += ms
    s3, ms = bench("K3 rowsweep down", lambda c, a: P.rowsweep_pallas(
        c, a, cfg, [0], False, False, out_dtype=P._acc_dtype(cfg)), c, swe)
    total += ms
    S, ms = bench("K3 rowsweep up (S out)", lambda c, a: P.rowsweep_pallas(
        c, a, cfg, [0], True, False, out_dtype=jnp.int16), c, s3)
    total += ms
    _, ms = bench("XLA WTA tail (incl LR)", lambda s: wta.wta_disparity(
        s, cfg.min_disp, cfg.uniqueness_ratio, cfg.disp12_max_diff,
        num_disp=D, crop=(H, W)), S, n=5)
    total += ms
    _, ms = bench("full matcher", lambda l, r: P.sgm_disparity(l, r, cfg),
                  left, right, n=5)
    print(f"{'SUM OF STAGES':28s} {total:9.2f} ms  ({1000/total:.1f} fps equiv)")

    # -- WTA tail decomposition (the LR claim/check loops dominate) ------
    print("\n-- WTA tail decomposition --")
    Sr = jax.device_put(S)
    mins = jnp.min(Sr.astype(jnp.int32), axis=-1)
    d0 = jnp.argmin(Sr.astype(jnp.int32), axis=-1).astype(jnp.int32)
    valid = jnp.ones(d0.shape, bool)
    bench("lr_invalidate (packed claim)", lambda d0, ms_, v:
          wta.lr_invalidate(d0, ms_, v, cfg.disp12_max_diff, cfg.min_disp,
                            num_disp=D), d0, mins, valid, n=5)
    bench("tail minus LR", lambda s: wta.wta_disparity(
        s, cfg.min_disp, cfg.uniqueness_ratio, -1, num_disp=D,
        crop=(H, W)), Sr, n=5)

    # -- postprocess stage budget (VERDICT r4 #2) ------------------------
    # The reference-default pipeline adds the in-matcher speckle pass
    # (S=50, stereo_core.py:72-73) plus postprocess_disparity
    # (S=100*downscale, postprocess.py:143-169). Both speckle passes are
    # VPU-bound: ~(4 phases * (S/unroll+2) rounds * ~35 vector ops)/step
    # (round 5 dropped the impurity flood — disagree edges poison the
    # count seeds instead — and hoisted the +1 out of the BFS relax);
    # the algorithm's S-step round count, not the implementation, is the
    # wall.
    print("\n-- postprocess stages (on the cropped disparity map) --")
    from depthestimation_tpu.ops import filters

    rng2 = np.random.default_rng(1)
    dmap = (rng2.integers(0, D * 16, (H, W - D)) / 16.0).astype(np.float32)
    dmap[rng2.random((H, W - D)) < 0.15] = 0.0
    dmap = jnp.asarray(dmap)
    ptot = 0.0
    _, ms = bench("speckle S=50 (in-matcher)", lambda x:
                  filters.filter_speckles(x, -1.0, 50, 1.0), dmap)
    ptot += ms
    _, ms = bench("speckle S=100 (postprocess)", lambda x:
                  filters.filter_speckles(x, 0.0, 100, 1.0), dmap)
    ptot += ms
    _, ms = bench("detect_outliers k=5", lambda x:
                  filters.detect_outliers(x, 2.5, 5), dmap)
    ptot += ms
    _, ms = bench("fill_holes inpaint", lambda x:
                  filters.fill_holes(x, method="inpaint", kernel_size=3),
                  dmap)
    ptot += ms
    _, ms = bench("median3x3", filters.median3x3, dmap)
    ptot += ms
    _, ms = bench("postprocess_disparity fused", lambda x:
                  filters.postprocess_disparity(
                      x, max_speckle_size=100, max_diff=1.0,
                      outlier_threshold=2.5, fill_method="inpaint",
                      apply_outlier_removal=True, apply_hole_filling=True),
                  dmap, n=5)
    print(f"{'SUM OF POST STAGES':28s} {ptot:9.2f} ms "
          "(separate dispatches; the fused pipeline overlaps them)")


if __name__ == "__main__":
    main()
