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
        s[:H, :W, :D], cfg.min_disp, cfg.uniqueness_ratio,
        cfg.disp12_max_diff), S, n=5)
    total += ms
    _, ms = bench("full matcher", lambda l, r: P.sgm_disparity(l, r, cfg),
                  left, right, n=5)
    print(f"{'SUM OF STAGES':28s} {total:9.2f} ms  ({1000/total:.1f} fps equiv)")


if __name__ == "__main__":
    main()
