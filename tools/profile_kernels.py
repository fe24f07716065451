"""Per-kernel wall-time profile of the Pallas matcher on the real chip.

Times each stage of the hh4 pipeline at 1080p/128d with hard device->host
syncs (see profiling.hard_sync — softer barriers return early on this
stack). Run: python tools/profile_kernels.py [H W D mode]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from depthestimation_tpu.config import SGMConfig
from depthestimation_tpu.ops import pallas_sgm as P
from depthestimation_tpu.profiling import hard_sync
from bench import make_pair


def bench_fn(name, fn, *args, n=20):
    """Time n dispatches + one hard sync, minus separately measured
    device->host transfer time (large volume outputs would otherwise swamp
    the kernel time with tunnel transfer)."""
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = hard_sync(f(*args))
    compile_s = time.perf_counter() - t0
    # Transfer-only time for this output.
    t0 = time.perf_counter()
    hard_sync(out)
    t_xfer = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    hard_sync(out)
    ms = 1000 * (time.perf_counter() - t0 - t_xfer) / n
    print(f"{name:28s} {ms:9.2f} ms   (compile {compile_s:6.1f}s, "
          f"xfer {1000 * t_xfer:7.1f} ms)", flush=True)
    return out, ms


def main():
    argv = sys.argv[1:]
    H = int(argv[0]) if len(argv) > 0 else 1080
    W = int(argv[1]) if len(argv) > 1 else 1920
    D = int(argv[2]) if len(argv) > 2 else 128
    mode = argv[3] if len(argv) > 3 else "hh4"
    cfg = SGMConfig(num_disp=D, sgbm_mode=mode, speckle_window_size=0,
                    wls_filter=True)
    print(f"profile {H}x{W} D={D} mode={mode} "
          f"p1={cfg.p1} p2={cfg.p2}", flush=True)

    l_np, r_np = make_pair(H, W)
    left, right = jnp.asarray(l_np), jnp.asarray(r_np)

    total = 0.0
    c, ms = bench_fn(
        "K1 cost volume",
        lambda l, r: P.bt_cost_volume_pallas(l, r, cfg), left, right)
    total += ms
    acc_dt = P._acc_dtype(cfg)
    lw, ms = bench_fn(
        "K2 hsweep fwd",
        lambda c: P.hsweep_pallas(c, None, cfg.p1, cfg.p2, backward=False,
                                  out_dtype=jnp.int16), c)
    total += ms
    swe, ms = bench_fn(
        "K2 hsweep bwd+acc",
        lambda c, lw: P.hsweep_pallas(c, lw, cfg.p1, cfg.p2, backward=True,
                                      out_dtype=acc_dt), c, lw)
    total += ms
    s3, ms = bench_fn(
        "K3 rowsweep down",
        lambda c, swe: P.rowsweep_pallas(c, swe, cfg, [0], False, False,
                                         out_dtype=acc_dt), c, swe)
    total += ms
    _, ms = bench_fn(
        "K3 rowsweep up + WTA",
        lambda c, s3: P.rowsweep_pallas(c, s3, cfg, [0], True, True), c, s3)
    total += ms
    print(f"{'sum of kernels':28s} {total:9.2f} ms", flush=True)

    _, ms = bench_fn(
        "full sgm_disparity",
        lambda l, r: P.sgm_disparity(l, r, cfg), left, right)

    from depthestimation_tpu.pipeline import stereo_depth_fn
    _, ms = bench_fn(
        "end-to-end stereo_depth_fn",
        lambda l, r: stereo_depth_fn(l, r, cfg, 1.0, True)[0], left, right)


if __name__ == "__main__":
    main()
