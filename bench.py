"""Benchmark: stereo depth throughput per chip across the BASELINE configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "configs"}.
The headline metric is the BASELINE.json north-star pipeline — 1080p,
128 disparities, 4-path SGM with left-right consistency + WLS-style
post-filtering — against the driver-defined 30 fps target (the reference
publishes no numbers; BASELINE.md). The "configs" field records the other
reference workloads: fast mode (median-only tail), 8-path 'hh', the full
4-stage postprocess (in-matcher speckle + outlier + fill + median), and
the Middlebury flagship geometry (2964x1988 at 0.5 downscale, 144 disp).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BASELINE_FPS = 30.0


def make_pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w + 32)).astype(np.float32)
    base = (base + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 3.0
    return base[:, :w], base[:, 16 : w + 16]


def measure(cfg, h, w, fast_mode, n=10, timer=None, name=""):
    import jax
    import jax.numpy as jnp

    from depthestimation_tpu.pipeline import stereo_depth_fn

    left_np, right_np = make_pair(h, w)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)

    @jax.jit
    def step(l, r):
        disp, _ = stereo_depth_fn(l, r, cfg, 1.0, fast_mode)
        return disp

    out = step(left, right)  # compile
    np.asarray(out)
    import contextlib

    ctx = timer(name) if timer is not None else contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(left, right)
        np.asarray(out)  # device -> host sync
        dt = (time.perf_counter() - t0) / n
    return 1.0 / dt


def main():
    from depthestimation_tpu.config import SGMConfig
    from depthestimation_tpu.profiling import StageTimer

    timer = StageTimer(sync=False)
    H, W, D = 1080, 1920, 128

    # North star: LR consistency (in-matcher) + WLS-style post-filtering.
    headline = measure(
        SGMConfig(num_disp=D, sgbm_mode="hh4", speckle_window_size=0,
                  wls_filter=True),
        H, W, fast_mode=True, timer=timer, name="northstar")

    configs = {}
    # Fast mode: median-only tail on the 3-way default mode.
    configs["fast_3way_1080p_128d"] = round(measure(
        SGMConfig(num_disp=D, sgbm_mode="sgbm_3way", speckle_window_size=0),
        H, W, fast_mode=True, timer=timer, name="fast3way"), 2)
    # 8-path quality mode.
    configs["hh_8path_1080p_128d"] = round(measure(
        SGMConfig(num_disp=D, sgbm_mode="hh", speckle_window_size=0,
                  wls_filter=True),
        H, W, fast_mode=True, timer=timer, name="hh8"), 2)
    # Reference-default pipeline: in-matcher speckle + full 4-stage
    # postprocess (BASELINE config #3 "with post-filtering").
    configs["full_postprocess_1080p_128d"] = round(measure(
        SGMConfig(num_disp=D, sgbm_mode="hh4", hole_filling=True),
        H, W, fast_mode=False, n=3, timer=timer, name="fullpost"), 2)
    # Middlebury flagship geometry (example_stereo.py at downscale 0.5).
    configs["middlebury_1482x994_144d"] = round(measure(
        SGMConfig(num_disp=144, sgbm_mode="hh4", speckle_window_size=0,
                  wls_filter=True),
        994, 1482, fast_mode=True, n=5, timer=timer, name="middlebury"), 2)

    print(
        json.dumps(
            {
                "metric": "stereo_fps_1080p_128disp_per_chip",
                "value": round(headline, 2),
                "unit": "frames/s",
                "vs_baseline": round(headline / BASELINE_FPS, 3),
                "configs": configs,
                "stage_ms": {k: v["mean_ms"] for k, v in
                             timer.summary().items()},
            }
        )
    )


if __name__ == "__main__":
    main()
