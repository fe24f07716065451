"""Benchmark: stereo depth throughput at 1080p / 128 disparities per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north star — 30 fps 1080p/128-disp stereo per chip
(the reference publishes no numbers; 30 fps is the driver-defined target,
BASELINE.md).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BASELINE_FPS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from depthestimation_tpu.config import SGMConfig
    from depthestimation_tpu.pipeline import stereo_depth_fn

    H, W, D = 1080, 1920, 128
    rng = np.random.default_rng(0)
    # Correlated texture (realistic matchable content, not pure noise).
    base = rng.integers(0, 255, (H, W + 32)).astype(np.float32)
    base = (base + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 3.0
    left = jnp.asarray(base[:, :W])
    right = jnp.asarray(base[:, 16 : W + 16])

    cfg = SGMConfig(num_disp=D, sgbm_mode="hh4")

    @jax.jit
    def step(l, r):
        disp, _ = stereo_depth_fn(l, r, cfg, 1.0, fast_mode=True)
        return disp

    # Warmup / compile.
    out = step(left, right)
    np.asarray(out)

    n = 10
    t0 = time.time()
    for _ in range(n):
        out = step(left, right)
    np.asarray(out)  # device->host sync
    dt = (time.time() - t0) / n
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "stereo_fps_1080p_128disp_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
