"""Tile-parallel seam-accuracy sweep (VERDICT r2 item 5).

Shards a synthetic 1080p-class scene's rows over an 8-device CPU mesh via
parallel.shard.tile_sharded_disparity and measures, per halo width, how
far the tiled disparity diverges from the monolithic matcher:

- mismatch_pct: fraction of pixels whose disparity differs by > 1/16 px
  (one subpixel step) between tiled and monolithic, over the whole image;
- seam_pct: the same restricted to +-8 rows around each internal seam;
- with the reference-default in-matcher speckle filter on, the same
  metrics (speckle components are labeled per tile, the one stage where
  tiling is not exactly the monolithic computation).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/halo_sweep.py [H W D]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from depthestimation_tpu.config import SGMConfig
from depthestimation_tpu.io.synthetic import synthesize_stereo_pair
from depthestimation_tpu.parallel import shard as pshard
from depthestimation_tpu.parallel.mesh import make_mesh
from depthestimation_tpu.pipeline import raw_disparity


def seam_metrics(tiled, mono, n_tiles, band=8):
    h = mono.shape[0]
    diff = np.abs(np.asarray(tiled) - np.asarray(mono)) > (1.0 / 16 + 1e-6)
    rows = []
    for i in range(1, n_tiles):
        s = i * (h // n_tiles)
        rows.extend(range(max(s - band, 0), min(s + band, h)))
    seam = diff[sorted(set(rows))]
    return 100.0 * diff.mean(), 100.0 * seam.mean()


def main():
    h, w, d = 1080, 1920, 128
    if len(sys.argv) > 3:
        h, w, d = map(int, sys.argv[1:4])
    n_tiles = 8
    h -= h % n_tiles

    left, right, _ = synthesize_stereo_pair(w, h, min(d, 64), seed=0)
    gl = jnp.asarray(left[..., 0], jnp.float32)
    gr = jnp.asarray(right[..., 0], jnp.float32)

    mesh = make_mesh((1, n_tiles, 1))
    results = {}
    for speckle in (0, 50):
        cfg = SGMConfig(num_disp=d, sgbm_mode="hh4", use_pallas=False,
                        speckle_window_size=speckle)
        t0 = time.time()
        mono = jax.jit(lambda a, b: raw_disparity(a, b, cfg))(gl, gr)
        mono.block_until_ready()
        print(f"[speckle={speckle}] monolithic done in {time.time()-t0:.0f}s",
              flush=True)
        for halo in (16, 32, 64, 128):
            fn = jax.jit(pshard.tile_sharded_disparity(mesh, cfg, halo=halo))
            t0 = time.time()
            tiled = fn(gl, gr)
            tiled.block_until_ready()
            tot, seam = seam_metrics(tiled, mono, n_tiles)
            results[(speckle, halo)] = (tot, seam)
            print(f"[speckle={speckle}] halo={halo:4d}: mismatch "
                  f"{tot:.4f}% total, {seam:.4f}% at seams "
                  f"({time.time()-t0:.0f}s)", flush=True)

    print("\n| speckle | halo | mismatch total % | mismatch at seams % |")
    print("|---|---|---|---|")
    for (speckle, halo), (tot, seam) in sorted(results.items()):
        print(f"| {speckle} | {halo} | {tot:.4f} | {seam:.4f} |")


if __name__ == "__main__":
    main()
