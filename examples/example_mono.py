"""Monocular depth with the JAX ViT+DPT net.

Mirrors the reference demo (example_mono.py). model_path may be a
converted checkpoint directory, an HF Depth-Anything-V2 snapshot (weights
are converted on load), or a size preset ('small'/'base'/'large') for a
randomly initialized architecture.
"""

import sys
import time

sys.path.insert(0, "..")
sys.path.insert(0, ".")

import depthestimation_tpu as det

if __name__ == "__main__":
    import os

    image_path = "./assets/stereo_pairs/im0.png"
    if not os.path.exists(image_path):
        from depthestimation_tpu.io.synthetic import write_demo_assets

        image_path = write_demo_assets("./assets")["left"]
    model_path = "small"  # or a checkpoint / HF snapshot directory

    estimator = det.MonocularDepthEstimator(
        model_path=model_path, device="tpu", downscale_factor=0.5
    )

    start_time = time.time()
    depth_map = estimator.estimate_depth(image_path=image_path)
    latency_ms = (time.time() - start_time) * 1000
    print(f"Depth estimation completed in {latency_ms:.2f} ms")

    estimator.visualize_depth()
