"""Live stereo depth demo: capture -> TPU SGM -> display.

Mirrors the reference demo (example_stereo_live.py): two synchronized
video sources, 0.7 downscale, 128 disparities, hole filling, 30 fps
throttle. Sources may be file paths, camera indices, URLs, or any iterable
of frames.
"""

import sys

sys.path.insert(0, "..")
sys.path.insert(0, ".")

from depthestimation_tpu import StereoDepthEstimatorVideo


def main():
    left_src = "./assets/left.mp4"
    right_src = "./assets/right.mp4"

    downscale = 0.7

    ndisp = 128
    focal_length = 679.01
    baseline_mm = 572.5
    doffs = 0

    estimator = StereoDepthEstimatorVideo(
        left_source=left_src,
        right_source=right_src,
        downscale_factor=downscale,
        visualize_live=True,
        target_fps=30,
    )
    estimator.configure_sgbm(
        num_disp=ndisp,
        focal_length=focal_length,
        baseline=baseline_mm / 1000.0,
        doffs=doffs,
        hole_filling=True,
    )

    for depth_m in estimator.estimate_depth():
        # Use depth_m here (e.g., save, analyze, etc.)
        pass


if __name__ == "__main__":
    main()
