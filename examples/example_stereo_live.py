"""Streaming stereo depth: capture -> TPU SGM -> live view + metrics.

Workload: the reference's video demo geometry (128 disparities at 0.7
downscale). Sources can be files, camera indices, RTSP URLs, or any
iterable of frames; the input pipeline prefetches to device memory and the
facade overlaps frame N+1's dispatch with frame N's readback.

    python example_stereo_live.py LEFT_SRC RIGHT_SRC
"""

import argparse
import sys

sys.path.insert(0, "..")
sys.path.insert(0, ".")

from depthestimation_tpu import StereoDepthEstimatorVideo


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("left", nargs="?", default="./assets/left.mp4")
    p.add_argument("right", nargs="?", default="./assets/right.mp4")
    p.add_argument("--fps", type=int, default=30, help="throttle ceiling")
    p.add_argument("--drop-frames", action="store_true",
                   help="live-camera policy: evict stale frames")
    args = p.parse_args()

    est = StereoDepthEstimatorVideo(
        left_source=args.left,
        right_source=args.right,
        downscale_factor=0.7,
        visualize_live=True,
        target_fps=args.fps,
        drop_frames=args.drop_frames,
    )
    est.configure_sgbm(
        num_disp=128,
        focal_length=679.01,
        baseline=572.5 / 1000.0,
        doffs=0,
        hole_filling=True,
        temporal_alpha=0.4,  # flow-free temporal smoothing for streams
    )

    for i, depth_m in enumerate(est.estimate_depth()):
        if i % 30 == 0:
            print(f"frame {i}: {est.metrics.summary()}")
    print(f"stream done: {est.metrics.summary()}")


if __name__ == "__main__":
    main()
