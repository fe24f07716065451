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
    p.add_argument("--downscale", type=float, default=0.7)
    p.add_argument("--frames", type=int, default=60,
                   help="synthetic-stream length when no videos are given")
    p.add_argument("--drop-frames", action="store_true",
                   help="live-camera policy: evict stale frames")
    args = p.parse_args()

    left_src, right_src = args.left, args.right
    num_disp, focal, baseline_mm = 128, 679.01, 572.5
    import os

    if left_src == "./assets/left.mp4" and not os.path.exists(left_src):
        # No committed videos: stream the synthetic moving scene so the
        # demo runs on a fresh checkout with no external files.
        from depthestimation_tpu.io.synthetic import DEMO_CALIB, synthetic_stream

        print("[example] no video files found; streaming a synthetic scene")
        left_src, right_src = synthetic_stream(n_frames=args.frames)
        num_disp = DEMO_CALIB["ndisp"]
        focal = DEMO_CALIB["focal_px"]
        baseline_mm = DEMO_CALIB["baseline_mm"]

    est = StereoDepthEstimatorVideo(
        left_source=left_src,
        right_source=right_src,
        downscale_factor=args.downscale,
        visualize_live=True,
        target_fps=args.fps,
        drop_frames=args.drop_frames,
    )
    est.configure_sgbm(
        num_disp=num_disp,
        focal_length=focal,
        baseline=baseline_mm / 1000.0,
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
