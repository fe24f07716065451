"""Single stereo pair -> disparity + depth on TPU.

Workload: the Middlebury-style pair the reference demos use (2964x1988,
ndisp 280, processed at 0.5 downscale). Calibration can come from a
Middlebury calib.txt (parsed, not hand-copied) or from the CLI flags.

    python example_stereo.py LEFT.png RIGHT.png [--calib calib.txt]
"""

import argparse
import sys
import time

sys.path.insert(0, "..")
sys.path.insert(0, ".")

import depthestimation_tpu as det
from depthestimation_tpu.config import parse_calib_file


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("left", nargs="?", default="./assets/stereo_pairs/im0.png")
    p.add_argument("right", nargs="?", default="./assets/stereo_pairs/im1.png")
    p.add_argument("--calib", help="Middlebury calib.txt to parse")
    p.add_argument("--downscale", type=float, default=0.5)
    p.add_argument("--ndisp", type=int, default=280)
    p.add_argument("--focal", type=float, default=3997.684)
    p.add_argument("--baseline-mm", type=float, default=193.001)
    p.add_argument("--doffs", type=float, default=131.111)
    p.add_argument("--mode", default="sgbm_3way",
                   choices=["sgbm", "hh", "sgbm_3way", "hh4"])
    return p.parse_args()


def ensure_inputs(args):
    """When the default asset paths are missing, synthesize the committed
    demo scene (exact ground-truth disparity) and use its calibration, so
    the example runs on a fresh checkout with no external files."""
    import os

    defaults = ("./assets/stereo_pairs/im0.png", "./assets/stereo_pairs/im1.png")
    if (args.left, args.right) != defaults:
        return args
    if not (os.path.exists(args.left) and os.path.exists(args.right)):
        from depthestimation_tpu.io.synthetic import write_demo_assets

        paths = write_demo_assets("./assets")
        print(f"[example] synthesized demo stereo pair under ./assets "
              f"({paths['left']})")
    if args.calib is None and os.path.exists("./assets/calib.txt"):
        args.calib = "./assets/calib.txt"
    return args


def main():
    args = ensure_inputs(parse_args())
    est = det.StereoDepthEstimator(
        left_source=args.left, right_source=args.right,
        downscale_factor=args.downscale,
    )
    if args.calib:
        est.configure_sgbm(**parse_calib_file(args.calib)["sgbm_kwargs"],
                           sgbm_mode=args.mode)
    else:
        est.configure_sgbm(
            num_disp=args.ndisp,
            focal_length=args.focal,
            baseline=args.baseline_mm / 1000.0,
            doffs=args.doffs,
            sgbm_mode=args.mode,
        )

    t0 = time.perf_counter()
    disparity_px, depth_m = est.estimate_depth()
    print(f"pipeline latency: {(time.perf_counter() - t0) * 1e3:.1f} ms "
          f"(first call includes XLA compile)")

    ok = disparity_px > 0
    print(f"disparity: shape {disparity_px.shape}, "
          f"valid {100 * ok.mean():.1f}%, "
          f"range [{disparity_px[ok].min():.2f}, {disparity_px[ok].max():.2f}] px")
    est.visualize_results()


if __name__ == "__main__":
    main()
