"""Convert a local HuggingFace Depth-Anything-V2 snapshot to the
framework's msgpack checkpoint format — the turnkey offline path for real
pretrained mono weights (reference capability:
MonocularDepthEstimator.py:27-40, which downloads from the Hub at
runtime; this environment has no egress, so conversion is a one-command
offline step on any machine that has the snapshot on disk).

Usage:
    python tools/convert_hf_checkpoint.py <hf_snapshot_dir> <out_dir> \
        [--size small] [--verify]

<hf_snapshot_dir> is a standard HF snapshot (config.json plus
model.safetensors or pytorch_model.bin — e.g. the result of
`huggingface-cli download depth-anything/Depth-Anything-V2-Small-hf`).
<out_dir> receives depthestimation_tpu_params.msgpack +
depthestimation_tpu_config.json, which MonocularDepthEstimator(model_path=
<out_dir>) loads directly with no torch/transformers installed.

--verify runs a forward pass through both the freshly-converted and the
reloaded checkpoint on a synthetic image and checks they agree bit-exactly
(catches serialization drift, not conversion bugs — those are covered by
the torch-oracle parity suite, tests/test_convert_hf.py).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("snapshot", help="HF snapshot dir (config.json + weights)")
    ap.add_argument("out", help="output checkpoint dir")
    ap.add_argument("--size", default="small",
                    help="human-readable size label recorded in the config "
                         "(loading reads the full architecture, not this)")
    ap.add_argument("--verify", action="store_true",
                    help="round-trip a forward pass through the saved "
                         "checkpoint and require bit-identical output")
    args = ap.parse_args(argv)

    from depthestimation_tpu.models.convert import load_hf_depth_anything
    from depthestimation_tpu.models.mono import MonoDepthModel

    if not os.path.exists(os.path.join(args.snapshot, "config.json")):
        print(f"error: {args.snapshot} has no config.json — not an HF "
              "snapshot directory", file=sys.stderr)
        return 2

    print(f"Converting {args.snapshot} ...")
    model = load_hf_depth_anything(args.snapshot)
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in __import__("jax").tree_util.tree_leaves(model.params))
    model.save(args.out, size=args.size)
    ckpt = os.path.join(args.out, "depthestimation_tpu_params.msgpack")
    print(f"Wrote {ckpt} ({os.path.getsize(ckpt) / 2**20:.1f} MB, "
          f"{n_params / 1e6:.1f}M params)")

    if args.verify:
        patch = model.net.vit_cfg.patch_size
        side = patch * 4
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (1, side, side, 3)).astype(np.float32)
        want = np.asarray(model.net.apply({"params": model.params}, img))
        re = MonoDepthModel.load(args.out)
        got = np.asarray(re.net.apply({"params": re.params}, img))
        if not np.array_equal(want, got):
            print("error: reloaded checkpoint output differs from the "
                  "converted model", file=sys.stderr)
            return 1
        print(f"Verified: reloaded forward is bit-identical "
              f"({side}x{side} probe).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
