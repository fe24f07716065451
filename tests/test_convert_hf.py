"""HF Depth-Anything -> Flax conversion parity (torch CPU as oracle).

Builds a tiny DepthAnythingForDepthEstimation locally (no downloads), runs
the torch forward, converts the saved checkpoint, and checks our JAX
forward matches. torch/transformers appear ONLY as oracles here — the
framework's compute path has neither.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import (  # noqa: E402
    DepthAnythingConfig,
    DepthAnythingForDepthEstimation,
    Dinov2Config,
)

from depthestimation_tpu.models.convert import load_hf_depth_anything  # noqa: E402

_MEAN = np.array([0.485, 0.456, 0.406])
_STD = np.array([0.229, 0.224, 0.225])


@pytest.fixture(scope="module")
def tiny_hf_model(tmp_path_factory):
    bb = Dinov2Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=256, patch_size=14, image_size=56,
        out_indices=[1, 2, 3, 4], apply_layernorm=True,
        reshape_hidden_states=False, initializer_range=0.06,
    )
    cfg = DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=32, reassemble_hidden_size=64,
        neck_hidden_sizes=[16, 32, 48, 64], head_hidden_size=16,
        initializer_range=0.06,
    )
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(cfg).eval()
    d = tmp_path_factory.mktemp("hf_tiny_da")
    model.save_pretrained(str(d))
    return model, str(d)


def test_convert_cli_golden(tiny_hf_model, tmp_path):
    """The offline weights recipe end-to-end (VERDICT r4 #3 mono item):
    tools/convert_hf_checkpoint.py turns an HF snapshot dir into a
    msgpack checkpoint that MonoDepthModel.load() restores with a
    bit-identical forward — the exact one-command path a weights-bearing
    machine runs for real Depth-Anything-V2 checkpoints."""
    import sys

    sys.path.insert(0, "tools")
    import convert_hf_checkpoint as cli

    _, ckpt_dir = tiny_hf_model
    out = str(tmp_path / "converted")
    assert cli.main([ckpt_dir, out, "--size", "tiny-test", "--verify"]) == 0

    from depthestimation_tpu.models.mono import MonoDepthModel

    direct = load_hf_depth_anything(ckpt_dir)
    reloaded = MonoDepthModel.load(out)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 56, 84, 3)).astype(np.float32)
    a = np.asarray(direct.net.apply({"params": direct.params}, x))
    b = np.asarray(reloaded.net.apply({"params": reloaded.params}, x))
    np.testing.assert_array_equal(a, b)


def test_convert_cli_rejects_non_snapshot(tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import convert_hf_checkpoint as cli

    assert cli.main([str(tmp_path), str(tmp_path / "out")]) == 2


@pytest.mark.parametrize("shape", [(56, 56), (84, 112)])
def test_forward_parity(tiny_hf_model, shape):
    model, ckpt_dir = tiny_hf_model
    h, w = shape
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    xt = torch.tensor(((x - _MEAN) / _STD).transpose(0, 3, 1, 2).astype(np.float32))
    with torch.no_grad():
        ref = model(pixel_values=xt).predicted_depth.numpy()

    ours = np.asarray(
        load_hf_depth_anything(ckpt_dir).net.apply(
            {"params": load_hf_depth_anything(ckpt_dir).params}, x
        )
    )
    assert ours.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    rel = np.abs(ours - ref).max() / scale
    assert rel < 0.02, rel
