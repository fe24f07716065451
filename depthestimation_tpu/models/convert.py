"""HF Depth-Anything checkpoint -> Flax parameter conversion.

Replaces the reference's dependence on torch/transformers for inference
(MonocularDepthEstimator.py:32-34): a pretrained HF
``DepthAnythingForDepthEstimation`` snapshot (config.json +
safetensors/bin) is mapped onto the MonoDepthNet parameter tree so the
forward runs purely in JAX.

Name mapping (HF module -> our Flax module):
  backbone.embeddings.patch_embeddings.projection -> backbone/patch_embed
  backbone.embeddings.cls_token / position_embeddings -> params
  backbone.encoder.layer.N.{attention,mlp,norms,layer_scale} -> block_N
  neck.reassemble_stage.layers.N.{projection,resize} -> head/project_N,resize_N
  neck.convs.N -> head/layer_rn_N
  neck.fusion_stage.layers.N -> head/fusion_{3-N}  (HF lists them
      deepest-first in reverse)
  head.{conv1,conv2,conv3} -> head/head_conv1,head_conv2,head_out
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

__all__ = ["load_hf_depth_anything", "convert_state_dict"]


def _load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load tensors from safetensors or torch .bin files (host-side)."""
    tensors = {}
    for fname in sorted(os.listdir(model_dir)):
        path = os.path.join(model_dir, fname)
        if fname.endswith(".safetensors"):
            from safetensors.numpy import load_file

            tensors.update(load_file(path))
        elif fname.endswith(".bin") and "pytorch_model" in fname:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            tensors.update({k: v.numpy() for k, v in sd.items()})
    if not tensors:
        raise FileNotFoundError(f"No weight files found in {model_dir}")
    return tensors


def _conv_w(w: np.ndarray) -> np.ndarray:
    # torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _convt_w(w: np.ndarray) -> np.ndarray:
    # torch conv_transpose (I, O, kh, kw) -> flax ConvTranspose with
    # transpose_kernel=True, which expects (kh, kw, O, I).
    return np.transpose(w, (2, 3, 1, 0))


def _lin_w(w: np.ndarray) -> np.ndarray:
    # torch linear (O, I) -> flax dense (I, O)
    return np.transpose(w)


def convert_state_dict(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    """HF DepthAnythingForDepthEstimation state dict -> Flax params tree
    for MonoDepthNet (backbone + head)."""
    p: dict = {"backbone": {}, "head": {}}
    bb = p["backbone"]
    hd = p["head"]

    def g(name):
        return np.asarray(sd[name])

    # --- embeddings ---
    bb["patch_embed"] = {
        "kernel": _conv_w(g("backbone.embeddings.patch_embeddings.projection.weight")),
        "bias": g("backbone.embeddings.patch_embeddings.projection.bias"),
    }
    bb["cls_token"] = g("backbone.embeddings.cls_token")
    bb["pos_embed"] = g("backbone.embeddings.position_embeddings")
    bb["norm"] = {
        "scale": g("backbone.layernorm.weight"),
        "bias": g("backbone.layernorm.bias"),
    }

    # --- encoder blocks ---
    for i in range(num_layers):
        pre = f"backbone.encoder.layer.{i}"
        q_w = _lin_w(g(f"{pre}.attention.attention.query.weight"))
        k_w = _lin_w(g(f"{pre}.attention.attention.key.weight"))
        v_w = _lin_w(g(f"{pre}.attention.attention.value.weight"))
        q_b = g(f"{pre}.attention.attention.query.bias")
        k_b = g(f"{pre}.attention.attention.key.bias")
        v_b = g(f"{pre}.attention.attention.value.bias")
        bb[f"block_{i}"] = {
            "norm1": {
                "scale": g(f"{pre}.norm1.weight"),
                "bias": g(f"{pre}.norm1.bias"),
            },
            "attn": {
                "qkv": {
                    "kernel": np.concatenate([q_w, k_w, v_w], axis=1),
                    "bias": np.concatenate([q_b, k_b, v_b], axis=0),
                },
                "proj": {
                    "kernel": _lin_w(g(f"{pre}.attention.output.dense.weight")),
                    "bias": g(f"{pre}.attention.output.dense.bias"),
                },
            },
            "ls1": {"gamma": g(f"{pre}.layer_scale1.lambda1")},
            "norm2": {
                "scale": g(f"{pre}.norm2.weight"),
                "bias": g(f"{pre}.norm2.bias"),
            },
            "mlp": {
                "fc1": {
                    "kernel": _lin_w(g(f"{pre}.mlp.fc1.weight")),
                    "bias": g(f"{pre}.mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": _lin_w(g(f"{pre}.mlp.fc2.weight")),
                    "bias": g(f"{pre}.mlp.fc2.bias"),
                },
            },
            "ls2": {"gamma": g(f"{pre}.layer_scale2.lambda1")},
        }

    # --- DPT neck: reassemble (projection + resize) ---
    for i in range(4):
        pre = f"neck.reassemble_stage.layers.{i}"
        hd[f"project_{i}"] = {
            "kernel": _conv_w(g(f"{pre}.projection.weight")),
            "bias": g(f"{pre}.projection.bias"),
        }
        rk = f"{pre}.resize.weight"
        if rk in sd:
            w = g(rk)
            if w.ndim == 4 and i in (0, 1):
                hd[f"resize_{i}"] = {
                    "kernel": _convt_w(w),
                    "bias": g(f"{pre}.resize.bias"),
                }
            else:
                hd[f"resize_{i}"] = {
                    "kernel": _conv_w(w),
                    "bias": g(f"{pre}.resize.bias"),
                }
        hd[f"layer_rn_{i}"] = {
            "kernel": _conv_w(g(f"neck.convs.{i}.weight")),
        }

    # --- fusion stages (HF deepest-last: fusion_stage.layers.0 consumes the
    # deepest feature; ours is fusion_3) ---
    for i in range(4):
        pre = f"neck.fusion_stage.layers.{i}"
        ours = f"fusion_{3 - i}"
        blk = {}
        for hf_rcu, our_rcu in (
            ("residual_layer1", "rcu1"),
            ("residual_layer2", "rcu2"),
        ):
            k1 = f"{pre}.{hf_rcu}.convolution1.weight"
            if k1 not in sd:
                continue
            blk[our_rcu] = {
                "conv1": {
                    "kernel": _conv_w(g(k1)),
                    "bias": g(f"{pre}.{hf_rcu}.convolution1.bias"),
                },
                "conv2": {
                    "kernel": _conv_w(g(f"{pre}.{hf_rcu}.convolution2.weight")),
                    "bias": g(f"{pre}.{hf_rcu}.convolution2.bias"),
                },
            }
        blk["project"] = {
            "kernel": _conv_w(g(f"{pre}.projection.weight")),
            "bias": g(f"{pre}.projection.bias"),
        }
        hd[ours] = blk

    # --- head ---
    hd["head_conv1"] = {
        "kernel": _conv_w(g("head.conv1.weight")),
        "bias": g("head.conv1.bias"),
    }
    hd["head_conv2"] = {
        "kernel": _conv_w(g("head.conv2.weight")),
        "bias": g("head.conv2.bias"),
    }
    hd["head_out"] = {
        "kernel": _conv_w(g("head.conv3.weight")),
        "bias": g("head.conv3.bias"),
    }
    return p


def load_hf_depth_anything(model_dir: str):
    """Build a MonoDepthModel with converted HF weights."""
    import jax.numpy as jnp

    from .dpt import DPTConfig
    from .mono import MonoDepthModel, MonoDepthNet
    from .vit import ViTConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)

    bb = hf_cfg.get("backbone_config", {})
    hidden = bb.get("hidden_size", 384)
    layers = bb.get("num_hidden_layers", 12)
    heads = bb.get("num_attention_heads", 6)
    patch = bb.get("patch_size", 14)
    image_size = bb.get("image_size", 518)
    out_indices = hf_cfg.get("backbone_out_indices")
    if out_indices is None:
        out_indices = bb.get("out_indices", [3, 6, 9, 12])
        # HF out_indices are 1-based stage indices.
        out_indices = [i - 1 for i in out_indices]
    vit_cfg = ViTConfig(
        image_size=image_size,
        patch_size=patch,
        hidden_size=hidden,
        num_layers=layers,
        num_heads=heads,
        out_layers=tuple(out_indices),
    )
    dpt_cfg = DPTConfig(
        features=hf_cfg.get("fusion_hidden_size", 64),
        reassemble_channels=tuple(hf_cfg.get("neck_hidden_sizes",
                                             (48, 96, 192, 384))),
        head_features=hf_cfg.get("head_hidden_size", 32),
    )
    net = MonoDepthNet(vit_cfg, dpt_cfg)
    sd = _load_state_dict(model_dir)
    params = convert_state_dict(sd, layers)
    import jax

    params = jax.tree.map(jnp.asarray, params)
    return MonoDepthModel(net=net, params=params, _jit_cache={})
