"""Vision Transformer encoder (Flax linen), DINOv2-style.

TPU-native replacement for the torch backbone of Depth Anything V2 that the
reference loads through HF transformers
(MonocularDepthEstimator.py:1,32-37). Architecture matches the DINOv2 ViT
family (patch embed, cls token, interpolatable position embeddings,
pre-norm blocks with LayerScale) so that HF checkpoint weights can be
mapped onto it (models/convert.py); compute is bfloat16-friendly and all
matmuls are MXU-shaped.

Sharding: parameters carry logical axis names via nn.with_partitioning —
'embed' / 'mlp' / 'heads' axes map onto the mesh 'model' axis for tensor
parallelism (parallel/mesh.py rules).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ViTConfig", "ViT"]


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 518
    patch_size: int = 14
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    layerscale_init: float = 1.0
    out_layers: Tuple[int, ...] = (2, 5, 8, 11)
    dtype: Any = jnp.float32

    @classmethod
    def small(cls, **kw):
        return cls(hidden_size=384, num_layers=12, num_heads=6,
                   out_layers=(2, 5, 8, 11), **kw)

    @classmethod
    def base(cls, **kw):
        return cls(hidden_size=768, num_layers=12, num_heads=12,
                   out_layers=(2, 5, 8, 11), **kw)

    @classmethod
    def large(cls, **kw):
        return cls(hidden_size=1024, num_layers=24, num_heads=16,
                   out_layers=(4, 11, 17, 23), **kw)


def _dense(features, name, kernel_axes, dtype):
    return nn.Dense(
        features,
        name=name,
        dtype=dtype,
        kernel_init=nn.with_partitioning(
            nn.initializers.xavier_uniform(), kernel_axes
        ),
    )


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.hidden_size
        head_dim = d // c.num_heads
        qkv = _dense(3 * d, "qkv", ("embed", "heads"), c.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(*t.shape[:-1], c.num_heads, head_dim)

        q, k, v = map(split_heads, (q, k, v))
        # (B, T, H, Dh) -> standard dot-product attention; XLA fuses this
        # into flash-style attention on TPU.
        scale = head_dim**-0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(*out.shape[:-2], d)
        return _dense(d, "proj", ("heads", "embed"), c.dtype)(out)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hidden = int(c.hidden_size * c.mlp_ratio)
        x = _dense(hidden, "fc1", ("embed", "mlp"), c.dtype)(x)
        x = nn.gelu(x)
        return _dense(c.hidden_size, "fc2", ("mlp", "embed"), c.dtype)(x)


class LayerScale(nn.Module):
    dim: int
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            nn.with_partitioning(
                nn.initializers.constant(self.init), ("embed",)
            ),
            (self.dim,),
        )
        return x * gamma


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        y = nn.LayerNorm(name="norm1", dtype=c.dtype)(x)
        y = Attention(c, name="attn")(y)
        x = x + LayerScale(c.hidden_size, c.layerscale_init, name="ls1")(y)
        y = nn.LayerNorm(name="norm2", dtype=c.dtype)(x)
        y = Mlp(c, name="mlp")(y)
        x = x + LayerScale(c.hidden_size, c.layerscale_init, name="ls2")(y)
        return x


class ViT(nn.Module):
    """DINOv2-style ViT returning the intermediate features named by
    cfg.out_layers (for the DPT decoder) plus the cls token per tap."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images) -> List[Tuple[jax.Array, jax.Array]]:
        """images: (B, H, W, 3) float in [0, 1] (normalized internally).

        Returns [(patch_tokens (B, h*w, D), cls (B, D)), ...] for each tap.
        """
        c = self.cfg
        # ImageNet normalization (HF processor semantics).
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        x = (images - mean) / std
        x = x.astype(c.dtype)

        b, h, w, _ = x.shape
        gh, gw = h // c.patch_size, w // c.patch_size
        x = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            name="patch_embed",
            dtype=c.dtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.xavier_uniform(),
                (None, None, None, "embed"),
            ),
        )(x)
        x = x.reshape(b, gh * gw, c.hidden_size)

        cls = self.param(
            "cls_token",
            nn.with_partitioning(nn.initializers.zeros, (None, None, "embed")),
            (1, 1, c.hidden_size),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)),
                             x.astype(cls.dtype)], axis=1).astype(c.dtype)

        grid0 = c.image_size // c.patch_size
        pos = self.param(
            "pos_embed",
            nn.with_partitioning(
                nn.initializers.normal(0.02), (None, None, "embed")
            ),
            (1, grid0 * grid0 + 1, c.hidden_size),
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (grid0, grid0):
            # Bilinear position-embedding interpolation for non-default
            # resolutions (DINOv2 interpolate_pos_encoding semantics).
            # Bicubic, matching HF Dinov2 interpolate_pos_encoding.
            pos_patch = jax.image.resize(
                pos_patch.reshape(1, grid0, grid0, c.hidden_size),
                (1, gh, gw, c.hidden_size),
                method="bicubic",
            ).reshape(1, gh * gw, c.hidden_size)
        x = x + jnp.concatenate([pos_cls, pos_patch], axis=1).astype(c.dtype)

        by_layer = {}
        for i in range(c.num_layers):
            x = Block(c, name=f"block_{i}")(x)
            if i in c.out_layers:
                by_layer[i] = x
        # Shared final LayerNorm applied to every tap (Dinov2Backbone
        # apply_layernorm semantics; HF weight 'backbone.layernorm').
        final_norm = nn.LayerNorm(name="norm", dtype=c.dtype)
        taps = []
        # One tap per out_layers entry (duplicates allowed, e.g. tiny test
        # models reuse a layer for several DPT scales).
        for i in c.out_layers:
            normed = final_norm(by_layer[i])
            taps.append((normed[:, 1:, :], normed[:, 0, :]))
        return taps
