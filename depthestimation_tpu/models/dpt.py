"""DPT (Dense Prediction Transformer) depth head (Flax linen).

The decoder half of the Depth Anything V2 capability the reference gets
from HF transformers (MonocularDepthEstimator.py:33,68-70): reassemble 4
ViT taps into multi-scale feature maps, fuse coarse-to-fine with residual
conv units, and regress relative depth at input resolution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["DPTConfig", "DPTHead"]


@dataclass(frozen=True)
class DPTConfig:
    features: int = 64  # fusion width (DAV2: 64/128/256 for S/B/L)
    reassemble_channels: Tuple[int, ...] = (48, 96, 192, 384)
    # Per-tap spatial factor relative to the patch grid: upsample x4, x2,
    # keep, downsample /2 (standard DPT reassembly).
    factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    head_features: int = 32
    dtype: Any = jnp.float32


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1",
                    dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2",
                    dtype=self.dtype)(y)
        return x + y


class FeatureFusion(nn.Module):
    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            # Odd patch grids make the /2 -> x2 round trip off by one;
            # align to the skip's resolution before the residual add.
            if x.shape[1:3] != skip.shape[1:3]:
                b, _, _, c = x.shape
                x = jax.image.resize(
                    x, (b, skip.shape[1], skip.shape[2], c), method="bilinear"
                )
            x = x + ResidualConvUnit(self.features, self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
        return nn.Conv(self.features, (1, 1), name="project", dtype=self.dtype)(x)


class DPTHead(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, taps: Sequence, grid_hw: Tuple[int, int],
                 out_hw: Tuple[int, int]):
        """taps: 4x (patch_tokens (B, T, D), cls (B, D)); returns relative
        depth (B, out_h, out_w) >= 0."""
        c = self.cfg
        gh, gw = grid_hw
        feats = []
        for i, (tokens, _cls) in enumerate(taps):
            b, t, d = tokens.shape
            x = tokens.reshape(b, gh, gw, d).astype(c.dtype)
            x = nn.Conv(c.reassemble_channels[i], (1, 1),
                        name=f"project_{i}", dtype=c.dtype)(x)
            # Learned resampling, matching DPT/DepthAnything reassembly:
            # ConvTranspose x4 / x2, identity, strided 3x3 conv for /2.
            f = c.factors[i]
            ch = x.shape[-1]
            if f == 4.0:
                x = nn.ConvTranspose(ch, (4, 4), strides=(4, 4),
                                     name=f"resize_{i}", dtype=c.dtype)(x)
            elif f == 2.0:
                x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                     name=f"resize_{i}", dtype=c.dtype)(x)
            elif f == 0.5:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            name=f"resize_{i}", dtype=c.dtype)(x)
            x = nn.Conv(c.features, (3, 3), padding="SAME", use_bias=False,
                        name=f"layer_rn_{i}", dtype=c.dtype)(x)
            feats.append(x)

        # Coarse-to-fine fusion (deepest tap first).
        x = FeatureFusion(c.features, c.dtype, name="fusion_3")(feats[3])
        x = FeatureFusion(c.features, c.dtype, name="fusion_2")(x, feats[2])
        x = FeatureFusion(c.features, c.dtype, name="fusion_1")(x, feats[1])
        x = FeatureFusion(c.features, c.dtype, name="fusion_0")(x, feats[0])

        x = nn.Conv(c.head_features, (3, 3), padding="SAME", name="head_conv1",
                    dtype=c.dtype)(x)
        b, h, w, _ = x.shape
        x = jax.image.resize(x, (b, out_hw[0], out_hw[1], x.shape[-1]),
                             method="bilinear")
        x = nn.Conv(c.head_features, (3, 3), padding="SAME", name="head_conv2",
                    dtype=c.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_out", dtype=c.dtype)(x)
        return nn.relu(x[..., 0]).astype(jnp.float32)
