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


def _resize_align_corners(x, out_hw):
    """Bilinear resize with align_corners=True semantics (torch
    F.interpolate align_corners=True; jax.image.resize only offers
    half-pixel centers). x: (B, H, W, C)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def coords(n_out, n_in):
        if n_out <= 1 or n_in <= 1:
            return jnp.zeros((n_out,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    ys = coords(oh, h)
    xs = coords(ow, w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fy = (ys - y0)[None, :, None, None]
    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fx = (xs - x0)[None, None, :, None]

    rows = x[:, y0] * (1 - fy) + x[:, y1] * fy  # (B, oh, W, C)
    out = rows[:, :, x0] * (1 - fx) + rows[:, :, x1] * fx
    return out.astype(x.dtype)


class FeatureFusion(nn.Module):
    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        """HF DepthAnythingFeatureFusionLayer semantics: residual resized
        to x (align_corners=False) if needed, pre-act residual units, then
        align_corners=True upsample to out_hw (x2 when None), then 1x1
        projection."""
        if skip is not None:
            if x.shape[1:3] != skip.shape[1:3]:
                b, _, _, c = skip.shape
                skip = jax.image.resize(
                    skip, (b, x.shape[1], x.shape[2], c), method="bilinear"
                )
            x = x + ResidualConvUnit(self.features, self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        b, h, w, c = x.shape
        if out_hw is None:
            out_hw = (h * 2, w * 2)
        x = _resize_align_corners(x, out_hw)
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
            # transpose_kernel=True + VALID matches torch ConvTranspose2d
            # (the gradient-of-conv formulation); the strided conv needs
            # explicit symmetric padding (XLA SAME pads right-only at
            # stride 2, torch pads both sides).
            if f == 4.0:
                x = nn.ConvTranspose(ch, (4, 4), strides=(4, 4),
                                     padding="VALID", transpose_kernel=True,
                                     name=f"resize_{i}", dtype=c.dtype)(x)
            elif f == 2.0:
                x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                     padding="VALID", transpose_kernel=True,
                                     name=f"resize_{i}", dtype=c.dtype)(x)
            elif f == 0.5:
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            name=f"resize_{i}", dtype=c.dtype)(x)
            x = nn.Conv(c.features, (3, 3), padding="SAME", use_bias=False,
                        name=f"layer_rn_{i}", dtype=c.dtype)(x)
            feats.append(x)

        # Coarse-to-fine fusion, deepest tap first; each stage upsamples to
        # the next finer feature's resolution (HF FeatureFusionStage), the
        # last stage to x2.
        x = FeatureFusion(c.features, c.dtype, name="fusion_3")(
            feats[3], out_hw=feats[2].shape[1:3]
        )
        x = FeatureFusion(c.features, c.dtype, name="fusion_2")(
            x, feats[2], out_hw=feats[1].shape[1:3]
        )
        x = FeatureFusion(c.features, c.dtype, name="fusion_1")(
            x, feats[1], out_hw=feats[0].shape[1:3]
        )
        x = FeatureFusion(c.features, c.dtype, name="fusion_0")(x, feats[0])

        # HF DepthAnything head: conv1 -> features//2, upsample to input
        # resolution, conv2 -> head_features, relu, 1x1 -> depth.
        x = nn.Conv(max(c.features // 2, 1), (3, 3), padding="SAME",
                    name="head_conv1", dtype=c.dtype)(x)
        x = _resize_align_corners(x, out_hw)
        x = nn.Conv(c.head_features, (3, 3), padding="SAME", name="head_conv2",
                    dtype=c.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_out", dtype=c.dtype)(x)
        return nn.relu(x[..., 0]).astype(jnp.float32)
