"""Depth decoder (SURVEY.md component M2).

U-Net-style decoder with skips; sigmoid disparity at ``n_scales`` scales;
ELU + nearest-upsample + 3×3 convs — the family-standard head
(Monodepth2 ``depth_decoder.py`` behavioral equivalent; no reference code
exists, SURVEY.md §0). Disparity heads run in float32 for loss stability.

``pad_mode``: "same" (default — XLA SAME zero padding, the from-scratch
TPU training geometry) or "reflect" (the family's ``Conv3x3`` =
ReflectionPad2d(1) + Conv2d — required for torch-weight import parity,
selected when ``ModelConfig.norm == "none"``; see colvo/models/encoder.py
for the geometry rationale).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

DECODER_CHANNELS = (16, 32, 64, 128, 256)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor ×factor upsample, NHWC. Pure reshape/broadcast —
    lowers to a cheap XLA broadcast, no gather."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def _reflect1(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


class ConvBlock(nn.Module):
    """3×3 conv + ELU (family ``ConvBlock``)."""

    features: int
    pad_mode: str = "same"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.pad_mode == "reflect":
            x = nn.Conv(self.features, (3, 3), padding="VALID",
                        dtype=self.dtype)(_reflect1(x))
        else:
            x = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        return nn.elu(x)


class DepthDecoder(nn.Module):
    """Decode a 5-scale encoder pyramid into multi-scale sigmoid disparity.

    Returns ``{scale: disp}`` with disp (B, H/2^s, W/2^s, 1) in (0, 1),
    for s in 0..n_scales−1 (s=0 is input resolution).
    """

    n_scales: int = 4
    pad_mode: str = "same"
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False  # see ResNetEncoder.remat

    @nn.compact
    def __call__(self, enc_features: Sequence[jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        outputs: Dict[int, jnp.ndarray] = {}
        reflect = self.pad_mode == "reflect"
        # Explicit names pin the param tree to the historical auto-naming
        # so remat never invalidates a checkpoint (see ResNetEncoder).
        block_cls = nn.remat(ConvBlock) if self.remat else ConvBlock
        block_n = 0
        x = enc_features[-1]
        # i indexes decoder levels 4..0; level i produces features at /2^i.
        for i in range(4, -1, -1):
            x = block_cls(DECODER_CHANNELS[i], pad_mode=self.pad_mode,
                          dtype=self.dtype, name=f"ConvBlock_{block_n}")(x)
            block_n += 1
            x = upsample_nearest(x)
            if i > 0:
                skip = enc_features[i - 1]
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = block_cls(DECODER_CHANNELS[i], pad_mode=self.pad_mode,
                          dtype=self.dtype, name=f"ConvBlock_{block_n}")(x)
            block_n += 1
            if i < self.n_scales:
                xf = x.astype(jnp.float32)
                disp = nn.Conv(1, (3, 3),
                               padding="VALID" if reflect else "SAME",
                               dtype=jnp.float32, name=f"dispconv_{i}")(
                    _reflect1(xf) if reflect else xf
                )
                outputs[i] = nn.sigmoid(disp)
        return outputs
