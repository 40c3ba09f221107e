"""Depth decoder (SURVEY.md component M2).

U-Net-style decoder with skips; sigmoid disparity at ``n_scales`` scales;
ELU + nearest-upsample + 3×3 convs — the family-standard head
(Monodepth2 ``depth_decoder.py`` behavioral equivalent; no reference code
exists, SURVEY.md §0). Disparity heads run in float32 for loss stability.
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


class ConvBlock(nn.Module):
    """3×3 conv + ELU (family ``ConvBlock``)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        return nn.elu(x)


class DepthDecoder(nn.Module):
    """Decode a 5-scale encoder pyramid into multi-scale sigmoid disparity.

    Returns ``{scale: disp}`` with disp (B, H/2^s, W/2^s, 1) in (0, 1),
    for s in 0..n_scales−1 (s=0 is input resolution).
    """

    n_scales: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, enc_features: Sequence[jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        outputs: Dict[int, jnp.ndarray] = {}
        x = enc_features[-1]
        # i indexes decoder levels 4..0; level i produces features at /2^i.
        for i in range(4, -1, -1):
            x = ConvBlock(DECODER_CHANNELS[i], dtype=self.dtype)(x)
            x = upsample_nearest(x)
            if i > 0:
                skip = enc_features[i - 1]
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ConvBlock(DECODER_CHANNELS[i], dtype=self.dtype)(x)
            if i < self.n_scales:
                disp = nn.Conv(1, (3, 3), dtype=jnp.float32, name=f"dispconv_{i}")(
                    x.astype(jnp.float32)
                )
                outputs[i] = nn.sigmoid(disp)
        return outputs
