"""Convolutional encoder (SURVEY.md component M1).

ResNet-18/34-style feature pyramid in Flax linen, NHWC, bf16-compute /
fp32-params. Rebuilt TPU-first rather than ported: normalization is
GroupNorm by default — it needs no cross-device batch-stat sync over the DP
mesh and no mutable state under jit, so the whole train step stays a pure
function. (Family parity note: torchvision ResNet uses BatchNorm; the
torch-weight importer in ``colvo.runtime.checkpoint`` folds BN stats into
conv weights at import time, so family checkpoints still load.)

Evidence: BASELINE.json north_star "conv encoder-decoder DepthNet";
SURVEY.md §2.2 M1 (Monodepth2 ``resnet_encoder.py`` equivalent).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# blocks per stage for each supported depth
_STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}
# feature channels at each of the 5 scales (ResNet-18/34 widths)
ENCODER_CHANNELS: Tuple[int, ...] = (64, 64, 128, 256, 512)


class _Norm(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # 16 channels/group ≈ GroupNorm sweet spot; min 8 groups.
        groups = max(8, x.shape[-1] // 16)
        groups = min(groups, x.shape[-1])
        return nn.GroupNorm(num_groups=groups, dtype=self.dtype)(x)


class BasicBlock(nn.Module):
    """Two 3×3 convs + residual, the ResNet-18/34 block."""

    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, use_bias=False, dtype=self.dtype)(x)
        y = _Norm(self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = _Norm(self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides, use_bias=False, dtype=self.dtype)(x)
            residual = _Norm(self.dtype)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """5-scale feature pyramid: returns features at /2, /4, /8, /16, /32.

    Accepts 3-channel frames (DepthNet) or stacked 6-channel frame pairs
    (PoseNet input, SURVEY.md M3).
    """

    num_layers: int = 18
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        if self.num_layers not in _STAGES:
            raise ValueError(f"num_layers must be one of {sorted(_STAGES)}")
        stages = _STAGES[self.num_layers]

        features = []
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, use_bias=False, dtype=self.dtype)(x)
        x = _Norm(self.dtype)(x)
        x = nn.relu(x)
        features.append(x)  # /2, 64

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage_idx, (blocks, width) in enumerate(zip(stages, ENCODER_CHANNELS[1:])):
            for block_idx in range(blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                x = BasicBlock(width, strides=strides, dtype=self.dtype)(x)
            features.append(x)  # /4, /8, /16, /32
        return features
