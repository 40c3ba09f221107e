"""Convolutional encoder (SURVEY.md component M1).

ResNet-18/34-style feature pyramid in Flax linen, NHWC, bf16-compute /
fp32-params. Rebuilt TPU-first rather than ported: normalization is
GroupNorm by default — it needs no cross-device batch-stat sync over the DP
mesh and no mutable state under jit, so the whole train step stays a pure
function.

Two conv geometries, keyed on ``norm``:

* ``norm="group"`` (default, the from-scratch TPU training path): XLA
  ``SAME`` padding — no explicit pad ops, and the geometry all committed
  training baselines were measured under. (Measured: switching this path
  to torch-style padding stalled the overfit smoke — the padding alignment
  is part of the trained behavior, not a free choice.)
* ``norm="none"`` (the torch family-checkpoint import target,
  ``colvo.runtime.torch_import``): BatchNorm folded into conv weight+bias,
  and **exact torch padding geometry** (3 for the 7×7 stem, 1 for 3×3
  convs) — for strided convs on even inputs SAME pads (0,1) where torch
  pads (1,1), so imported weights only reproduce the family forward under
  the torch geometry (asserted in ``tests/test_torch_import.py``).

Evidence: BASELINE.json north_star "conv encoder-decoder DepthNet";
SURVEY.md §2.2 M1 (Monodepth2 ``resnet_encoder.py`` equivalent);
family weight distribution /root/reference/README.md:17.
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
    """Normalization switch: "group" (TPU-native default) or "none".

    "none" is the BN-folded import target — the preceding conv then carries
    a bias absorbing the family checkpoint's BatchNorm statistics.
    """

    norm: str = "group"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.norm == "none":
            return x
        # 16 channels/group ≈ GroupNorm sweet spot; min 8 groups.
        groups = max(8, x.shape[-1] // 16)
        groups = min(groups, x.shape[-1])
        return nn.GroupNorm(num_groups=groups, dtype=self.dtype)(x)


class BasicBlock(nn.Module):
    """Two 3×3 convs + residual, the ResNet-18/34 block."""

    features: int
    strides: int = 1
    norm: str = "group"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        torch_geom = self.norm == "none"
        bias = torch_geom
        pad3 = ((1, 1), (1, 1)) if torch_geom else "SAME"
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=pad3,
                    use_bias=bias, dtype=self.dtype)(x)
        y = _Norm(self.norm, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=pad3, use_bias=bias,
                    dtype=self.dtype)(y)
        y = _Norm(self.norm, self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=bias, dtype=self.dtype)(x)
            residual = _Norm(self.norm, self.dtype)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """5-scale feature pyramid: returns features at /2, /4, /8, /16, /32.

    Accepts 3-channel frames (DepthNet) or stacked 6-channel frame pairs
    (PoseNet input, SURVEY.md M3).
    """

    num_layers: int = 18
    norm: str = "group"
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False  # recompute block activations in backward
    #   (bandwidth-bound step, idle MXU — see ModelConfig.remat)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        if self.num_layers not in _STAGES:
            raise ValueError(f"num_layers must be one of {sorted(_STAGES)}")
        stages = _STAGES[self.num_layers]
        torch_geom = self.norm == "none"
        # Explicit names pin the param tree to the historical auto-naming
        # (nn.remat's wrapper class would otherwise auto-name blocks
        # "CheckpointBasicBlock_N"), so flipping the knob never
        # invalidates a checkpoint (pinned in tests/test_models.py).
        block_cls = nn.remat(BasicBlock) if self.remat else BasicBlock
        block_n = 0

        features = []
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2,
                    padding=((3, 3), (3, 3)) if torch_geom else "SAME",
                    use_bias=torch_geom, dtype=self.dtype)(x)
        x = _Norm(self.norm, self.dtype)(x)
        x = nn.relu(x)
        features.append(x)  # /2, 64

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage_idx, (blocks, width) in enumerate(zip(stages, ENCODER_CHANNELS[1:])):
            for block_idx in range(blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                x = block_cls(width, strides=strides, norm=self.norm,
                              dtype=self.dtype,
                              name=f"BasicBlock_{block_n}")(x)
                block_n += 1
            features.append(x)  # /4, /8, /16, /32
        return features
