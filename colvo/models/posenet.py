"""PoseNet + DCDP fusion (SURVEY.md components M3, M4).

Two-frame 6-channel pose branch with the DCDP coupling: the reference
couples "depth and pose estimation modes" via "multimodal fusion"
(/root/reference/README.md:7). Exact architecture is unspecified there
(SURVEY.md §7 hard part 2), so the coupling is built as a config-switchable
module: bottleneck depth features from both frames' DepthNet encoders are
projected and injected into the pose decoder, making pose estimation
depth-aware; turning ``dcdp_fusion`` off recovers the plain family PoseNet
(Monodepth2 ``pose_decoder.py`` equivalent) for ablation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from colvo.models.encoder import ResNetEncoder


class DCDPFusion(nn.Module):
    """Project per-frame depth bottleneck features into the pose space.

    Each frame's deepest DepthNet feature map (B, H/32, W/32, 512) is
    squeezed by a 1×1 conv to ``features`` channels; the two frames'
    projections are concatenated with the pose-encoder bottleneck along
    channels. Cheap (1×1 convs on the /32 grid) and entirely MXU-friendly.
    """

    features: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, pose_feat: jnp.ndarray, depth_feats: Sequence[jnp.ndarray]
    ) -> jnp.ndarray:
        parts = [pose_feat]
        for i, df in enumerate(depth_feats):
            proj = nn.Conv(self.features, (1, 1), dtype=self.dtype, name=f"depth_proj_{i}")(
                df.astype(self.dtype)
            )
            proj = nn.relu(proj)
            # Depth features come from /32 of the same input size; guard any
            # off-by-one spatial mismatch with a center crop.
            h = min(proj.shape[1], pose_feat.shape[1])
            w = min(proj.shape[2], pose_feat.shape[2])
            parts.append(proj[:, :h, :w])
        h = min(p.shape[1] for p in parts)
        w = min(p.shape[2] for p in parts)
        return jnp.concatenate([p[:, :h, :w] for p in parts], axis=-1)


class PoseDecoder(nn.Module):
    """Bottleneck features → 6-DoF (axis-angle, translation).

    Family-standard head: 1×1 squeeze, two strided-1 3×3 convs with ReLU,
    1×1 to 6 channels, global spatial mean, ×0.01 scaling on both rotation
    and translation (keeps early training near identity).
    """

    rotation_scale: float = 0.01
    translation_scale: float = 0.01
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")(x))
        x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype, name="pose_0")(x))
        x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype, name="pose_1")(x))
        x = nn.Conv(6, (1, 1), dtype=jnp.float32, name="pose_2")(x.astype(jnp.float32))
        out = jnp.mean(x, axis=(1, 2))  # (B, 6)
        axisangle = self.rotation_scale * out[:, :3]
        translation = self.translation_scale * out[:, 3:]
        return axisangle, translation


class PoseNet(nn.Module):
    """Two-frame relative pose with optional DCDP depth-feature fusion.

    Call with the frame pair and (optionally) the two frames' DepthNet
    bottleneck features; returns (axisangle, translation), each (B, 3).
    """

    num_layers: int = 18
    norm: str = "group"
    dcdp_fusion: bool = True
    fusion_channels: int = 64
    rotation_scale: float = 0.01
    translation_scale: float = 0.01
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        img_a: jnp.ndarray,
        img_b: jnp.ndarray,
        depth_feats: Optional[Sequence[jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.concatenate([img_a, img_b], axis=-1)  # (B, H, W, 6)
        feats = ResNetEncoder(self.num_layers, norm=self.norm, dtype=self.dtype, name="encoder")(x)
        bottleneck = feats[-1]
        if self.dcdp_fusion and depth_feats is not None:
            bottleneck = DCDPFusion(self.fusion_channels, dtype=self.dtype, name="fusion")(
                bottleneck, depth_feats
            )
        return PoseDecoder(
            self.rotation_scale, self.translation_scale, dtype=self.dtype, name="decoder"
        )(bottleneck)
