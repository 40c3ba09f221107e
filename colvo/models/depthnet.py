"""DepthNet and the coupled ColVO snippet model (SURVEY.md M1–M5, M4).

``DepthNet`` = encoder + decoder, single-frame disparity (BASELINE.json
config 1). ``ColVOModel`` runs the full coupled forward over a snippet
(target + source frames): per-frame depth, per-pair DCDP-fused pose — the
one jitted graph the train step differentiates (SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from colvo.config import ModelConfig
from colvo.models.encoder import ResNetEncoder
from colvo.models.depth_decoder import DepthDecoder
from colvo.models.posenet import DCDPFusion, PoseDecoder


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class DepthNet(nn.Module):
    """Single-frame depth: image → multi-scale sigmoid disparity.

    Returns ``(disps, bottleneck)`` where disps is {scale: (B,h,w,1)} and
    bottleneck is the /32 encoder feature used by DCDP fusion.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> Tuple[Dict[int, jnp.ndarray], jnp.ndarray]:
        dt = _dtype(self.cfg)
        feats = ResNetEncoder(self.cfg.num_layers, norm=self.cfg.norm, dtype=dt,
                              remat=self.cfg.remat, name="encoder")(img)
        # Import variant mirrors the family's reflection-padded decoder
        # (colvo/models/depth_decoder.py docstring).
        pad_mode = "reflect" if self.cfg.norm == "none" else "same"
        disps = DepthDecoder(self.cfg.n_scales, pad_mode=pad_mode, dtype=dt,
                             remat=self.cfg.remat, name="decoder")(feats)
        return disps, feats[-1]


class ColVOModel(nn.Module):
    """Coupled depth+pose over a snippet — the DCDP forward.

    Inputs: ``frames`` (B, n_frames, H, W, 3) with index 0 = target and
    1.. = source frames (order matches ``frame_offsets`` in DataConfig).

    Outputs:
      * ``disps``: list over frames of {scale: disp} (all frames get depth —
        source depths feed the geometric-consistency constraint, SURVEY.md G5)
      * ``poses``: (B, n_sources, 6) raw (axisangle, translation) params,
        target→source direction handled by the loss via ``invert`` for
        temporally-previous sources (family convention).
    """

    cfg: ModelConfig

    def setup(self):
        dt = _dtype(self.cfg)
        self.depth_net = DepthNet(self.cfg, name="depth")
        self.pose_encoder = ResNetEncoder(self.cfg.num_layers, norm=self.cfg.norm,
                                          dtype=dt, remat=self.cfg.remat,
                                          name="pose_encoder")
        if self.cfg.dcdp_fusion:
            self.fusion = DCDPFusion(self.cfg.fusion_channels, dtype=dt, name="fusion")
        self.pose_decoder = PoseDecoder(
            self.cfg.pose_rotation_scale,
            self.cfg.pose_translation_scale,
            dtype=dt,
            name="pose_decoder",
        )

    def depth(self, img: jnp.ndarray):
        return self.depth_net(img)

    def pose(
        self, img_a: jnp.ndarray, img_b: jnp.ndarray, depth_feats: Sequence[jnp.ndarray] | None
    ):
        x = jnp.concatenate([img_a, img_b], axis=-1)
        feats = self.pose_encoder(x)
        bottleneck = feats[-1]
        if self.cfg.dcdp_fusion and depth_feats is not None:
            bottleneck = self.fusion(bottleneck, depth_feats)
        return self.pose_decoder(bottleneck)

    def __call__(self, frames: jnp.ndarray):
        if not self.cfg.batched_snippet:
            return self._call_per_frame(frames)
        b, n_frames, h, w, c = frames.shape
        # One batched depth pass over all snippet frames ((B·F) batch, not
        # F separate B-batches): small-channel convs at these resolutions
        # utilize the MXU much better at larger batch, and per-sample
        # GroupNorm makes batching numerically equivalent.
        d_flat, bneck_flat = self.depth_net(frames.reshape(b * n_frames, h, w, c))
        disps = [
            {s: v.reshape(b, n_frames, *v.shape[1:])[:, i] for s, v in d_flat.items()}
            for i in range(n_frames)
        ]
        bottlenecks = [
            bneck_flat.reshape(b, n_frames, *bneck_flat.shape[1:])[:, i]
            for i in range(n_frames)
        ]

        # One batched pose pass over all (target, source) pairs, s-major.
        n_sources = n_frames - 1
        img_a = jnp.concatenate([frames[:, 0]] * n_sources, axis=0)
        img_b = jnp.concatenate([frames[:, s] for s in range(1, n_frames)], axis=0)
        if self.cfg.dcdp_fusion:
            feats = [
                jnp.concatenate([bottlenecks[0]] * n_sources, axis=0),
                jnp.concatenate(bottlenecks[1:], axis=0),
            ]
        else:
            feats = None
        # Family convention: temporal order into the pose encoder. The
        # caller knows which sources are past frames (and inverts).
        aa, tr = self.pose(img_a, img_b, feats)
        pose6 = jnp.concatenate([aa, tr], axis=-1)  # (S·B, 6)
        poses = jnp.transpose(pose6.reshape(n_sources, b, 6), (1, 0, 2))
        return disps, poses

    def _call_per_frame(self, frames: jnp.ndarray):
        """Reference per-frame/per-pair forward (one DepthNet call per
        snippet frame, one PoseNet call per pair). Mathematically identical
        to the batched path; kept as a diagnostic/fallback knob
        (``model.batched_snippet=false``)."""
        n_frames = frames.shape[1]
        disps = []
        bottlenecks = []
        for i in range(n_frames):
            d, bn = self.depth_net(frames[:, i])
            disps.append(d)
            bottlenecks.append(bn)
        poses = []
        for s in range(1, n_frames):
            feats = [bottlenecks[0], bottlenecks[s]] if self.cfg.dcdp_fusion else None
            aa, tr = self.pose(frames[:, 0], frames[:, s], feats)
            poses.append(jnp.concatenate([aa, tr], axis=-1))
        return disps, jnp.stack(poses, axis=1)
