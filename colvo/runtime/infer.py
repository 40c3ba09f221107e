"""Inference runners (SURVEY.md component R7; BASELINE.json configs 1–2).

Jit-compiled batched depth and pose inference — the >30 fps/chip target
path (measured at several hundred fps/chip on TPU v5 lite, see bench.py).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colvo.config import ColvoConfig
from colvo.geometry import disp_to_depth
from colvo.models import ColVOModel


class InferenceRunner:
    """Holds jitted single-purpose forward functions over trained params."""

    def __init__(self, cfg: ColvoConfig, params):
        self.cfg = cfg
        self.model = ColVOModel(cfg.model)
        # Commit params to device ONCE. Host-numpy params (the npz import
        # path) are re-uploaded by jit on EVERY dispatch — ~120 MB of
        # weights per streaming chunk through a ~34 MB/s host link turned
        # the 130 fps executor into 3 fps and leaked a host-side f32
        # conversion per call (found by the 3000-frame long-video proof;
        # per-chunk diagnostic pinned 6-9 s/chunk + ~115 MB/chunk RSS
        # growth). device_put is a no-op for already-committed arrays.
        self.params = jax.device_put(params)

        @jax.jit
        def _depth(params, imgs):
            disps, _ = self.model.apply(params, imgs, method=self.model.depth)
            _, depth = disp_to_depth(
                disps[0][..., 0], cfg.model.min_depth, cfg.model.max_depth
            )
            return depth, disps[0][..., 0]

        @jax.jit
        def _pose(params, img_a, img_b):
            # Coupled inference: DCDP fusion uses both frames' depth features
            # (README.md:7 — pose estimation is depth-aware).
            feats = None
            if cfg.model.dcdp_fusion:
                _, fa = self.model.apply(params, img_a, method=self.model.depth)
                _, fb = self.model.apply(params, img_b, method=self.model.depth)
                feats = [fa, fb]
            aa, tr = self.model.apply(params, img_a, img_b, feats, method=self.model.pose)
            return aa, tr

        @jax.jit
        def _coupled(params, img_a, img_b):
            """One fused graph: depth of both frames + fused pose — the
            per-pair VO step (config 5 hot path)."""
            disps_a, fa = self.model.apply(params, img_a, method=self.model.depth)
            disps_b, fb = self.model.apply(params, img_b, method=self.model.depth)
            feats = [fa, fb] if cfg.model.dcdp_fusion else None
            aa, tr = self.model.apply(params, img_a, img_b, feats, method=self.model.pose)
            _, depth_a = disp_to_depth(
                disps_a[0][..., 0], cfg.model.min_depth, cfg.model.max_depth
            )
            _, depth_b = disp_to_depth(
                disps_b[0][..., 0], cfg.model.min_depth, cfg.model.max_depth
            )
            return depth_a, depth_b, aa, tr

        self._depth_fn = _depth
        self._pose_fn = _pose
        self._coupled_fn = _coupled

    def infer_depth(self, imgs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(B, H, W, 3) → (depth (B, H, W), disp (B, H, W)). Config 1."""
        depth, disp = self._depth_fn(self.params, jnp.asarray(imgs))
        return np.asarray(depth), np.asarray(disp)

    def infer_pose(self, img_a: np.ndarray, img_b: np.ndarray) -> np.ndarray:
        """Two frame batches → (B, 6) pose params (axisangle, translation).
        Config 2."""
        aa, tr = self._pose_fn(self.params, jnp.asarray(img_a), jnp.asarray(img_b))
        return np.asarray(jnp.concatenate([aa, tr], axis=-1))

    def infer_coupled(self, img_a: np.ndarray, img_b: np.ndarray):
        """Fused depth+pose for the VO driver."""
        out = self._coupled_fn(self.params, jnp.asarray(img_a), jnp.asarray(img_b))
        return tuple(np.asarray(o) for o in out)
