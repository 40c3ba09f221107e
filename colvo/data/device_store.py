"""Device-resident snippet store (SURVEY.md component D5, TPU-native form).

The BASELINE.json north star asks that "colonoscopy sequences feed the TPU
at line rate". For corpora that fit in HBM (a 100-sequence × 100-frame
corpus at 256×320 uint8 is ~2.4 GB of a v5e's 16 GB), the strongest form
of prefetch is **residency**: upload every frame once as uint8, then
assemble batches entirely on device — index gather, uint8→f32 scale, and
color augmentation as one jitted program. The host contributes only a
(B,) index vector per step.

This matters doubly in this environment: the chip is reached through a
tunnel measured at 20–70 MB/s H2D, so per-step host batches (47 MB each)
would throttle training to ~0.5 step/s; device-resident batching restores
the 6.8 ms step.

Augmentation mirrors ``colvo.data.augment`` semantics exactly: one draw per
snippet applied identically to all its frames; photometric jitter applied
to the network-input copy only; horizontal flip applied to both (geometric
change; K has centered principal point, SURVEY.md D4).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colvo.config import DataConfig


def _rgb_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]


def device_augment(frames: jnp.ndarray, key: jax.Array, cfg: DataConfig):
    """On-device mirror of ``augment_snippet``: (B, F, H, W, 3) → (aug, clean)."""
    b = frames.shape[0]
    k_flip, k_b, k_c, k_s, k_h = jax.random.split(key, 5)

    if cfg.hflip:
        flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        clean = jnp.where(flip[:, None, None, None, None], frames[:, :, :, ::-1], frames)
    else:
        clean = frames

    out = clean
    shape = (b, 1, 1, 1, 1)
    if cfg.brightness > 0:
        out = out * jax.random.uniform(
            k_b, shape, minval=1 - cfg.brightness, maxval=1 + cfg.brightness
        )
    if cfg.contrast > 0:
        mean = jnp.mean(out, axis=(-3, -2, -1), keepdims=True)
        out = (out - mean) * jax.random.uniform(
            k_c, shape, minval=1 - cfg.contrast, maxval=1 + cfg.contrast
        ) + mean
    if cfg.saturation > 0:
        gray = _rgb_to_gray(out)
        out = gray + (out - gray) * jax.random.uniform(
            k_s, shape, minval=1 - cfg.saturation, maxval=1 + cfg.saturation
        )
    if cfg.hue > 0:
        shift = jax.random.uniform(k_h, shape, minval=-cfg.hue, maxval=cfg.hue)
        out = out + shift * (jnp.roll(out, 1, axis=-1) - out)
    return jnp.clip(out, 0.0, 1.0), clean


class DeviceSnippetStore:
    """All frames pinned to HBM as uint8; batches assembled on device.

    Args:
        sequences: list of (N, H, W, 3) float [0,1] or uint8 arrays.
        intrinsics: list of (3, 3) K (one per sequence; must be equal for
            on-device batching — one K per batch is the contract).
        frame_offsets: source-frame offsets (SnippetDataset convention).
        sharding: optional batch sharding for the assembled batch (DP).
    """

    def __init__(
        self,
        sequences: Sequence[np.ndarray],
        intrinsics: Sequence[np.ndarray],
        frame_offsets: Tuple[int, ...] = (-1, 1),
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        ks = np.stack([np.asarray(k, np.float32) for k in intrinsics])
        if not np.allclose(ks, ks[0:1], atol=1e-5):
            raise ValueError("DeviceSnippetStore requires a single shared K")
        self.k = jnp.asarray(ks[0])

        frames_u8 = []
        table = []
        base = 0
        lo = min(0, *frame_offsets)
        hi = max(0, *frame_offsets)
        for seq in sequences:
            seq = np.asarray(seq)
            if seq.dtype != np.uint8:
                seq = (np.clip(seq, 0, 1) * 255).round().astype(np.uint8)
            n = len(seq)
            frames_u8.append(seq)
            for t in range(-lo, n - hi):
                table.append([base + t] + [base + t + o for o in frame_offsets])
            base += n
        self.frames = jnp.asarray(np.concatenate(frames_u8))  # (T, H, W, 3) u8
        self.table = jnp.asarray(np.asarray(table, np.int32))  # (S, F)
        self.n_snippets = len(table)
        self.sharding = sharding

        @jax.jit
        def _assemble(frames, table, idx):
            snippet_frames = frames[table[idx]]  # (B, F, H, W, 3) u8
            return snippet_frames.astype(jnp.float32) / 255.0

        self._assemble = _assemble

    def batches(
        self, cfg: DataConfig, seed: int = 0, epochs: Optional[int] = None
    ) -> Iterator[dict]:
        """Yield device-resident {frames, frames_clean, k} batches.

        Host work per step: drawing B int32 indices. Everything else —
        gather, dtype scale, augmentation — is one jitted device program.
        """
        rng = np.random.default_rng(seed)
        key = jax.random.key(seed)
        bsz = cfg.batch_size

        augment_fn = jax.jit(partial(device_augment, cfg=cfg))

        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(self.n_snippets)
            for start in range(0, self.n_snippets - bsz + 1, bsz):
                idx = jnp.asarray(order[start : start + bsz].astype(np.int32))
                clean = self._assemble(self.frames, self.table, idx)
                if self.sharding is not None:
                    # concrete array outside jit → device_put redistributes
                    clean = jax.device_put(clean, self.sharding)
                if cfg.augment:
                    key, sub = jax.random.split(key)
                    aug, clean = augment_fn(clean, sub)
                else:
                    aug = clean
                yield {"frames": aug, "frames_clean": clean, "k": self.k}
            epoch += 1
