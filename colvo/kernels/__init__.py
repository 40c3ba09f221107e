"""Pallas TPU kernel layer (SURVEY.md §2.7, components K1–K3).

``bilinear_sample_fast`` picks the Pallas kernel on TPU and the pure-XLA
fallback elsewhere (K3 contract: bit-tolerant parity, tests §4.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colvo.geometry.ops import bilinear_sample as bilinear_sample_xla
from colvo.kernels.sampler import (
    LANES,
    bilinear_sample_pallas,
    bilinear_sample_pallas_grouped,
)
from colvo.kernels.scatter import bilinear_sample_fullgrad


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def bilinear_sample_fast(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling; Pallas on TPU, XLA fallback on CPU/GPU.

    Gradients flow to ``coords`` only on the Pallas path (see
    colvo.kernels.sampler docstring); use ``bilinear_sample_xla`` when the
    source image itself needs a gradient (depth-map warps in the
    geometric-consistency loss).
    """
    h, w = img.shape[1], img.shape[2]
    if _on_tpu() and w >= LANES and h >= 8:
        return bilinear_sample_pallas(img, coords)
    return bilinear_sample_xla(img, coords)


def bilinear_sample_fast_grouped(
    img: jnp.ndarray, coords: jnp.ndarray, group: int
) -> jnp.ndarray:
    """``group`` coordinate fields per source plane in one sampler launch.

    coords (B·group, h, w, 2) ordered scale-minor — plane ``i`` samples
    ``img[i // group]``. Pallas on TPU; the XLA fallback repeats the
    source along batch (identical math — parity in tests/test_kernels.py).
    Gradients flow to ``coords`` only on the Pallas path.
    """
    h, w = img.shape[1], img.shape[2]
    if _on_tpu() and w >= LANES and h >= 8:
        return bilinear_sample_pallas_grouped(img, coords, group)
    return bilinear_sample_xla(jnp.repeat(img, group, axis=0), coords)


def warp_photometric_fast(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    coords: jnp.ndarray,
    lcc_mode: str,
    lcc_window: int,
    alpha: float,
) -> jnp.ndarray:
    """Fused warp+LCC+SSIM+L1 per-pixel error map (K1).

    Single Pallas kernel on TPU for the supported configs (LCC affine or
    off, SSIM on) — no warped frame or window statistic ever touches HBM
    (colvo.kernels.fused_loss); the composed XLA pipeline elsewhere.
    Gradients flow to ``coords`` only (frames are data in the loss).
    """
    h, w = src.shape[1], src.shape[2]
    supported = lcc_mode in ("affine", "off") and alpha > 0.0
    if _on_tpu() and supported and w >= LANES and h >= 8:
        from colvo.kernels.fused_loss import warp_photometric_pallas

        window = lcc_window if lcc_mode == "affine" else 0
        return warp_photometric_pallas(src, tgt, coords, window, alpha)
    # composed fallback (identical math; parity pinned in tests)
    from colvo.losses.photometric import lcc_calibrate, photometric_error

    warped = bilinear_sample_fast(src, coords)
    if lcc_mode != "off":
        warped = lcc_calibrate(warped, tgt, lcc_mode, lcc_window)
    return photometric_error(warped, tgt, alpha)


def bilinear_sample_full(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with gradients to coords AND source image.

    Pallas on TPU (offset-class scatter backward, colvo.kernels.scatter —
    XLA's serialized scatter-add costs +172 ms/step at the uncapped geo
    protocol, scripts/bench_decompose.py); XLA autodiff elsewhere. Exact
    parity pinned in tests/test_kernels.py.
    """
    if _on_tpu():
        return bilinear_sample_fullgrad(img, coords)
    return bilinear_sample_xla(img, coords)


__all__ = [
    "bilinear_sample_fast",
    "bilinear_sample_fast_grouped",
    "bilinear_sample_full",
    "bilinear_sample_fullgrad",
    "bilinear_sample_pallas",
    "bilinear_sample_xla",
    "warp_photometric_fast",
    "LANES",
]
