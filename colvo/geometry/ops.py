"""Projective-geometry ops (SURVEY.md components G1, G3, G4, G5, M5).

Pure-XLA implementations, NHWC layout (TPU-native), fully batched, no
data-dependent shapes. These are the semantics contract for the fused
Pallas kernels in ``colvo.kernels`` (SURVEY.md §2.7 K3: "pure-XLA versions
… kernels must match them bit-tolerantly").

Conventions
-----------
* images:  (B, H, W, C) float
* depth:   (B, H, W) float, metric
* K:       (..., 3, 3) pinhole intrinsics in pixels; ``K_inv`` its inverse
* T:       (..., 4, 4) rigid transform target-cam → source-cam
* pixel coords: ``x`` = column index, ``y`` = row index, origin top-left.

No reference code exists (SURVEY.md §0); semantics follow the family
standard (Monodepth2 ``layers.py``: BackprojectDepth / Project3D /
``F.grid_sample(align_corners=True, padding_mode='border')``), which the
torch-golden tests in ``tests/test_geometry.py`` pin down (SURVEY.md §4.1).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def disp_to_depth(
    disp: jnp.ndarray, min_depth: float = 0.1, max_depth: float = 100.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sigmoid disparity → (scaled_disp, depth) (SURVEY.md M5).

    ``depth = 1 / (1/max_depth + (1/min_depth − 1/max_depth)·disp)`` so that
    disp∈[0,1] maps to depth∈[max_depth, min_depth]. Colon-scale defaults are
    set in ``colvo.config``.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


def depth_to_disp(
    depth: jnp.ndarray, min_depth: float = 0.1, max_depth: float = 100.0
) -> jnp.ndarray:
    """Inverse of :func:`disp_to_depth` (used by eval fixtures)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    return (1.0 / depth - min_disp) / (max_disp - min_disp)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid (H, W, 3): rows of (x, y, 1).

    A compile-time constant under jit — XLA folds it (SURVEY.md G1
    "homogeneous pixel grid cached").
    """
    x = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    y = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def backproject(depth: jnp.ndarray, k_inv: jnp.ndarray) -> jnp.ndarray:
    """Depth map → per-pixel 3D camera-frame points (G1).

    Args:
        depth: (B, H, W) metric depth.
        k_inv: (3, 3) or (B, 3, 3) inverse intrinsics.

    Returns:
        (B, H, W, 3) camera-frame points ``depth · K⁻¹ · (x, y, 1)ᵀ``.
    """
    b, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype)  # (H, W, 3)
    if k_inv.ndim == 2:
        rays = jnp.einsum("ij,hwj->hwi", k_inv, grid)[None]  # (1, H, W, 3)
    else:
        rays = jnp.einsum("bij,hwj->bhwi", k_inv, grid)
    return depth[..., None] * rays


def project(
    points: jnp.ndarray, k: jnp.ndarray, t_mat: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transform cam points by T and project through K (G3).

    Args:
        points: (B, H, W, 3) camera-frame points of the target frame.
        k: (3, 3) or (B, 3, 3) intrinsics.
        t_mat: (B, 4, 4) target-cam → source-cam transform.

    Returns:
        ``(pix, z)``: (B, H, W, 2) source-pixel coords (x, y) and
        (B, H, W) the projected z-depth in the source camera (the
        "computed depth" used by the geometric-consistency loss, G5).
    """
    rot = t_mat[..., :3, :3]
    trans = t_mat[..., :3, 3]
    cam = jnp.einsum("bij,bhwj->bhwi", rot, points) + trans[:, None, None, :]
    if k.ndim == 2:
        uvw = jnp.einsum("ij,bhwj->bhwi", k, cam)
    else:
        uvw = jnp.einsum("bij,bhwj->bhwi", k, cam)
    z = uvw[..., 2]
    # Family standard: small epsilon guard on the divide (Monodepth2 uses 1e-7).
    pix = uvw[..., :2] / (z[..., None] + 1e-7)
    return pix, z


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling at pixel coords with border padding (G4).

    The TPU-friendly XLA fallback for the family's ``F.grid_sample``:
    four flat gathers via ``take_along_axis`` (lowered to a single fused
    dynamic-gather per corner) + VPU lerp. The Pallas kernel K1 replaces
    this inside the fused loss.

    Args:
        img: (B, H, W, C) source image.
        coords: (B, h, w, 2) sampling positions (x, y) in pixel units.

    Returns:
        (B, h, w, C) sampled values. Out-of-range coords clamp to border
        (``padding_mode='border'`` semantics).
    """
    b, h, w, c = img.shape
    x = coords[..., 0]
    y = coords[..., 1]

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]

    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)

    flat = img.reshape(b, h * w, c)

    def gather(yy, xx):
        idx = (yy * w + xx).reshape(b, -1, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(coords.shape[:-1] + (c,))

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    top = v00 + wx * (v01 - v00)
    bot = v10 + wx * (v11 - v10)
    return top + wy * (bot - top)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """``F.grid_sample(align_corners=True, padding_mode='border')`` clone.

    Args:
        img: (B, H, W, C). grid: (B, h, w, 2) normalized coords in [−1, 1],
        last dim (x, y).

    Torch-golden parity is asserted in tests (SURVEY.md §4.1).
    """
    _, h, w, _ = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    return bilinear_sample(img, jnp.stack([x, y], axis=-1))


def _valid_mask(pix: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(B, h, w) float mask: 1 where the sample lands inside the source.

    A 1e-3-pixel tolerance absorbs float32 round-trip jitter at the exact
    border (identity warp must yield an all-ones mask).
    """
    eps = 1e-3
    x, y = pix[..., 0], pix[..., 1]
    inside = (x >= -eps) & (x <= width - 1 + eps) & (y >= -eps) & (y <= height - 1 + eps)
    return inside.astype(pix.dtype)


def inverse_warp(
    src_img: jnp.ndarray,
    depth: jnp.ndarray,
    t_mat: jnp.ndarray,
    k: jnp.ndarray,
    k_inv: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reconstruct the target frame by sampling the source (G4).

    backproject(G1) → transform+project(G3) → bilinear_sample. Returns
    ``(warped, valid_mask)`` with warped (B, H, W, C) and mask (B, H, W).
    The ``/root/reference/README.md:7`` "seamless alignment of geometric
    projections between consecutive frames" path.
    """
    points = backproject(depth, k_inv)
    pix, z = project(points, k, t_mat)
    warped = bilinear_sample(src_img, pix)
    mask = _valid_mask(pix, src_img.shape[1], src_img.shape[2]) * (z > 0)
    return warped, mask


def reproject_depth(
    src_depth: jnp.ndarray,
    tgt_depth: jnp.ndarray,
    t_mat: jnp.ndarray,
    k: jnp.ndarray,
    k_inv: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cross-frame depth reprojection for the DCDP geometric constraint (G5).

    Returns ``(computed_depth, sampled_src_depth, valid_mask)``:
    ``computed_depth`` is the target depth transformed into the source
    camera's z (what the source *should* see), ``sampled_src_depth`` is the
    source depth map warped to the target grid. Their disagreement is the
    SC-Depth-style geometric-consistency residual (SURVEY.md L5;
    /root/reference/README.md:7 "alignment of geometric projections").
    """
    points = backproject(tgt_depth, k_inv)
    pix, z = project(points, k, t_mat)
    sampled = bilinear_sample(src_depth[..., None], pix)[..., 0]
    mask = _valid_mask(pix, src_depth.shape[1], src_depth.shape[2]) * (z > 0)
    return z, sampled, mask
