"""Regularizer and consistency loss terms (SURVEY.md components L3–L5)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def smoothness_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware, mean-normalized disparity smoothness (L4).

    ``Σ |∂d̂| · exp(−|∂I|)`` with ``d̂ = d / mean(d)`` — the family standard
    since SfMLearner (SURVEY.md §2.4 L4). disp (B, H, W, 1), img (B, H, W, 3).
    """
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    norm_disp = disp / (mean_disp + 1e-7)

    grad_x = jnp.abs(norm_disp[:, :, 1:] - norm_disp[:, :, :-1])
    grad_y = jnp.abs(norm_disp[:, 1:, :] - norm_disp[:, :-1, :])

    img_gx = jnp.mean(jnp.abs(img[:, :, 1:] - img[:, :, :-1]), axis=-1, keepdims=True)
    img_gy = jnp.mean(jnp.abs(img[:, 1:, :] - img[:, :-1, :]), axis=-1, keepdims=True)

    grad_x = grad_x * jnp.exp(-img_gx)
    grad_y = grad_y * jnp.exp(-img_gy)
    return jnp.mean(grad_x) + jnp.mean(grad_y)


def geometry_consistency(
    computed_depth: jnp.ndarray,
    sampled_depth: jnp.ndarray,
    valid: jnp.ndarray,
    behind: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DCDP cross-frame depth-consistency residual (L5).

    ``diff = |D_computed − D_sampled| / (D_computed + D_sampled)`` on valid
    pixels — the SC-Depth formulation the reference's "alignment of
    geometric projections" claim pins to (/root/reference/README.md:7,
    SURVEY.md §2.4 L5). Returns ``(loss_scalar, weight_mask)`` where
    ``weight_mask = 1 − diff`` downweights inconsistent (dynamic/occluded)
    pixels in the photometric loss.

    ``behind`` marks pixels whose transformed depth is non-positive
    (behind the source camera). They count as MAXIMAL inconsistency
    (diff = 1) rather than dropping out of ``valid``: the masked mean has
    a degenerate minimum at "everything invalid" (measured: the uncapped
    full-res geo gradient drives depth→min / translation→large within 20
    steps until every point has z<0 and the loss cliff-drops to exactly
    0). Scoring behind-camera pixels at the clip ceiling removes the
    cliff — the loss is continuous (→1) as z→0⁺, so the escape is never
    downhill. Out-of-frame pixels keep ignore semantics via ``valid``
    (legitimate border motion must not be penalized).

    The restoring *slope* (1 + |z|/s, monotone in how far behind) is
    gated on the per-image behind fraction (stop-grad) exceeding 5 %.
    Measured failure without the gate: healthy training always has a few
    transient behind pixels at frame borders, and their always-on slope
    is a chronic one-way force along the monocular scale-flat direction
    (photometric + geo both constrain only the t/D ratio) — over 4k
    steps the trajectory scale drifted ~80× relative to depth, blowing
    the polyp-localization metric up from ~0.2 to ~8 (runs/ablate r2,
    cell dcdp1_lcc1). With the gate, rare behind pixels cost a CONSTANT
    1 (no gradient, no drift pressure); the slope only activates in the
    degenerate epidemic it exists to escape.
    """
    raw = computed_depth
    if behind is not None:
        # keep the diff branch finite where z≤0 (where-grad trap)
        computed_depth = jnp.where(behind, sampled_depth, computed_depth)
    diff = jnp.abs(computed_depth - sampled_depth) / (
        computed_depth + sampled_depth + 1e-7
    )
    diff = jnp.clip(diff, 0.0, 1.0)
    if behind is not None:
        # Behind pixels score 1 + |z|/s: continuous with the clip ceiling
        # at z→0 and MONOTONE in how far behind — a restoring gradient,
        # not a plateau (a flat diff=1 leaves the transient-entered
        # degenerate state with nothing pulling it back out).
        pen = jnp.minimum(1.0 - raw / (jnp.abs(sampled_depth) + 1e-7), 10.0)
        bfrac = jax.lax.stop_gradient(
            jnp.mean(
                behind.astype(diff.dtype),
                axis=tuple(range(1, behind.ndim)),
                keepdims=True,
            )
        )
        pen = jnp.where(bfrac > 0.05, pen, 1.0)
        diff = jnp.where(behind, pen, diff)
        # A behind-camera pixel's projection is meaningless, so it counts
        # toward the mean wherever it lands — otherwise the escape route
        # "huge translation → every pixel behind AND out of frame" still
        # empties the mask and cliff-drops the loss to 0.
        valid = jnp.maximum(valid, behind.astype(diff.dtype))
    diff = diff * valid
    loss = jnp.sum(diff) / (jnp.sum(valid) + 1e-7)
    weight = jnp.clip(1.0 - diff, 0.0, 1.0) * valid
    return loss, weight


def min_reprojection(errors: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel min over source-frame errors (L3): (B, H, W, S) → (B, H, W).

    Handles occlusion/out-of-view: each pixel is scored by the source that
    explains it best (Monodepth2's key trick; the "baseline" row of
    ``imgs/qualitativeresults.png``)."""
    return jnp.min(errors, axis=-1)


def automask(
    warped_errors: jnp.ndarray, identity_errors: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stationary-pixel automasking (L3).

    Pixels where the *unwarped* source already matches the target better
    than the warped one (static camera, low parallax, moving-with-camera
    content) are excluded. A tiny constant bias (1e-5) on the identity
    errors breaks exact ties toward the warped branch deterministically
    (the family adds random noise; determinism is a design goal here,
    SURVEY.md §5.2).

    Args:  both (B, H, W, S).
    Returns: ``(combined_min_error, mask)`` — per-pixel min over the warped
    errors and the float mask (1 = keep).
    """
    min_warped = jnp.min(warped_errors, axis=-1)
    min_identity = jnp.min(identity_errors, axis=-1) + 1e-5
    mask = (min_warped < min_identity).astype(min_warped.dtype)
    return min_warped, mask
