"""Photometric loss + LCC calibration (SURVEY.md components L1, L2).

* ``ssim`` / ``photometric_error``: the family-standard
  ``α·(1−SSIM)/2 + (1−α)·L1`` with α = 0.85, SSIM over 3×3 local windows
  (Monodepth2 ``layers.py:SSIM`` behavioral equivalent; torch-golden tested).
* ``lcc_calibrate``: the reference's Light Consistent Calibration —
  "accounts for brightness variations by recalibrating the luminosity
  values of adjacent frames" (/root/reference/README.md:7). The exact
  formula is unspecified in the reference (SURVEY.md §7 hard part 2); the
  behavioral contract implemented here is: applying a brightness/contrast
  ramp to the source frame leaves the calibrated photometric loss ≈
  unchanged (the LCC invariance test, SURVEY.md §4.3).

Everything is windowed local statistics → depthwise avg-pools → fuses into
a handful of XLA reduce-windows; the Pallas kernel K1 fuses this whole file
with the warp.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _box_sum_1d(x: jnp.ndarray, window: int, axis: int) -> jnp.ndarray:
    """SAME-padded 1-D box sum via unrolled shifted adds.

    ``window`` shifted slices summed as one fused elementwise expression.
    On TPU this is decisively faster than the O(1)-adds prefix-sum
    formulation: ``cumsum`` along the lane/sublane axes lowers to
    log-depth shift networks with vector relayouts, measured ~5× slower
    fwd+grad even at window 15 (2.3 ms vs 11.8 ms for the full SSIM+LCC
    stat stack at B=12 256×320 — timed with the serial-chain protocol,
    scripts/bench_train.py docstring). Shift-add also lowers well on the
    CPU test backend, unlike reduce_window / wide depthwise convs."""
    # Composite odd windows factor hierarchically: box_{a·b} =
    # dilated-box_b(dilation=a) ∘ box_a — a+b shifted adds instead of a·b
    # (window 15 → 3+5=8). The dilated taps at offsets m·a each cover a
    # contiguous box_a span, tiling the full window exactly (same sum, only
    # the f32 association order differs).
    for a in (3, 5, 7):
        if window > a and window % a == 0 and (window // a) % 2 == 1:
            b = window // a
            lo = (window - 1) // 2
            pad = [(0, 0)] * x.ndim
            pad[axis] = (lo, lo)
            # Inner box on the PRE-padded array: outer taps near the border
            # need inner sums centered outside [0, n) that still overlap
            # real data — zero-padding the inner OUTPUT would drop them.
            inner = _box_sum_1d(jnp.pad(x, pad), a, axis)
            n = x.shape[axis]
            s0 = (a - 1) // 2  # padded index of the leftmost outer tap
            out = jax.lax.slice_in_dim(inner, s0, s0 + n, axis=axis)
            for m in range(1, b):
                k = s0 + m * a
                out = out + jax.lax.slice_in_dim(inner, k, k + n, axis=axis)
            return out
    n = x.shape[axis]
    lo = (window - 1) // 2
    hi = window - 1 - lo
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    padded = jnp.pad(x, pad)
    out = jax.lax.slice_in_dim(padded, 0, n, axis=axis)
    for k in range(1, window):
        out = out + jax.lax.slice_in_dim(padded, k, k + n, axis=axis)
    return out




def _avg_pool_same(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Mean filter with SAME padding, NHWC, per-channel.

    Separable two-pass box sums (2·window adds/px instead of a window²
    depthwise conv — the 2-D depthwise conv lowering is ~7× slower on TPU,
    measured in /tmp/profile_warp.py). Border pixels normalize by the true
    window overlap; the count plane is input-independent so XLA
    constant-folds it.
    """
    summed = _box_sum_1d(_box_sum_1d(x, window, 1), window, 2)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), dtype=x.dtype)
    counts = _box_sum_1d(_box_sum_1d(ones, window, 1), window, 2)
    return summed / counts


def ssim(x: jnp.ndarray, y: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Per-pixel SSIM over local windows; returns (B, H, W, C) in [−1, 1].

    Family constants C1 = 0.01², C2 = 0.03² (images in [0, 1]).
    """
    c1, c2 = 0.01**2, 0.03**2
    mu_x = _avg_pool_same(x, window)
    mu_y = _avg_pool_same(y, window)
    sigma_x = _avg_pool_same(x * x, window) - mu_x * mu_x
    sigma_y = _avg_pool_same(y * y, window) - mu_y * mu_y
    sigma_xy = _avg_pool_same(x * y, window) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return num / den


def photometric_error(
    pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.85
) -> jnp.ndarray:
    """``α·(1−SSIM)/2 + (1−α)·L1`` per pixel, mean over channels → (B, H, W)."""
    l1 = jnp.mean(jnp.abs(pred - target), axis=-1)
    if alpha == 0.0:
        return l1
    s = jnp.mean(ssim(pred, target), axis=-1)
    return alpha * 0.5 * (1.0 - s) + (1.0 - alpha) * l1


def lcc_calibrate(
    warped: jnp.ndarray,
    target: jnp.ndarray,
    mode: str = "affine",
    window: int = 15,
    clip: Tuple[float, float] = (0.5, 2.0),
    valid_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Light Consistent Calibration (L1 in SURVEY.md §2.4): recalibrate the
    warped source frame's luminosity to the target before comparison.

    In colonoscopy the light source moves with the camera, so the same
    surface changes brightness between adjacent frames and biases raw
    photometric losses (/root/reference/README.md:7). LCC estimates a
    low-frequency luminance transform from local window statistics:

    * ``gain``:   ``ŵ = g·w``      with ``g = μ_t / μ_w``
    * ``affine``: ``ŵ = a·w + b``  with ``a = cov(w,t)/var(w)``,
                  ``b = μ_t − a·μ_w``

    The coefficients are **stop-gradiented**: the calibration adapts to the
    current frames but provides no shortcut for the networks to game the
    loss through brightness. Gain/contrast is clipped to ``clip`` so gross
    misalignments (bad pose) cannot be "calibrated away" — LCC corrects
    illumination, not geometry.

    ``global*`` modes prepend a PER-FRAME global affine: auto-exposure is
    a global nuisance (one gain per frame), and a 15 px window is the
    wrong prior for it — smooth colon surfaces give near-zero local
    variance, so the windowed contrast estimate is noise that the clip
    then freezes at the rail (measured: Abs-Rel 0.360 with windowed LCC
    vs 0.065 clean under U(0.65, 1.35) jitter — VERDICT r2 next #5).
    The global coefficients pool the whole frame per channel and get a
    WIDER clip (0.25, 4): a single scalar per frame cannot absorb
    spatial (geometric) error, so the anti-gaming rationale for the
    tight windowed clip does not apply to it.

    * ``global``:        per-frame global affine only
    * ``global+affine``: global affine, then windowed affine (residual
                         low-frequency falloff)
    * ``global+gain``:   global affine, then windowed gain

    ``valid_mask`` (optional, (B, H, W) or (B, H, W, 1)): the global
    moments pool every pixel of the warped frame, including out-of-frame
    samples the bilinear sampler border-clamps; for large motions that
    invalid fraction biases the per-frame ga/gb applied to the valid
    region. When given, the global* moments are masked means over valid
    pixels only. The windowed modes ignore it (local stats are already
    dominated by in-frame neighborhoods, and the automask/valid weighting
    downstream handles the border).
    """
    if mode == "off":
        return warped
    eps = 1e-4
    if mode.startswith("global"):
        if valid_mask is not None:
            m = valid_mask.astype(warped.dtype)
            if m.ndim == warped.ndim - 1:
                m = m[..., None]
            m = jax.lax.stop_gradient(m)
            denom = jnp.sum(m, axis=(1, 2), keepdims=True) + 1e-6

            def _gmean(x):
                return jnp.sum(x * m, axis=(1, 2), keepdims=True) / denom
        else:
            def _gmean(x):
                return jnp.mean(x, axis=(1, 2), keepdims=True)

        gmu_w = _gmean(warped)
        gmu_t = _gmean(target)
        gvar = _gmean(warped * warped) - gmu_w**2
        gcov = _gmean(warped * target) - gmu_w * gmu_t
        # tighter regularizer than the windowed eps: the global moments
        # pool the whole frame, so even a low-contrast frame's variance
        # dwarfs 1e-7 and the estimated gain is not biased low the way
        # a variance-starved 15 px window's is
        ga = jnp.clip(gcov / (gvar + 1e-7), 0.25, 4.0)
        gb = gmu_t - ga * gmu_w
        warped = jax.lax.stop_gradient(ga) * warped + jax.lax.stop_gradient(gb)
        rest = mode[len("global"):].lstrip("+")
        if not rest:
            return warped
        mode = rest
    mu_w = _avg_pool_same(warped, window)
    mu_t = _avg_pool_same(target, window)
    if mode == "gain":
        g = mu_t / (mu_w + eps)
        g = jnp.clip(g, clip[0], clip[1])
        return jax.lax.stop_gradient(g) * warped
    if mode == "affine":
        var_w = _avg_pool_same(warped * warped, window) - mu_w * mu_w
        cov = _avg_pool_same(warped * target, window) - mu_w * mu_t
        a = cov / (var_w + eps)
        a = jnp.clip(a, clip[0], clip[1])
        b = mu_t - a * mu_w
        a = jax.lax.stop_gradient(a)
        b = jax.lax.stop_gradient(b)
        return a * warped + b
    raise ValueError(f"unknown lcc mode {mode!r}")
