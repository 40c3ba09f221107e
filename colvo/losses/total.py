"""Multi-scale total training loss (SURVEY.md component L6, call stack §3.1).

Wires the whole DCDP+LCC objective over a snippet: for each scale and each
source frame — disp→depth, backproject, SE(3), project, bilinear warp
(G1–G4), LCC calibration (L1), SSIM+L1 (L2) — then min-reprojection +
automask (L3), edge-aware smoothness (L4), and the geometric-consistency
constraint (L5). Follows the Monodepth2 multi-scale protocol: every scale's
disparity is upsampled to full resolution and the loss is computed at full
resolution (SURVEY.md §2.4 L6).

The hot bilinear warps route through ``colvo.kernels.bilinear_sample_fast``
(Pallas on TPU, XLA fallback elsewhere); sampling that needs source-image
gradients (the default geometric-consistency protocol) uses the XLA
sampler on a capped grid (``loss.geo_res_cap``).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import chex
import jax
import jax.numpy as jnp

from colvo.config import LossConfig, ModelConfig
from colvo.geometry import (
    disp_to_depth,
    transformation_from_parameters,
    backproject,
    project,
    bilinear_sample,
)
from colvo.geometry.ops import _valid_mask
from colvo.kernels import (
    bilinear_sample_fast,
    bilinear_sample_fast_grouped,
    bilinear_sample_full,
    warp_photometric_fast,
)
from colvo.losses.photometric import lcc_calibrate, photometric_error
from colvo.losses.terms import automask as automask_fn
from colvo.losses.terms import geometry_consistency, smoothness_loss
from colvo.models.depth_decoder import upsample_nearest


def _scale_k(k: jnp.ndarray, sx: float, sy: float) -> jnp.ndarray:
    """Rescale (…, 3, 3) intrinsics for a resized grid (in-graph)."""
    s = jnp.array([sx, sy, 1.0], k.dtype)
    return k * s[:, None]


def _halve(x: jnp.ndarray) -> jnp.ndarray:
    """2× mean-pool on a (B, H, W, C) map (reshape-mean — no gather)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _upsample_to(disp: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Nearest-upsample a lower-scale disparity to full resolution."""
    factor = height // disp.shape[1]
    if factor == 1:
        return disp
    return upsample_nearest(disp, factor)


def poses_to_transforms(
    poses: jnp.ndarray, frame_offsets: Tuple[int, ...]
) -> jnp.ndarray:
    """(B, S, 6) raw pose params → (B, S, 4, 4) target→source transforms.

    The network always sees (target, source) input order and its output is
    interpreted directly as target→source — symmetric for past and future
    sources. (Deviation from the family's temporal-order + invert trick,
    chosen for SPMD simplicity; ablatable via training since direction is
    learned, documented per SURVEY.md §7 hard part 6.)
    """
    del frame_offsets
    aa, tr = poses[..., :3], poses[..., 3:]
    return transformation_from_parameters(aa, tr)


def snippet_loss(
    disps: List[Dict[int, jnp.ndarray]],
    poses: jnp.ndarray,
    frames: jnp.ndarray,
    k: jnp.ndarray,
    k_inv: jnp.ndarray,
    loss_cfg: LossConfig,
    model_cfg: ModelConfig,
    frames_clean: jnp.ndarray | None = None,
    geo_scale: jnp.ndarray | float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total self-supervised loss over one snippet batch.

    Args:
        disps: per-frame multi-scale disparities from ``ColVOModel``
            (index 0 = target frame).
        poses: (B, S, 6) target→source pose params (S = n_frames − 1).
        frames: (B, 1+S, H, W, 3) augmented network-input frames.
        k / k_inv: (3, 3) intrinsics at full resolution.
        frames_clean: un-jittered copies for the photometric comparison
            (Monodepth2 protocol, SURVEY.md D4); defaults to ``frames``.

    Returns:
        (scalar loss, aux dict of per-term scalars + full-res depth).
    """
    # Trace-time input contract (SURVEY.md §5.2 — chex shape assertions).
    if loss_cfg.geo_grad not in ("both", "sym"):
        raise ValueError(
            f"loss.geo_grad must be 'both' or 'sym', got {loss_cfg.geo_grad!r}"
        )
    if loss_cfg.geo_grad == "sym" and loss_cfg.geo_full_res:
        raise ValueError(
            "loss.geo_grad='sym' is only defined for the native-scale "
            "protocol (geo_full_res=False); the full-res path would "
            "silently fall back to 'both' semantics"
        )
    if loss_cfg.photo_native and loss_cfg.geo_full_res:
        raise ValueError(
            "loss.photo_native (scale-native photometric) contradicts "
            "loss.geo_full_res (full-res geometry) — pick one protocol"
        )
    if loss_cfg.photo_native and loss_cfg.batched_photo:
        raise ValueError(
            "loss.batched_photo stacks shape-identical full-res "
            "evaluations; incompatible with loss.photo_native"
        )
    if loss_cfg.fused_kernel and loss_cfg.batched_photo:
        raise ValueError(
            "loss.fused_kernel and loss.batched_photo are alternative "
            "launch-reduction strategies for the same photometric path — "
            "pick one (the batched path routes through the grouped "
            "sampler, not K1)"
        )
    if loss_cfg.fused_kernel and loss_cfg.compute_dtype not in ("", "float32"):
        # The fused K1 kernel computes every photometric plane in-kernel in
        # f32; the compute_dtype diet would apply only to the identity/
        # automask planes — a silent half-application (ADVICE r4).
        raise ValueError(
            "loss.compute_dtype is not supported with loss.fused_kernel "
            "(the fused kernel's planes are f32 in VMEM; the knob would "
            "apply only to identity/automask stacks)"
        )
    chex.assert_rank(frames, 5)
    chex.assert_rank(poses, 3)
    chex.assert_axis_dimension(poses, -1, 6)
    chex.assert_axis_dimension(poses, 1, frames.shape[1] - 1)
    if frames_clean is None:
        frames_clean = frames
    b, n_frames, height, width, _ = frames.shape
    n_sources = n_frames - 1
    tgt_clean = frames_clean[:, 0]

    t_mats = poses_to_transforms(poses, ())  # (B, S, 4, 4)

    # Photometric-plane dtype diet (config.py loss.compute_dtype): every
    # comparison plane downstream of the f32 bilinear gather — LCC/SSIM
    # stats, err maps, identity/automask stacks — runs and stores in cdt;
    # geometry and the final reductions stay f32.
    if loss_cfg.compute_dtype not in ("", "float32", "bfloat16"):
        # float16 is rejected on purpose: measured NaN gradients through
        # the SSIM backward (den ~1e-3 squared in the VJP exceeds f16
        # range on this loss); bf16's f32-width exponent is immune.
        raise ValueError(
            "loss.compute_dtype must be ''|float32|bfloat16, "
            f"got {loss_cfg.compute_dtype!r}"
        )
    cdt = (
        None
        if loss_cfg.compute_dtype in ("", "float32")
        else jnp.dtype(loss_cfg.compute_dtype)
    )
    _c = (lambda x: x.astype(cdt)) if cdt is not None else (lambda x: x)

    # Frame pyramids for the scale-native protocol (photo_native): the
    # photometric comparison at scale s uses 2^s-mean-pooled frames, so
    # warp + LCC + SSIM bytes shrink 4× per scale (the step is
    # bandwidth-bound; VERDICT r2 next #1). pyr[0] is the full-res frame.
    if loss_cfg.photo_native:
        tgt_pyr = [tgt_clean]
        src_pyr = [[frames_clean[:, s + 1] for s in range(n_sources)]]
        for _ in range(model_cfg.n_scales - 1):
            tgt_pyr.append(_halve(tgt_pyr[-1]))
            src_pyr.append([_halve(x) for x in src_pyr[-1]])

    # Identity (unwarped) errors for automasking — scale-independent under
    # the full-res protocol; per-scale pyramid errors under photo_native.
    # ``lcc_identity``: calibrate the identity source the same way the
    # warped source is calibrated, so the automask comparison is fair
    # under per-frame exposure changes (config.py note).
    lcc_mode = (
        loss_cfg.lcc_mode if loss_cfg.lcc and loss_cfg.lcc_mode != "off"
        else "off"
    )

    def _ident_src(src_f, tgt_f):
        if loss_cfg.lcc_identity and lcc_mode != "off":
            return _c(lcc_calibrate(src_f, tgt_f, lcc_mode, loss_cfg.lcc_window))
        return _c(src_f)

    if loss_cfg.automask:
        if loss_cfg.photo_native:
            identity_pyr = [
                jnp.stack(
                    [
                        photometric_error(
                            _ident_src(src_pyr[sc][s], tgt_pyr[sc]),
                            _c(tgt_pyr[sc]), loss_cfg.ssim_alpha)
                        for s in range(n_sources)
                    ],
                    axis=-1,
                )
                for sc in range(model_cfg.n_scales)
            ]
        else:
            identity_errors = jnp.stack(
                [
                    photometric_error(
                        _ident_src(frames_clean[:, s + 1], tgt_clean),
                        _c(tgt_clean), loss_cfg.ssim_alpha)
                    for s in range(n_sources)
                ],
                axis=-1,
            )

    n_scales = model_cfg.n_scales
    total = 0.0
    aux: Dict[str, jnp.ndarray] = {}
    photo_total = 0.0
    smooth_total = 0.0
    geo_total = 0.0
    full_depth = None

    # -------- projection pass: per-scale geometry (cheap matmul/elementwise)
    # Under photo_native the projection lives on each scale's own grid
    # (scale-local disparity, rescaled K); depth_all keeps the per-scale
    # target depth so the geometric-consistency path reuses this exact
    # projection instead of recomputing it.
    pix_all: List[List[jnp.ndarray]] = []  # [scale][source] (B, h_s, w_s, 2)
    z_all: List[List[jnp.ndarray]] = []
    depth_all: List[jnp.ndarray] = []
    for scale in range(n_scales):
        if loss_cfg.photo_native:
            disp_n = disps[0][scale]
            h_s, w_s = disp_n.shape[1], disp_n.shape[2]
            k_s = _scale_k(k, w_s / width, h_s / height)
            _, depth = disp_to_depth(
                disp_n[..., 0], model_cfg.min_depth, model_cfg.max_depth
            )
            cam_points = backproject(depth, jnp.linalg.inv(k_s))
        else:
            disp_full = _upsample_to(disps[0][scale], height, width)
            k_s = k
            _, depth = disp_to_depth(
                disp_full[..., 0], model_cfg.min_depth, model_cfg.max_depth
            )
            cam_points = backproject(depth, k_inv)  # (B, H, W, 3)
        if scale == 0:
            full_depth = depth
        depth_all.append(depth)
        pix_all.append([])
        z_all.append([])
        for s in range(n_sources):
            pix, z = project(cam_points, k_s, t_mats[:, s])
            pix_all[scale].append(pix)
            z_all[scale].append(z)

    # -------- photometric pass. ``batched_photo`` stacks all
    # n_scales x n_sources full-res warp+LCC+SSIM+L1 evaluations (the
    # Monodepth2 protocol makes them shape-identical) into ONE sampler
    # call + ONE stats pipeline: fewer, larger kernels for the hottest
    # loss path instead of 8 small fusion islands. Identical math to the
    # per-pair loop (asserted in tests/test_losses.py).
    err_lookup: Dict[Tuple[int, int], jnp.ndarray] = {}

    def _stats_err(warped, tgt_f, vmask=None):
        if lcc_mode != "off":
            warped = lcc_calibrate(warped, tgt_f, lcc_mode, loss_cfg.lcc_window,
                                   valid_mask=vmask)
        return photometric_error(warped, tgt_f, loss_cfg.ssim_alpha)

    # photo_remat: the stats pipeline (LCC window stats + SSIM moments)
    # saves ~a dozen full-res planes for its VJP; rematerializing it
    # trades that HBM traffic for VPU recompute. The warp stays OUTSIDE
    # the scope — `warped` is this function's input — so the Pallas
    # sampler never re-runs in the backward pass.
    if loss_cfg.photo_remat:
        _stats_err = jax.checkpoint(_stats_err)

    def photometric_of(src_f, tgt_f, pix_f):
        if loss_cfg.fused_kernel:
            # K1: one Pallas kernel for warp+LCC+SSIM+L1 on TPU — no
            # warped frame or window statistic materialized to HBM;
            # frames are data, gradients flow through `pix` only.
            return warp_photometric_fast(
                src_f, tgt_f, pix_f,
                lcc_mode, loss_cfg.lcc_window, loss_cfg.ssim_alpha,
            )
        # The gather stays f32 (Mosaic 32-bit lane constraint); the cast
        # fuses into its consumers, so the stats/residual planes are cdt.
        warped = _c(bilinear_sample_fast(src_f, pix_f))
        tgt_f = _c(tgt_f)
        if lcc_mode.startswith("global"):
            # Global LCC moments must not pool border-clamped out-of-frame
            # samples (they bias the per-frame gain for large motions).
            vmask = _valid_mask(pix_f, pix_f.shape[1], pix_f.shape[2])
            return _stats_err(warped, tgt_f, vmask)
        return _stats_err(warped, tgt_f)

    if loss_cfg.batched_photo:
        # ONE grouped sampler launch for all n_scales × n_sources full-res
        # warps. No tiled copies are staged (the round-2 implementation
        # jnp.tile'd sources+target — ~220 MB/step of pure staging traffic
        # that made the batch a measured loss): the kernel's source
        # index_map re-reads each source plane from its original buffer
        # (scale-minor coord order keeps it VMEM-resident across its
        # n_scales warps), and the target enters the stats pipeline by
        # vmap broadcast, fused into its consumers.
        src_one = jnp.concatenate(
            [frames_clean[:, s + 1] for s in range(n_sources)]
        )  # (S*B, H, W, 3); plane j = s*B + bi
        pix_grp = jnp.stack(
            [
                jnp.concatenate(
                    [pix_all[sc][s] for s in range(n_sources)]
                )  # (S*B, H, W, 2)
                for sc in range(n_scales)
            ],
            axis=1,
        )  # (S*B, n_scales, H, W, 2) — scale-minor after the flatten
        pix_flat = pix_grp.reshape(-1, height, width, 2)
        warped = _c(bilinear_sample_fast_grouped(src_one, pix_flat, n_scales))
        tgt_c = _c(tgt_clean)
        wg = warped.reshape(n_sources, b, n_scales, height, width, 3)

        if lcc_mode.startswith("global"):
            vm = _valid_mask(pix_flat, height, width).reshape(
                n_sources, b, n_scales, height, width
            )
            per_pair = lambda w1, v1: _stats_err(w1, tgt_c, v1)
            err_g = jax.vmap(jax.vmap(per_pair, in_axes=(1, 1)),
                             in_axes=(0, 0))(wg, vm)
        else:
            per_pair = lambda w1: _stats_err(w1, tgt_c)
            err_g = jax.vmap(jax.vmap(per_pair, in_axes=1), in_axes=0)(wg)
        for sc in range(n_scales):
            for s in range(n_sources):
                err_lookup[(sc, s)] = err_g[s, sc]

    for scale in range(n_scales):
        disp_s = disps[0][scale]

        def _geo_grid(s, scale=scale, disp_s=disp_s):
            """Geo-constraint grid for one (scale, source):
            (pix_g, z_g, src_depth_g, depth_g, h_g, w_g).

            Protocol branches (family full-res / photo_native reuse /
            native-scale with optional ``geo_res_cap`` pooling) as
            documented on the config knobs; the native-scale default
            evaluates the constraint on each scale's own grid — 4–64×
            less warp work at scales 1–3 (the XLA-era full-res
            gather+scatter measured 216 of 299 ms/step at 256×320).
            """
            t_mat = t_mats[:, s]
            pix, z = pix_all[scale][s], z_all[scale][s]
            if loss_cfg.geo_full_res:
                # Family full-res protocol: everything upsampled to the
                # input grid; reuse the photometric projection.
                src_disp_full = _upsample_to(disps[s + 1][scale], height, width)
                _, src_depth_g = disp_to_depth(
                    src_disp_full[..., 0],
                    model_cfg.min_depth,
                    model_cfg.max_depth,
                )
                return pix, z, src_depth_g, None, height, width
            if loss_cfg.photo_native and loss_cfg.geo_res_cap == 0:
                # photo_native already projected on this exact grid (same
                # disp, same rescaled K): reuse the projection pass.
                h_g, w_g = pix.shape[1], pix.shape[2]
                depth_g = depth_all[scale]
                _, src_depth_g = disp_to_depth(
                    disps[s + 1][scale][..., 0],
                    model_cfg.min_depth,
                    model_cfg.max_depth,
                )
                return pix, z, src_depth_g, depth_g, h_g, w_g
            g_disp_t = disp_s
            g_disp_s = disps[s + 1][scale]
            if loss_cfg.geo_res_cap > 0:
                while g_disp_t.shape[1] > loss_cfg.geo_res_cap:
                    g_disp_t = _halve(g_disp_t)
                    g_disp_s = _halve(g_disp_s)
            h_g, w_g = g_disp_t.shape[1], g_disp_t.shape[2]
            k_g = _scale_k(k, w_g / width, h_g / height)
            _, depth_g = disp_to_depth(
                g_disp_t[..., 0], model_cfg.min_depth, model_cfg.max_depth
            )
            _, src_depth_g = disp_to_depth(
                g_disp_s[..., 0], model_cfg.min_depth, model_cfg.max_depth
            )
            pts_g = backproject(depth_g, jnp.linalg.inv(k_g))
            pix_g, z_g = project(pts_g, k_g, t_mat)
            return pix_g, z_g, src_depth_g, depth_g, h_g, w_g

        # Batched geo sampling: at one scale the per-source depth warps are
        # shape-identical, so they stack on the batch axis into ONE sampler
        # launch (and one scatter-backward launch on the full-grad path)
        # instead of n_sources separate ones. Exact: concat/split are each
        # other's VJP transposes and both kernels operate per-plane.
        geo_grids = None
        geo_sampled = None
        if loss_cfg.geometric_weight > 0 and loss_cfg.geo_grad == "both":
            geo_grids = [_geo_grid(s) for s in range(n_sources)]
            pix_stack_g = jnp.concatenate([g[0] for g in geo_grids])
            dep_stack_g = jnp.concatenate([g[2] for g in geo_grids])[..., None]
            if loss_cfg.geo_stopgrad:
                # Pseudo-label consistency: no gradient into the warped
                # source depth → the Pallas coords-grad sampler applies.
                samp = bilinear_sample_fast(
                    jax.lax.stop_gradient(dep_stack_g), pix_stack_g
                )[..., 0]
            else:
                # Family/SC-Depth semantics: gradient through BOTH the
                # projected z and the sampled source depth; the Pallas
                # full-grad sampler (offset-class scatter backward)
                # replaces XLA's serialized scatter-add on TPU.
                samp = bilinear_sample_full(dep_stack_g, pix_stack_g)[..., 0]
                if loss_cfg.scatter_audit:
                    # Observability for the scatter kernel's static
                    # offset-class caps: count classes it would drop
                    # (0 = exact; ADVICE r2 medium).
                    from colvo.kernels.scatter import scatter_cap_overflow

                    ov = scatter_cap_overflow(
                        jax.lax.stop_gradient(pix_stack_g),
                        (geo_grids[0][4], geo_grids[0][5]),
                    )
                    aux["geo/scatter_overflow"] = (
                        aux.get("geo/scatter_overflow", 0) + ov
                    )
            geo_sampled = jnp.split(samp, n_sources)

        warped_errors = []
        geo_losses = []
        geo_weights = []
        for s in range(n_sources):
            t_mat = t_mats[:, s]
            pix, z = pix_all[scale][s], z_all[scale][s]
            # Photometric grid for this scale: full-res under the default
            # protocol, the scale's own grid under photo_native.
            ph, pw = pix.shape[1], pix.shape[2]
            valid = _valid_mask(pix, ph, pw) * (z > 0)

            if loss_cfg.batched_photo:
                err = err_lookup[(scale, s)]
            elif loss_cfg.photo_native:
                err = photometric_of(src_pyr[scale][s], tgt_pyr[scale], pix)
            else:
                err = photometric_of(frames_clean[:, s + 1], tgt_clean, pix)

            if loss_cfg.geometric_weight > 0:
                if loss_cfg.geo_grad == "sym" and not loss_cfg.geo_full_res:
                    pix_g, z_g, src_depth_g, depth_g, h_g, w_g = _geo_grid(s)
                    k_g = _scale_k(k, w_g / width, h_g / height)
                    # Symmetric stop-gradient protocol: evaluate the
                    # constraint in BOTH warp directions, each sampling the
                    # other frame's depth under stop-gradient. Every depth
                    # map still receives gradient (through its own
                    # projected z in one of the two directions), but no
                    # sampled map needs a source gradient — so both warps
                    # take the Pallas coords-grad sampler instead of the
                    # XLA gather + scatter-add backward. One-sided
                    # stop-grad stalls training (config.py note); the
                    # symmetric form restores the two-sided signal.
                    sampled = bilinear_sample_fast(
                        jax.lax.stop_gradient(src_depth_g)[..., None], pix_g
                    )[..., 0]
                    # reverse direction: source's points through the
                    # inverse pose, sampling the (detached) target depth
                    t_inv = jnp.linalg.inv(t_mat)
                    pts_r = backproject(src_depth_g, jnp.linalg.inv(k_g))
                    pix_r, z_r = project(pts_r, k_g, t_inv)
                    sampled_r = bilinear_sample_fast(
                        jax.lax.stop_gradient(depth_g)[..., None], pix_r
                    )[..., 0]
                    rvalid = _valid_mask(pix_r, h_g, w_g)
                    g_loss_r, _ = geometry_consistency(
                        z_r, sampled_r, rvalid, behind=z_r <= 0
                    )
                else:
                    # geo_grad="both" (incl. geo_stopgrad): the warp was
                    # evaluated in the per-scale batched call above.
                    pix_g, z_g, src_depth_g, depth_g, h_g, w_g = geo_grids[s]
                    sampled = geo_sampled[s]
                    g_loss_r = None
                # In-bounds pixels only in the mask; behind-camera (z≤0)
                # pixels stay IN and score diff=1 — dropping them creates
                # a degenerate all-invalid minimum the uncapped geo
                # gradient actually finds (see geometry_consistency).
                gvalid = _valid_mask(pix_g, h_g, w_g)
                if loss_cfg.geo_full_res:
                    gvalid = gvalid * _valid_mask(pix, height, width)
                g_loss, g_weight = geometry_consistency(
                    z_g, sampled, gvalid, behind=z_g <= 0
                )
                if g_loss_r is not None:
                    g_loss = 0.5 * (g_loss + g_loss_r)
                # Upsample the geo weight/validity to the PHOTOMETRIC grid
                # of this scale (full-res by default; the scale's native
                # grid under photo_native, where ph == h_g and this no-ops).
                if not loss_cfg.geo_full_res and ph // h_g > 1:
                    up = ph // h_g
                    g_weight = upsample_nearest(g_weight[..., None], up)[..., 0]
                    gvalid = upsample_nearest(gvalid[..., None], up)[..., 0]
                geo_losses.append(g_loss)
                geo_weights.append(g_weight)
                # Downweight photometrically where geometry disagrees
                # (occlusion/dynamic) — the DCDP loss-level coupling.
                # Weights join in err's dtype so the cdt diet survives
                # (bf16*f32 would silently promote the whole err stack).
                gw = g_weight.astype(err.dtype)
                gv = (gvalid * valid).astype(err.dtype)
                err = err * gw + err * (1.0 - gv)
            warped_errors.append(err)

        errors = jnp.stack(warped_errors, axis=-1)  # (B, h_s, w_s, S)
        # Reductions accumulate in f32 regardless of the cdt plane dtype
        # (the convert fuses into the reduce — no extra HBM pass).
        if loss_cfg.automask:
            ident = identity_pyr[scale] if loss_cfg.photo_native else identity_errors
            min_err, mask = automask_fn(errors, ident)
            mask32 = mask.astype(jnp.float32)
            photo = jnp.sum(min_err.astype(jnp.float32) * mask32) / (
                jnp.sum(mask32) + 1e-7
            )
        elif loss_cfg.min_reprojection:
            photo = jnp.mean(jnp.min(errors, axis=-1).astype(jnp.float32))
        else:
            photo = jnp.mean(errors.astype(jnp.float32))

        tgt_small = tgt_clean[:, :: 2**scale, :: 2**scale]
        smooth = smoothness_loss(disp_s, tgt_small) / (2**scale)

        photo_total = photo_total + photo
        smooth_total = smooth_total + smooth
        if geo_losses:
            geo_total = geo_total + sum(geo_losses) / len(geo_losses)

    photo_total = photo_total / n_scales
    smooth_total = smooth_total / n_scales
    geo_total = geo_total / n_scales if loss_cfg.geometric_weight > 0 else jnp.array(0.0)

    # geo_scale: traced ramp multiplier (train_step computes it from the
    # step counter when loss.geo_ramp_steps > 0); aux reports the
    # UNSCALED geo term so the metric stays comparable across the ramp.
    total = (
        photo_total
        + loss_cfg.smoothness_weight * smooth_total
        + loss_cfg.geometric_weight * geo_scale * geo_total
    )

    # Depth<->pose gauge coupling (docs/SCALE_DECOUPLING.md; config.py
    # loss.gauge_* note): squared log-hinge keeping the gauge-invariant
    # ratio r = mean||t|| / mean(depth) inside [gauge_lo, gauge_hi].
    # Exactly zero (value AND gradient) for any in-band model; catches the
    # translation-gauge collapse (r falls ~100x below the healthy band)
    # that silently breaks polyp localization on ~1/8 of seeds.
    if loss_cfg.gauge_weight > 0:
        t_mag = jnp.mean(
            jnp.linalg.norm(poses[..., 3:].astype(jnp.float32), axis=-1)
        )
        d_mean = jnp.mean(full_depth.astype(jnp.float32))
        log_r = jnp.log(t_mag + 1e-12) - jnp.log(d_mean + 1e-12)
        lo = jnp.log(loss_cfg.gauge_lo)
        hi = jnp.log(loss_cfg.gauge_hi)
        gauge = (
            jnp.square(jnp.maximum(lo - log_r, 0.0))
            + jnp.square(jnp.maximum(log_r - hi, 0.0))
        )
        total = total + loss_cfg.gauge_weight * gauge
        aux["loss/gauge"] = gauge
        aux["gauge/r"] = jnp.exp(log_r)
    aux["loss/photometric"] = photo_total
    aux["loss/smoothness"] = smooth_total
    aux["loss/geometric"] = geo_total
    aux["loss/total"] = total
    aux["depth/full"] = full_depth
    return total, aux
