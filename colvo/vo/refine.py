"""Test-time keyframe pose refinement (SURVEY.md §2.6 V1/V3 quality pass).

Odometry drift integrates per-frame pose error; the reference's flagship
artifact (`/root/reference/README.md:21,29-31`, a full-colon GT-vs-ours
reconstruction) demands the error stay small over thousands of frames.
A cheap odometry-legal lever (no loop closure, no GT): after the chunked
VO pass, re-optimize the relative pose of every CONSECUTIVE KEYFRAME pair
against the photometric + depth-consistency evidence at the keyframes'
own (longer) baseline. The k×-longer baseline carries k× the parallax, so
the per-segment pose error the chain integrates is re-estimated with far
better signal-to-noise than the k chained single-frame estimates.

All M keyframe pairs refine in ONE jitted program: a (M, 6) se(3) delta
around the chained initialization, Adam inside ``lax.fori_loop``, the
warp through the Pallas coords-grad sampler (gradients flow to the pose
only — frames and depths are data at test time, exactly the training
loss's contract for image warps).

The refined segment transforms then re-anchor the full trajectory: each
intra-segment relative chain is preserved, segments are re-chained
through the refined keyframe poses.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colvo.geometry import backproject, project
from colvo.geometry.ops import _valid_mask
from colvo.geometry.se3 import se3_exp
from colvo.kernels import bilinear_sample_fast
from colvo.losses.photometric import lcc_calibrate, photometric_error


def _segment_loss(delta6, rel_init, frame_i, frame_j, depth_i, depth_j,
                  k, k_inv, geo_weight):
    """Mean photometric+geo residual of keyframe pairs under T = exp(δ)·T0.

    frame/depth arrays are (M, H, W, C)/(M, H, W); rel_init (M, 4, 4) maps
    keyframe i → keyframe j (camera-relative, network scale).
    """
    t_mat = jnp.einsum("mij,mjk->mik", se3_exp(delta6), rel_init)
    pts = backproject(depth_i, k_inv)
    pix, z = project(pts, k, t_mat)
    h, w = depth_i.shape[1], depth_i.shape[2]
    valid = _valid_mask(pix, h, w) * (z > 0)

    warped = bilinear_sample_fast(frame_j, pix)
    calib = lcc_calibrate(warped, frame_i, "global+affine", valid_mask=valid)
    photo = photometric_error(calib, frame_i)

    # depth consistency at the longer baseline: projected z vs the warped
    # source depth (both stop-grad'd on the depth side — only the pose
    # moves at test time, so the coords-grad sampler applies)
    d_j = bilinear_sample_fast(
        jax.lax.stop_gradient(depth_j)[..., None], pix)[..., 0]
    geo = jnp.abs(z - d_j) / (z + d_j + 1e-6)

    denom = jnp.sum(valid, axis=(1, 2)) + 1e-6
    photo_m = jnp.sum(photo * valid, axis=(1, 2)) / denom
    geo_m = jnp.sum(geo * valid, axis=(1, 2)) / denom
    per_pair = photo_m + geo_weight * geo_m
    return jnp.mean(per_pair), per_pair


@partial(jax.jit, static_argnames=("iters", "lr", "geo_weight"))
def _refine_jit(rel_init, frame_i, frame_j, depth_i, depth_j, k,
                iters: int = 40, lr: float = 1e-3,
                geo_weight: float = 0.5):
    import optax

    k_inv = jnp.linalg.inv(k)
    m = rel_init.shape[0]
    delta0 = jnp.zeros((m, 6), jnp.float32)
    tx = optax.adam(lr)

    loss_g = jax.value_and_grad(
        lambda d: _segment_loss(d, rel_init, frame_i, frame_j,
                                depth_i, depth_j, k, k_inv, geo_weight),
        has_aux=True,
    )

    def body(_, carry):
        delta, opt = carry
        (_, _), grads = loss_g(delta)
        upd, opt = tx.update(grads, opt, delta)
        return optax.apply_updates(delta, upd), opt

    delta, _ = jax.lax.fori_loop(0, iters, body, (delta0, tx.init(delta0)))
    # Accept per pair only if the refined pose actually reduced the
    # residual (a diverged Adam trajectory must not poison the chain).
    _, res0 = _segment_loss(delta0, rel_init, frame_i, frame_j,
                            depth_i, depth_j, k, k_inv, geo_weight)
    _, res1 = _segment_loss(delta, rel_init, frame_i, frame_j,
                            depth_i, depth_j, k, k_inv, geo_weight)
    keep = (res1 < res0)[:, None]
    delta = jnp.where(keep, delta, 0.0)
    t_ref = jnp.einsum("mij,mjk->mik", se3_exp(delta), rel_init)
    return t_ref, jnp.mean(res0), jnp.mean(jnp.minimum(res0, res1))


def refine_keyframe_poses(
    poses: np.ndarray,
    keyframe_ids: List[int],
    depths: List[np.ndarray],
    frames_kf: np.ndarray,
    k: np.ndarray,
    iters: int = 40,
    lr: float = 1e-3,
    geo_weight: float = 0.5,
    batch: int = 64,
) -> Tuple[np.ndarray, dict]:
    """Refine a chained trajectory through its keyframe segments.

    Args:
        poses: (N, 4, 4) cam→world chained trajectory (vo.poses).
        keyframe_ids / depths: VOResult keyframe protocol (depths in the
            network's own scale — no alignment applied).
        frames_kf: (M, H, W, 3) float frames AT the keyframes.
        k: (3, 3) intrinsics.

    Returns (refined (N, 4, 4) poses, stats dict). The intra-segment
    relative chains are preserved verbatim; only the keyframe-to-keyframe
    transforms move.
    """
    ids = list(keyframe_ids)
    m = len(ids) - 1
    if m < 1:
        return poses, {"pairs": 0}
    frames_kf = np.asarray(frames_kf, np.float32)
    if frames_kf.dtype == np.uint8 or frames_kf.max() > 1.5:
        frames_kf = frames_kf.astype(np.float32) / 255.0
    d = np.stack([np.asarray(x, np.float32) for x in depths])

    # camera-relative init from the chain: T_ij = inv(P_i) @ P_j … but the
    # projection path expects the TRAINING convention (target i, source j):
    # pix of i's points in j = project(D_i, K, T) with T = rel pose as the
    # pose net emits it, i.e. the inverse of the cam→world step.
    rel = np.stack([
        np.linalg.inv(poses[ids[i + 1]]) @ poses[ids[i]]
        for i in range(m)
    ]).astype(np.float32)

    t_ref_all = []
    res0_all, res1_all = [], []
    for s in range(0, m, batch):
        e = min(s + batch, m)
        pad = batch - (e - s)

        def p(x):
            x = x[s:e]
            if pad:
                x = np.concatenate([x, np.repeat(x[-1:], pad, 0)])
            return jnp.asarray(x)

        t_ref, r0, r1 = _refine_jit(
            p(rel), p(frames_kf[:-1]), p(frames_kf[1:]),
            p(d[:-1]), p(d[1:]), jnp.asarray(k.astype(np.float32)),
            iters=iters, lr=lr, geo_weight=geo_weight,
        )
        t_ref_all.append(np.asarray(t_ref)[: e - s])
        res0_all.append(float(r0))
        res1_all.append(float(r1))
    t_ref = np.concatenate(t_ref_all)

    # Re-chain: keyframe poses step through the refined segment
    # transforms (cam→world step S = inv(T_ref), mirroring the rel
    # construction above); interior frames keep their original pose
    # relative to their own segment's start.
    refined = poses.astype(np.float64).copy()
    p_i = refined[ids[0]].copy()
    for seg in range(m):
        s_ref = np.linalg.inv(np.asarray(t_ref[seg], np.float64))
        base_old = poses[ids[seg]].astype(np.float64)
        rebase = p_i @ np.linalg.inv(base_old)
        for t in range(ids[seg] + 1, ids[seg + 1]):
            refined[t] = rebase @ poses[t].astype(np.float64)
        p_i = p_i @ s_ref
        refined[ids[seg + 1]] = p_i
    # tail frames past the last keyframe
    base_old = poses[ids[-1]].astype(np.float64)
    rebase = p_i @ np.linalg.inv(base_old)
    for t in range(ids[-1] + 1, poses.shape[0]):
        refined[t] = rebase @ poses[t].astype(np.float64)

    stats = {
        "pairs": m,
        "residual_before": float(np.mean(res0_all)),
        "residual_after": float(np.mean(res1_all)),
    }
    return refined, stats
