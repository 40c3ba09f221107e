"""Rotation-drift audit: is the full-colon 0.126°/frame a BIAS or noise?

The round-4 full-colon reconstruction bends a straight ~12 m tube into a
loop: 0.126°/frame of relative-rotation error compounds to ~380° over
3,000 frames (VERDICT r4 missing #1). A constant suggests a per-frame
BIAS, not noise — and a bias has mechanisms (the pose net sees (target,
source) in a fixed order and its output is read as target→source for
both past and future sources; any order asymmetry it learns becomes a
directed rotation offset) and fixes (symmetrized inference: read the
pair both ways and average in the Lie algebra — the order-induced
component cancels exactly, no calibration constant fitted anywhere).

This measures, on a held-out trajectory (seed independent of training
100+7i and eval 999):

  * per-frame relative rotation error e_i = log(R_gt_rel_i^T R_pred_rel_i)
  * ||mean(e)|| vs mean(||e||): ratio ~1 = pure bias, ~0 = pure noise
  * the same for SYMMETRIZED pose inference
    rel_sym = 0.5 * (log T(a,b) - log T(b,a))

Usage: python scripts/drift_audit.py [n_frames] [weights] [out_md]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np


def _log_so3(r: np.ndarray) -> np.ndarray:
    """Rotation matrix → axis-angle vector (float64, stable near 0)."""
    tr = np.clip((np.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(tr)
    if theta < 1e-9:
        return np.zeros(3)
    w = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    return w * (theta / (2.0 * np.sin(theta)))


def _exp_so3(aa: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(aa)
    if th < 1e-12:
        return np.eye(3)
    k = aa / th
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * (kx @ kx)


def _bias_stats(errs: np.ndarray) -> dict:
    mean_vec = errs.mean(axis=0)
    return {
        "mean_norm_deg": float(np.degrees(np.linalg.norm(mean_vec))),
        "norm_mean_deg": float(np.degrees(np.linalg.norm(errs, axis=1).mean())),
        "bias_fraction": float(
            np.linalg.norm(mean_vec)
            / max(np.linalg.norm(errs, axis=1).mean(), 1e-12)
        ),
        "mean_axis": [round(float(v), 6) for v in mean_vec],
    }


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    weights = (sys.argv[2] if len(sys.argv) > 2
               else "runs/ablate/dcdp1_lcc1/weights.npz")
    out_md = sys.argv[3] if len(sys.argv) > 3 else "docs/DRIFT.md"

    import jax

    if os.environ.get("COLVO_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["COLVO_PLATFORM"])

    from colvo.config import ColvoConfig
    from colvo.data.synthetic import default_intrinsics, make_trajectory, render_frame
    from colvo.pipelines import make_runner

    cfg = ColvoConfig()
    h, w = cfg.data.height, cfg.data.width
    k = default_intrinsics(h, w)
    gt_poses = make_trajectory(n_frames, step=0.004, wobble=0.3, seed=998)
    frames = np.zeros((n_frames, h, w, 3), np.float32)
    for i in range(n_frames):
        f, _ = render_frame(gt_poses[i], k, h, w, radius=0.03)
        frames[i] = f

    runner = make_runner(cfg, weights)

    # batched pose inference both ways (B pairs per call)
    def rel6(a, b, bs=32):
        outs = []
        for i in range(0, len(a), bs):
            pa, pb = a[i:i + bs], b[i:i + bs]
            if len(pa) < bs:  # static shape: pad, then trim
                pad = bs - len(pa)
                pa = np.concatenate([pa, np.repeat(pa[-1:], pad, 0)])
                pb = np.concatenate([pb, np.repeat(pb[-1:], pad, 0)])
                outs.append(runner.infer_pose(pa, pb)[: len(a) - i])
            else:
                outs.append(runner.infer_pose(pa, pb))
        return np.concatenate(outs)

    fwd = rel6(frames[:-1], frames[1:])   # T(a,b): a→b (prev→cur)
    rev = rel6(frames[1:], frames[:-1])   # T(b,a): b→a

    # GT relative rotations (cam_to_world chained: rel = inv(P_i) P_{i+1})
    gt_rel_r = np.stack([
        gt_poses[i, :3, :3].T @ gt_poses[i + 1, :3, :3]
        for i in range(n_frames - 1)
    ])
    # NOTE network convention: infer_pose(prev, cur) returns target→source
    # = prev→cur as used by chain_relative_poses (cam→world inverse chain);
    # evaluate_pose pins the sign conventions — here we only need the
    # rotation part, whose error is convention-consistent either way.
    err, err_sym = [], []
    for i in range(n_frames - 1):
        r_f = _exp_so3(fwd[i, :3])
        r_r = _exp_so3(rev[i, :3])
        # symmetrized: average forward with the inverse of the reversed
        aa_sym = 0.5 * (fwd[i, :3] - rev[i, :3])
        r_s = _exp_so3(aa_sym)
        # predicted rel (prev→cur, camera frame) vs GT world-chain rel:
        # chain convention — cam→world rel rotation is the inverse
        err.append(_log_so3(gt_rel_r[i].T @ r_f.T))
        err_sym.append(_log_so3(gt_rel_r[i].T @ r_s.T))
    err = np.stack(err)
    err_sym = np.stack(err_sym)

    rec = {
        "n_frames": n_frames,
        "weights": weights,
        "forward": _bias_stats(err),
        "symmetrized": _bias_stats(err_sym),
        # how close is the reversed-pair pose to the exact inverse? a
        # perfectly symmetric model would have fwd ⊕ rev = identity
        "fwd_plus_rev_rot_deg": float(np.degrees(
            np.linalg.norm(fwd[:, :3] + rev[:, :3], axis=1).mean())),
    }
    print(json.dumps(rec, indent=1), flush=True)

    lines = [
        "# Rotation-drift audit (held-out trajectory, seed 998)",
        "",
        "Per-frame relative-rotation error, decomposed into bias vs noise",
        "(`bias_fraction` = ||mean error vector|| / mean ||error vector||:",
        "1 = constant bias, 0 = zero-mean noise). `symmetrized` reads each",
        "pair both ways and averages in the Lie algebra — any inference-",
        "order bias cancels exactly, no constant fitted.",
        "",
        "```json",
        json.dumps(rec, indent=1),
        "```",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
