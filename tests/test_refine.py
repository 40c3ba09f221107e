"""Keyframe pose refinement (colvo/vo/refine.py) — synthetic contract.

Render two frames with exact GT pose+depth, perturb the relative pose,
and check the photometric+geo refinement pulls it back toward truth and
that the re-chained trajectory preserves intra-segment structure.
"""

import numpy as np
import pytest

from colvo.data.synthetic import default_intrinsics, make_trajectory, render_frame
from colvo.vo.refine import refine_keyframe_poses


def _rot_err_deg(a, b):
    r = a[:3, :3].T @ b[:3, :3]
    c = np.clip((np.trace(r) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


@pytest.mark.slow  # ~2 min CPU: jitted 40-iter Adam refine program
def test_refine_recovers_perturbed_pose():
    h, w = 96, 128
    k = default_intrinsics(h, w)
    gt = make_trajectory(8, step=0.004, wobble=0.3, seed=31).astype(np.float64)
    frames, depths = [], []
    for i in (0, 4):
        f, d = render_frame(gt[i], k, h, w, radius=0.03)
        frames.append(f.astype(np.float32))
        depths.append(d.astype(np.float32))

    # trajectory with a perturbed middle segment: poses[4] off by a small
    # rotation + translation; interior frames (1..3) ride the GT chain
    poses = gt.copy()[:8]
    bump = np.eye(4)
    th = np.radians(1.2)
    bump[:3, :3] = np.array([
        [np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]
    ])
    bump[:3, 3] = [0.002, -0.001, 0.0015]
    poses[4:] = np.einsum("ij,njk->nik", bump, poses[4:])  # world-frame bump
    err0 = _rot_err_deg(poses[4], gt[4])
    t_err0 = np.linalg.norm(poses[4][:3, 3] - gt[4][:3, 3])
    assert err0 > 1.0

    refined, stats = refine_keyframe_poses(
        poses, keyframe_ids=[0, 4], depths=depths,
        frames_kf=np.stack(frames), k=k, iters=40, lr=2e-3, batch=1,
    )
    err1 = _rot_err_deg(refined[4], gt[4])
    t_err1 = np.linalg.norm(refined[4][:3, 3] - gt[4][:3, 3])
    assert stats["pairs"] == 1
    assert stats["residual_after"] <= stats["residual_before"] + 1e-9
    # the refinement must recover most of the injected error
    assert err1 < 0.5 * err0, (err0, err1)
    assert t_err1 < 0.7 * t_err0, (t_err0, t_err1)
    # keyframe 0 anchors; interior frames keep their intra-segment chain
    np.testing.assert_allclose(refined[0], poses[0], atol=1e-12)
    rel_old = np.linalg.inv(poses[0]) @ poses[2]
    rel_new = np.linalg.inv(refined[0]) @ refined[2]
    np.testing.assert_allclose(rel_new, rel_old, atol=1e-9)
    # tail frames re-anchor on the refined keyframe
    rel_old = np.linalg.inv(poses[4]) @ poses[6]
    rel_new = np.linalg.inv(refined[4]) @ refined[6]
    np.testing.assert_allclose(rel_new, rel_old, atol=1e-9)
