"""VO / reconstruction / polyp / eval tests (SURVEY.md §4.4, §4.7).

A GT-oracle runner (returns rendered GT depth + GT relative pose) closes
the loop: the VO driver must reproduce the GT trajectory, the stitched
cloud must lie on the cylinder, polyp localization error must be ~0 —
validating V1–V4/E1–E3 independently of any trained network.
"""

import numpy as np
import pytest

from colvo.data.synthetic import render_sequence
from colvo.geometry.se3 import matrix_to_axis_angle
from colvo.vo import (
    run_vo,
    align_trajectory,
    umeyama,
    stitch_pointclouds,
    voxel_downsample,
    save_ply,
    load_ply,
    PolypDetection,
    localize_polyps,
)
from colvo.evaluation import compute_depth_errors, evaluate_pose, ate


@pytest.fixture(scope="module")
def seq():
    return render_sequence(n_frames=12, height=64, width=80, seed=5)


class OracleRunner:
    """Mimics InferenceRunner.infer_coupled with rendered ground truth."""

    def __init__(self, seq):
        self.seq = seq
        self._frame_ids = {}
        for i, f in enumerate(seq.frames):
            self._frame_ids[f.tobytes()] = i

    def _id(self, img):
        return self._frame_ids[np.asarray(img[0], dtype=np.float32).tobytes()]

    def infer_coupled(self, img_a, img_b):
        ia, ib = self._id(img_a), self._id(img_b)
        rel = self.seq.relative_pose(ia, ib)  # a-cam -> b-cam
        aa = np.asarray(matrix_to_axis_angle(rel[:3, :3]))
        tr = rel[:3, 3]
        return (
            self.seq.depths[ia][None],
            self.seq.depths[ib][None],
            aa[None].astype(np.float32),
            tr[None].astype(np.float32),
        )


def test_vo_oracle_reproduces_gt_trajectory(seq):
    vo = run_vo(OracleRunner(seq), seq.frames, keyframe_every=1)
    assert vo.poses.shape == (seq.n_frames, 4, 4)
    gt_pos = seq.poses[:, :3, 3]
    # same start frame and exact relative poses → identical chains up to
    # fp accumulation and axis-angle roundtrip
    err = evaluate_pose(vo.poses, seq.poses.astype(np.float64), with_scale=False)
    assert err["ate"] < 5e-4, err
    assert err["rpe_rot_deg"] < 0.1


def test_umeyama_recovers_known_sim3():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    from scipy.spatial.transform import Rotation

    r_true = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ r_true.T + t_true
    rot, t, s = umeyama(src, dst)
    np.testing.assert_allclose(rot, r_true, atol=1e-9)
    np.testing.assert_allclose(s, s_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    aligned = align_trajectory(src, dst)
    np.testing.assert_allclose(aligned, dst, atol=1e-9)


def test_reconstruction_lies_on_cylinder(seq, tmp_path):
    vo = run_vo(OracleRunner(seq), seq.frames, keyframe_every=2)
    cloud = stitch_pointclouds(
        vo, seq.k, frames=list(seq.frames), voxel=0.004, max_depth=0.5
    )
    assert len(cloud) > 500
    # world frame == cylinder frame for the oracle: radius must be ~0.03
    r = np.sqrt(cloud.points[:, 0] ** 2 + cloud.points[:, 1] ** 2)
    assert abs(np.median(r) - 0.03) < 0.003, np.median(r)
    assert cloud.colors is not None and cloud.colors.shape == cloud.points.shape

    # PLY roundtrip
    p = str(tmp_path / "colon.ply")
    save_ply(cloud, p)
    loaded = load_ply(p)
    np.testing.assert_allclose(loaded.points, cloud.points, atol=1e-5)


def test_voxel_downsample_reduces_and_averages():
    pts = np.array([[0.0, 0.0, 0.0], [0.001, 0.001, 0.0], [1.0, 1.0, 1.0]], dtype=np.float32)
    out, _ = voxel_downsample(pts, 0.01)
    assert out.shape == (2, 3)
    assert np.any(np.all(np.isclose(out, [0.0005, 0.0005, 0.0], atol=1e-6), axis=1))


def test_polyp_localization_oracle(seq):
    vo = run_vo(OracleRunner(seq), seq.frames, keyframe_every=1)
    # plant a "polyp" at a known pixel of frame 3 and compute its GT world pos
    fid, px, py = 3, 52, 30
    d = seq.depths[fid][py, px]
    p_cam = np.linalg.inv(seq.k.astype(np.float64)) @ [px, py, 1.0] * d
    gt_world = seq.poses[fid, :3, :3] @ p_cam + seq.poses[fid, :3, 3]

    det = PolypDetection(frame_id=fid, box=(px - 2, py - 2, px + 2, py + 2))
    locs = localize_polyps(vo, seq.k, [det], gt_positions=gt_world[None])
    assert locs[0].error is not None
    # small box on a smooth wall → error only from box-percentile depth
    assert locs[0].error < 0.01, locs[0].error


def test_depth_metrics_identity_and_scale_invariance(seq):
    gt = seq.depths[:4]
    m = compute_depth_errors(gt, gt.copy(), max_depth=10.0)
    assert m["abs_rel"] < 1e-9 and m["a1"] == 1.0
    # median scaling must absorb a global scale
    m2 = compute_depth_errors(gt, 3.7 * gt, max_depth=10.0, median_scaling=True)
    assert m2["abs_rel"] < 1e-6
    # and without scaling it must not
    m3 = compute_depth_errors(gt, 3.7 * gt, max_depth=10.0, median_scaling=False)
    assert m3["abs_rel"] > 0.5


def test_viz_figures_render(seq, tmp_path):
    from colvo.evaluation import viz_trajectory, viz_depth_grid, viz_recon

    vo = run_vo(OracleRunner(seq), seq.frames, keyframe_every=2)
    p1 = str(tmp_path / "traj.png")
    viz_trajectory(
        {"Ground Truth": seq.poses[:, :3, 3], "ColVO(ours)": vo.poses[:, :3, 3]}, p1
    )
    p2 = str(tmp_path / "grid.png")
    viz_depth_grid(seq.frames[0], seq.depths[0], {"ours": seq.depths[0] * 1.05}, p2)
    cloud = stitch_pointclouds(vo, seq.k, voxel=0.005, max_depth=0.5)
    p3 = str(tmp_path / "recon.png")
    viz_recon(cloud.points, p3, trajectory=vo.poses[:, :3, 3])
    import os

    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 10000
