"""Metric parity fixtures (SURVEY.md §4.7): frozen inputs with expected
Abs-Rel/ATE values computed by the community-standard formulas, pinning the
eval implementations against regressions."""

import numpy as np

from colvo.evaluation import compute_depth_errors, ate, evaluate_pose


def test_depth_metric_fixture():
    """Hand-computable 2×2 fixture."""
    gt = np.array([[[1.0, 2.0], [4.0, 0.0]]])  # 0 = invalid (below min)
    pred = np.array([[[1.1, 1.8], [4.4, 9.9]]])
    m = compute_depth_errors(gt, pred, min_depth=0.5, max_depth=10.0, median_scaling=False)
    # abs_rel = mean(|1-1.1|/1, |2-1.8|/2, |4-4.4|/4) = mean(.1,.1,.1)=0.1
    np.testing.assert_allclose(m["abs_rel"], 0.1, atol=1e-6)
    # sq_rel = mean(.01/1, .04/2, .16/4) = mean(.01,.02,.04)=7/300
    np.testing.assert_allclose(m["sq_rel"], 7.0 / 300.0, atol=1e-6)
    # rmse = sqrt(mean(.01,.04,.16))
    np.testing.assert_allclose(m["rmse"], np.sqrt(0.07), atol=1e-6)
    # all ratios < 1.25
    assert m["a1"] == 1.0


def test_depth_metric_randomized_pins_formula():
    """Frozen-seed fixture with independently coded reference formulas."""
    rng = np.random.default_rng(12345)
    gt = 0.1 + rng.random((4, 16, 16)) * 0.8
    pred = gt * np.exp(rng.normal(0, 0.1, gt.shape))
    m = compute_depth_errors(gt, pred, min_depth=1e-3, max_depth=10.0, median_scaling=False)

    # independent straight-line recomputation (no clipping triggers at cap 10)
    thr = np.maximum(gt / pred, pred / gt)
    per = []
    for g, p, t in zip(gt, pred, thr):
        per.append(np.mean(np.abs(g - p) / g))
    np.testing.assert_allclose(m["abs_rel"], np.mean(per), atol=1e-9)
    a1 = np.mean([np.mean(t < 1.25) for t in thr])
    np.testing.assert_allclose(m["a1"], a1, atol=1e-9)


def test_ate_fixture_translated_trajectory():
    """A rigidly translated trajectory has ATE 0 after alignment."""
    t = np.linspace(0, 4 * np.pi, 60)
    gt = np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=1)
    pred = gt + np.array([5.0, -2.0, 1.0])
    assert ate(pred, gt) < 1e-9


def test_ate_fixture_known_noise():
    """Isotropic noise of std σ on an aligned trajectory → ATE ≈ σ·√3."""
    rng = np.random.default_rng(7)
    t = np.linspace(0, 2 * np.pi, 500)
    gt = np.stack([np.cos(t), np.sin(t), t], axis=1)
    sigma = 0.01
    pred = gt + rng.normal(0, sigma, gt.shape)
    val = ate(pred, gt)
    assert 0.5 * sigma * np.sqrt(3) < val < 1.5 * sigma * np.sqrt(3), val


def test_rpe_identity_chain():
    n = 20
    poses = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
    for i in range(n):
        poses[i, :3, 3] = [0, 0, 0.1 * i]
    m = evaluate_pose(poses, poses.copy())
    assert m["ate"] < 1e-12
    assert m["rpe_trans"] < 1e-12
    assert m["rpe_rot_deg"] < 1e-9
