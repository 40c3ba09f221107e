"""Benchmark-dataset loader + evaluate_dataset harness (SURVEY.md E1/E2).

Synthesizes an on-disk benchmark in the documented VCD/CSD-style layout
(colvo/data/benchmark.py) from the rendered colon — exact GT depth and
poses — then exercises the loader round-trip and the full eval pipeline.
"""

import os

import numpy as np
import pytest

import jax

from colvo.config import ColvoConfig
from colvo.data import render_sequence
from colvo.data.benchmark import (
    list_sequences,
    load_benchmark_sequence,
)


H, W = 64, 96


def _write_sequence(root, name, seq, depth_fmt="npy", pose_fmt=16):
    import cv2

    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "rgb"))
    os.makedirs(os.path.join(d, "depth"))
    for i, (f, gt) in enumerate(zip(seq.frames, seq.depths)):
        bgr = cv2.cvtColor(
            np.clip(f * 255 + 0.5, 0, 255).astype(np.uint8), cv2.COLOR_RGB2BGR
        )
        cv2.imwrite(os.path.join(d, "rgb", f"{i:06d}.png"), bgr)
        if depth_fmt == "npy":
            np.save(os.path.join(d, "depth", f"{i:06d}.npy"), gt)
        else:  # 16-bit PNG, depth = raw * scale (range-covering scale)
            scale = float(seq.depths.max()) / 65535.0
            raw = np.clip(gt / scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(os.path.join(d, "depth", f"{i:06d}.png"), raw)
            np.savetxt(os.path.join(d, "depth_scale.txt"), [scale])
    if pose_fmt == 16:
        rows = seq.poses.reshape(len(seq.poses), 16)
    else:  # 3×4 KITTI style
        rows = seq.poses[:, :3, :].reshape(len(seq.poses), 12)
    np.savetxt(os.path.join(d, "poses.txt"), rows)
    np.savetxt(os.path.join(d, "intrinsics.txt"), seq.k.reshape(-1))
    return d


@pytest.fixture(scope="module")
def bench_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bench"))
    seq_a = render_sequence(n_frames=6, height=H, width=W, seed=1)
    seq_b = render_sequence(n_frames=5, height=H, width=W, seed=2)
    _write_sequence(root, "seq_a", seq_a, depth_fmt="npy", pose_fmt=16)
    _write_sequence(root, "seq_b", seq_b, depth_fmt="png", pose_fmt=12)
    return root, seq_a, seq_b


def test_list_and_load_roundtrip(bench_root):
    root, seq_a, _ = bench_root
    assert list_sequences(root) == ["seq_a", "seq_b"]
    loaded = load_benchmark_sequence(os.path.join(root, "seq_a"), W, H)
    assert loaded.frames.shape == (6, H, W, 3)
    # PNG 8-bit round trip: within 1/255 + interpolation noise at same size
    np.testing.assert_allclose(loaded.frames, seq_a.frames, atol=0.01)
    np.testing.assert_allclose(loaded.gt_depths, seq_a.depths, atol=1e-4)
    np.testing.assert_allclose(loaded.gt_poses, seq_a.poses, atol=1e-6)
    np.testing.assert_allclose(loaded.k, seq_a.k, atol=1e-4)


def test_load_png_depth_and_kitti_poses(bench_root):
    root, _, seq_b = bench_root
    loaded = load_benchmark_sequence(os.path.join(root, "seq_b"), W, H)
    # 16-bit depth: quantized to (max 1 m)/65535 ≈ 15 µm
    np.testing.assert_allclose(loaded.gt_depths, seq_b.depths, atol=1e-3)
    np.testing.assert_allclose(loaded.gt_poses, seq_b.poses, atol=1e-6)


def test_load_resized_rescales_k(bench_root):
    root, seq_a, _ = bench_root
    loaded = load_benchmark_sequence(os.path.join(root, "seq_a"), W // 2, H // 2)
    assert loaded.frames.shape == (6, H // 2, W // 2, 3)
    assert loaded.gt_depths.shape == (6, H // 2, W // 2)
    np.testing.assert_allclose(loaded.k[0, 0], seq_a.k[0, 0] * 0.5, rtol=1e-5)
    np.testing.assert_allclose(loaded.k[1, 2], seq_a.k[1, 2] * 0.5, rtol=1e-5)


@pytest.mark.slow
def test_evaluate_dataset_end_to_end(bench_root, tmp_path):
    root, *_ = bench_root
    from colvo.pipelines import evaluate_dataset

    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.data.height, cfg.data.width = H, W
    out = str(tmp_path / "eval")
    metrics = evaluate_dataset(cfg, root, out_dir=out)
    # both sequences scored on depth + pose, plus aggregate means
    for k in ("seq_a/depth/abs_rel", "seq_b/depth/abs_rel",
              "seq_a/pose/ate", "seq_b/pose/ate",
              "mean/depth/abs_rel", "mean/pose/ate"):
        assert k in metrics and np.isfinite(metrics[k]), k
    assert os.path.exists(os.path.join(out, "metrics.json"))
    assert os.path.exists(os.path.join(out, "qualitative_depth_seq_a.png"))
    assert os.path.exists(os.path.join(out, "trajectory_seq_a.png"))
