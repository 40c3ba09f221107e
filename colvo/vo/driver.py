"""Full-sequence VO driver (SURVEY.md component V1, call stack §3.3).

Streams a sequence, runs the coupled depth+pose inference per consecutive
pair on TPU, and chains relative SE(3) poses into a global trajectory on
host (cheap O(frames) serial scan — SURVEY.md §3.3 boundary note). The
chain runs in float64 with periodic rotation renormalization to control
drift over thousands of frames (SURVEY.md §7 hard part 4).

Per-frame heavy compute stays on TPU with O(window) device memory — the
long-video answer for full colonoscopies (SURVEY.md §5.7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, List, Optional

import numpy as np

from colvo.config import ColvoConfig
from colvo.geometry.se3 import renormalize_rotation
from colvo.runtime.infer import InferenceRunner


@dataclass
class VOResult:
    """Trajectory + per-frame outputs of a VO run.

    poses: (N, 4, 4) cam→world (frame 0 = identity/world origin).
    depths: list of kept (H, W) depth maps (every ``keyframe_every``-th).
    keyframe_ids: frame indices of the kept depth maps.
    """

    poses: np.ndarray
    depths: List[np.ndarray] = field(default_factory=list)
    keyframe_ids: List[int] = field(default_factory=list)

    @property
    def positions(self) -> np.ndarray:
        return self.poses[:, :3, 3]


def _axis_angle_to_matrix_np(aa: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        return np.eye(3)
    k = aa / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)


def _renorm(rot: np.ndarray) -> np.ndarray:
    """Project back onto SO(3) (host float64 Gram–Schmidt)."""
    u, _, vt = np.linalg.svd(rot)
    r = u @ vt
    if np.linalg.det(r) < 0:
        u[:, -1] *= -1
        r = u @ vt
    return r


def _rel6_to_mat(rel6: np.ndarray) -> np.ndarray:
    """(6,) (axisangle, translation) → 4×4 float64 transform."""
    rel = np.eye(4, dtype=np.float64)
    rel[:3, :3] = _axis_angle_to_matrix_np(rel6[:3].astype(np.float64))
    rel[:3, 3] = rel6[3:].astype(np.float64)
    return rel


def chain_relative_poses(
    rel6: np.ndarray, renorm_every: int = 50
) -> np.ndarray:
    """Chain (N, 6) relative prev→cur pose params into (N+1, 4, 4)
    cam→world poses (float64; periodic rotation renormalization).

    Uses the native C++ chain when available (colvo/native/voxel.cpp),
    falling back to the numpy loop.
    """
    rels = np.stack([_rel6_to_mat(r) for r in rel6]) if len(rel6) else (
        np.zeros((0, 4, 4), np.float64)
    )
    try:
        from colvo.native import chain_poses

        return chain_poses(rels, renorm_every=renorm_every)
    except Exception:
        poses = [np.eye(4, dtype=np.float64)]
        t_wc = np.eye(4, dtype=np.float64)
        for i in range(len(rels)):
            t_wc = t_wc @ np.linalg.inv(rels[i])
            if renorm_every > 0 and (i + 1) % renorm_every == 0:
                t_wc[:3, :3] = _renorm(t_wc[:3, :3])
            poses.append(t_wc.copy())
        return np.stack(poses)


def run_vo(
    runner: InferenceRunner,
    frames: Iterable[np.ndarray],
    keyframe_every: int = 1,
    renorm_every: int = 50,
    batch_pairs: int = 1,
    chunk_size: int = 16,
    depth_dtype: str = "float16",
    input_format: str = "rgb",
    symmetric_pose: bool = False,
) -> VOResult:
    """Run VO over a frame stream (BASELINE.json config 5).

    Args:
        runner: inference runner with trained params.
        frames: iterable of (H, W, 3) frames — uint8 preferred (4× cheaper
            host→device; normalized on device), float in [0, 1] accepted;
            with ``input_format="i420"`` planar (H·3/2, W) uint8 YUV as
            emitted by video decoders (another 2× cheaper host→device).
        keyframe_every: keep every k-th depth map for reconstruction.
        renorm_every: SVD-renormalize the chained rotation every k frames.
        chunk_size: frames per device transfer/compute chunk (fast path).

    Real runners take the chunked streaming fast path (colvo/vo/stream.py):
    uint8 chunked H2D, one encoder pass per frame via device-resident
    carry, transfer/compute overlap. Duck-typed runners (e.g. test
    oracles exposing only ``infer_coupled``) take the per-pair loop below.

    Note on scale: self-supervised monocular VO is scale-ambiguous; the
    trajectory is in the network's scale and is aligned to GT by the
    Umeyama similarity in evaluation (SURVEY.md V2).
    """
    if isinstance(runner, InferenceRunner):
        from colvo.vo.stream import StreamingVO

        # Keyframe retention happens INSIDE the stream (O(N/k) host
        # memory) — the executor drops non-keyframe depths at fetch time.
        depths_kf, rel6 = StreamingVO(
            runner, chunk_size=chunk_size, depth_dtype=depth_dtype,
            input_format=input_format, symmetric_pose=symmetric_pose,
        ).run(frames, keyframe_every=keyframe_every)
        if not depths_kf:
            return VOResult(poses=np.eye(4)[None].astype(np.float64))
        poses = chain_relative_poses(rel6, renorm_every=renorm_every)
        n = poses.shape[0]
        # keyframe protocol identical to the per-pair loop below:
        # multiples of keyframe_every in [0, n-1]
        ids = [i for i in range(n) if i % keyframe_every == 0]
        assert len(ids) == len(depths_kf), (len(ids), len(depths_kf))
        return VOResult(poses=poses, depths=depths_kf, keyframe_ids=ids)

    if input_format != "rgb":
        raise ValueError(
            "planar I420 input is only supported on the streaming fast path "
            "(InferenceRunner); the per-pair duck-typed path takes RGB frames"
        )
    it = iter(frames)
    try:
        prev = next(it)
    except StopIteration:
        return VOResult(poses=np.eye(4)[None].astype(np.float64))

    poses = [np.eye(4, dtype=np.float64)]
    depths: List[np.ndarray] = []
    keyframe_ids: List[int] = []

    t_wc = np.eye(4, dtype=np.float64)  # current cam→world
    idx = 0
    for cur in it:
        depth_a, _depth_b, aa, tr = runner.infer_coupled(prev[None], cur[None])
        if idx % keyframe_every == 0:
            depths.append(depth_a[0])
            keyframe_ids.append(idx)
        # network outputs T_{prev→cur} (target=prev, source=cur); the new
        # camera pose in world is T_wc_prev · T_{prev→cur}⁻¹.
        rel = np.eye(4, dtype=np.float64)
        rel[:3, :3] = _axis_angle_to_matrix_np(np.asarray(aa[0], dtype=np.float64))
        rel[:3, 3] = np.asarray(tr[0], dtype=np.float64)
        t_wc = t_wc @ np.linalg.inv(rel)
        if (idx + 1) % renorm_every == 0:
            t_wc[:3, :3] = _renorm(t_wc[:3, :3])
        poses.append(t_wc.copy())
        prev = cur
        idx += 1

    # keep the final frame's depth too (completes the reconstruction)
    if idx % keyframe_every == 0 or not depths:
        depth_last, _, _, _ = runner.infer_coupled(prev[None], prev[None])
        depths.append(depth_last[0])
        keyframe_ids.append(idx)

    return VOResult(
        poses=np.stack(poses), depths=depths, keyframe_ids=keyframe_ids
    )
