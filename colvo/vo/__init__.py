"""VO, reconstruction, applications (SURVEY.md §2.6, components V1–V4)."""

from colvo.vo.driver import VOResult, run_vo, chain_relative_poses
from colvo.vo.stream import StreamingVO
from colvo.vo.align import umeyama, align_trajectory, align_poses
from colvo.vo.recon import (
    PointCloud,
    stitch_pointclouds,
    voxel_downsample,
    save_ply,
    load_ply,
    backproject_depth_np,
)
from colvo.vo.polyps import PolypDetection, PolypLocalization, localize_polyps

__all__ = [
    "VOResult",
    "run_vo",
    "chain_relative_poses",
    "StreamingVO",
    "umeyama",
    "align_trajectory",
    "align_poses",
    "PointCloud",
    "stitch_pointclouds",
    "voxel_downsample",
    "save_ply",
    "load_ply",
    "backproject_depth_np",
    "PolypDetection",
    "PolypLocalization",
    "localize_polyps",
]
