"""Evaluation & visualization (SURVEY.md §2.6, components E1–E3)."""

from colvo.evaluation.depth import (
    DEPTH_METRIC_NAMES,
    compute_depth_errors,
    signed_error_map,
    evaluate_depth,
)
from colvo.evaluation.pose import ate, rpe, evaluate_pose
from colvo.evaluation.viz import (
    colormap_depth,
    viz_trajectory,
    viz_depth_grid,
    viz_recon,
    viz_recon_pair,
)

__all__ = [
    "DEPTH_METRIC_NAMES",
    "compute_depth_errors",
    "signed_error_map",
    "evaluate_depth",
    "ate",
    "rpe",
    "evaluate_pose",
    "colormap_depth",
    "viz_trajectory",
    "viz_depth_grid",
    "viz_recon",
    "viz_recon_pair",
]
