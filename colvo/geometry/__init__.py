"""Geometry core (SURVEY.md §2.3, components G1–G5).

Pure-XLA reference implementations of the hot geometric ops. The Pallas
kernels in ``colvo.kernels`` are drop-in replacements validated against
these (SURVEY.md §4.6).
"""

from colvo.geometry.se3 import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    se3_exp,
    se3_log,
    transformation_from_parameters,
    invert_transform,
    compose,
)
from colvo.geometry.ops import (
    disp_to_depth,
    depth_to_disp,
    pixel_grid,
    backproject,
    project,
    bilinear_sample,
    grid_sample,
    inverse_warp,
    reproject_depth,
)

__all__ = [
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "se3_exp",
    "se3_log",
    "transformation_from_parameters",
    "invert_transform",
    "compose",
    "disp_to_depth",
    "depth_to_disp",
    "pixel_grid",
    "backproject",
    "project",
    "bilinear_sample",
    "grid_sample",
    "inverse_warp",
    "reproject_depth",
]
