"""Loss layer (SURVEY.md §2.4, components L1–L6)."""

from colvo.losses.photometric import ssim, photometric_error, lcc_calibrate
from colvo.losses.terms import (
    smoothness_loss,
    geometry_consistency,
    min_reprojection,
    automask,
)
from colvo.losses.total import snippet_loss, poses_to_transforms

__all__ = [
    "ssim",
    "photometric_error",
    "lcc_calibrate",
    "smoothness_loss",
    "geometry_consistency",
    "min_reprojection",
    "automask",
    "snippet_loss",
    "poses_to_transforms",
]
