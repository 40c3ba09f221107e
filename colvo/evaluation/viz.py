"""Visualization (SURVEY.md component E3) — the three reference figure types:

1. 3D trajectory plots vs GT (``imgs/trajectorypredictions.png``)
2. depth + signed-error comparison grids (``imgs/qualitativeresults.png``)
3. reconstruction renders with trajectory + polyp overlays
   (``imgs/3Dcolonreconstruction.png``)

matplotlib (Agg backend), host-side.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def colormap_depth(depth: np.ndarray, vmin=None, vmax=None) -> np.ndarray:
    """Depth map → near/far RGB (magma, near=bright) for panels."""
    d = np.asarray(depth, dtype=np.float64)
    vmin = np.percentile(d, 2) if vmin is None else vmin
    vmax = np.percentile(d, 98) if vmax is None else vmax
    norm = np.clip((d - vmin) / max(vmax - vmin, 1e-9), 0, 1)
    return plt.get_cmap("magma")(1.0 - norm)[..., :3].astype(np.float32)


def viz_trajectory(
    trajectories: Dict[str, np.ndarray],
    path: str,
    title: str = "Trajectory predictions",
    elev: float = 25.0,
    azim: float = -60.0,
) -> None:
    """3D trajectory comparison plot (figure type 1).

    Args:
        trajectories: name → (N, 3) positions; "Ground Truth" drawn thick
            black, ours last/high-contrast — the reference figure's style.
    """
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(111, projection="3d")
    for name, pos in trajectories.items():
        if name.lower().startswith("ground"):
            ax.plot(pos[:, 0], pos[:, 1], pos[:, 2], "k-", lw=2.5, label=name)
        else:
            ax.plot(pos[:, 0], pos[:, 1], pos[:, 2], lw=1.5, label=name)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.legend(fontsize=8)
    ax.set_title(title)
    ax.view_init(elev=elev, azim=azim)
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)


def viz_depth_grid(
    rgb: np.ndarray,
    gt_depth: np.ndarray,
    preds: Dict[str, np.ndarray],
    path: str,
    max_depth: float = 1.0,
) -> None:
    """Qualitative depth grid (figure type 2): top row GT depth + RGB; one
    row per method with predicted depth + signed error map."""
    from colvo.evaluation.depth import signed_error_map

    n_rows = 1 + len(preds)
    fig, axes = plt.subplots(n_rows, 2, figsize=(7, 2.6 * n_rows))
    axes = np.atleast_2d(axes)
    axes[0, 0].imshow(colormap_depth(gt_depth))
    axes[0, 0].set_title("GT depth")
    axes[0, 1].imshow(np.clip(rgb, 0, 1))
    axes[0, 1].set_title("RGB")
    vmax = None
    for i, (name, pred) in enumerate(preds.items(), start=1):
        axes[i, 0].imshow(colormap_depth(pred))
        axes[i, 0].set_title(f"{name} depth", fontsize=9)
        err = signed_error_map(gt_depth, pred, max_depth=max_depth)
        lim = np.percentile(np.abs(err), 98) + 1e-9 if vmax is None else vmax
        axes[i, 1].imshow(err, cmap="coolwarm", vmin=-lim, vmax=lim)
        axes[i, 1].set_title(f"{name} signed error", fontsize=9)
    for ax in axes.ravel():
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)


def viz_recon(
    points: np.ndarray,
    path: str,
    colors: Optional[np.ndarray] = None,
    trajectory: Optional[np.ndarray] = None,
    polyps: Optional[np.ndarray] = None,
    polyp_errors: Optional[Sequence[float]] = None,
    title: str = "3D colon reconstruction",
    max_points: int = 60000,
) -> None:
    """Reconstruction render (figure type 3): point cloud + camera
    trajectory arrows + polyp markers with per-polyp error labels."""
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    _draw_recon_ax(ax, points, colors, trajectory, polyps, polyp_errors,
                   title, max_points)
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)


def viz_recon_pair(
    left: dict,
    right: dict,
    path: str,
    suptitle: str = "3D colon reconstruction — GT vs ours",
    max_points: int = 60000,
) -> None:
    """Side-by-side reconstruction comparison (the reference's flagship
    figure shape, imgs/3Dcolonreconstruction.png: GT colon next to the
    stitched prediction, with trajectory arrows + polyp markers).

    ``left``/``right``: dicts with keys ``points`` (required) and optional
    ``colors``, ``trajectory``, ``polyps``, ``polyp_errors``, ``title``.
    Both panels share axis limits so scale differences are visible.
    """
    fig = plt.figure(figsize=(14, 6))
    axes = [fig.add_subplot(1, 2, i + 1, projection="3d") for i in range(2)]
    for ax, spec in zip(axes, (left, right)):
        _draw_recon_ax(
            ax, spec["points"], spec.get("colors"), spec.get("trajectory"),
            spec.get("polyps"), spec.get("polyp_errors"),
            spec.get("title", ""), max_points,
        )
    # shared limits: union of both clouds
    allp = np.concatenate([np.asarray(left["points"]), np.asarray(right["points"])])
    lo, hi = allp.min(axis=0), allp.max(axis=0)
    for ax in axes:
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_zlim(lo[2], hi[2])
    fig.suptitle(suptitle)
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)


def _draw_recon_ax(
    ax,
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    trajectory: Optional[np.ndarray] = None,
    polyps: Optional[np.ndarray] = None,
    polyp_errors: Optional[Sequence[float]] = None,
    title: str = "",
    max_points: int = 60000,
) -> None:
    if len(points) > max_points:
        sel = np.random.default_rng(0).choice(len(points), max_points, replace=False)
        points = points[sel]
        colors = colors[sel] if colors is not None else None
    ax.scatter(
        points[:, 0], points[:, 1], points[:, 2],
        c=np.clip(colors, 0, 1) if colors is not None else "tan",
        s=0.5, alpha=0.5, linewidths=0,
    )
    if trajectory is not None:
        ax.plot(trajectory[:, 0], trajectory[:, 1], trajectory[:, 2], "b-", lw=2, label="trajectory")
        step = max(len(trajectory) // 12, 1)
        segs = trajectory[::step]
        if len(segs) > 1:
            d = np.diff(segs, axis=0)
            ax.quiver(
                segs[:-1, 0], segs[:-1, 1], segs[:-1, 2],
                d[:, 0], d[:, 1], d[:, 2],
                color="blue", arrow_length_ratio=0.25, lw=1.5,
            )
    if polyps is not None:
        ax.scatter(
            polyps[:, 0], polyps[:, 1], polyps[:, 2],
            c="lime", s=80, marker="o", edgecolors="darkgreen", label="polyps", zorder=5,
        )
        for i, p in enumerate(polyps):
            label = f"{i + 1}"
            if polyp_errors is not None and polyp_errors[i] is not None:
                label += f"  e={polyp_errors[i]:.3f}"
            ax.text(p[0], p[1], p[2], label, fontsize=8, color="darkgreen")
    ax.set_title(title)
    ax.legend(fontsize=8, loc="upper right")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
