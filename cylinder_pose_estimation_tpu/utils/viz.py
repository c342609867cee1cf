"""Host-side visualization (matplotlib), mirroring the reference's debug views.

Covers the reference viz inventory (SURVEY.md §2b):
  * draw_grid_points        -- colored by column index (ref utils/drawGridPoints.m:5-17)
  * cylinder_mesh           -- surface mesh from axis + radius (ref utils/getCylinder.m:1-113)
  * draw_cylinder           -- 3-ring wireframe + axis projected through K
                               (ref utils/drawCylinder.m:8-23)
  * plot_reprojection_errors -- per-point error stem plot with stats in the
                               title (ref utils/plotReprojectionErrors.m:3-27)
  * visualize_cylinder_fitting -- 3D points + init/final cylinder surfaces
                               (ref utils/visualizeCylinderFitting.m:1-100)
  * plot_fvals              -- init-vs-final error curves (ref utils/drawFvals.m:14-49)
  * plot_cylinders_3d       -- multiple cylinders in 3D (ref utils/plotCylinders3D.m)
  * overlay_detection       -- detection overlay image like the drivers'
                               "<name>_arc.png" outputs
                               (ref python_grid_detection_cylinder.py:54-56)

Everything takes NumPy-converted arrays; matplotlib is imported lazily so the
device pipeline never depends on it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from cylinder_pose_estimation_tpu.types import GridPoints


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def cylinder_mesh(
    params: np.ndarray,
    radius: float,
    half_length: float = 100.0,
    n_theta: int = 32,
    n_h: int = 9,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cylinder surface mesh around the axis (ref utils/getCylinder.m).

    params: [origin(3), direction(3)].  Returns X, Y, Z arrays (n_h, n_theta).
    """
    from cylinder_pose_estimation_tpu.geometry.transforms import (
        cyl_params_to_transform,
    )

    t = np.asarray(cyl_params_to_transform(np.asarray(params, np.float32)))
    org, x_ax, y_ax, z_ax = t[:3, 3], t[:3, 0], t[:3, 1], t[:3, 2]
    theta = np.linspace(0, 2 * np.pi, n_theta)
    hs = np.linspace(-half_length, half_length, n_h)
    pts = (
        org[None, None]
        + hs[:, None, None] * y_ax
        + radius * (np.cos(theta)[None, :, None] * z_ax + np.sin(theta)[None, :, None] * x_ax)
    )
    return pts[..., 0], pts[..., 1], pts[..., 2]


def draw_grid_points(ax, gp: GridPoints, marker_size: float = 12.0) -> None:
    """Scatter grid points colored by column index (ref utils/drawGridPoints.m)."""
    xy = np.asarray(gp.xy)
    idx = np.asarray(gp.idx)
    v = np.asarray(gp.valid)
    ax.scatter(xy[v, 0], xy[v, 1], c=idx[v, 0], cmap="hsv", s=marker_size)
    center = np.asarray(gp.center)
    ax.plot(center[0], center[1], "w+", markersize=12, markeredgewidth=2)


def draw_cylinder(
    ax,
    params: np.ndarray,
    radius: float,
    k: np.ndarray,
    half_length: float = 100.0,
    color: str = "lime",
) -> None:
    """Project a 3-ring wireframe + axis segment into the image
    (ref utils/drawCylinder.m:8-23)."""
    from cylinder_pose_estimation_tpu.geometry.transforms import project_points

    import jax.numpy as jnp

    xs, ys, zs = cylinder_mesh(params, radius, half_length, n_theta=48, n_h=3)
    for i in range(3):
        ring = np.stack([xs[i], ys[i], zs[i]], axis=-1)
        uv = np.asarray(project_points(jnp.asarray(ring, jnp.float32), jnp.asarray(k)))
        ax.plot(uv[:, 0], uv[:, 1], color=color, linewidth=1.0)
    p = np.asarray(params, np.float64)
    axis_pts = np.stack(
        [p[:3] - half_length * p[3:6] / np.linalg.norm(p[3:6]),
         p[:3] + half_length * p[3:6] / np.linalg.norm(p[3:6])]
    )
    uv = np.asarray(project_points(jnp.asarray(axis_pts, jnp.float32), jnp.asarray(k)))
    ax.plot(uv[:, 0], uv[:, 1], color=color, linewidth=1.5, linestyle="--")


def plot_reprojection_errors(errors: np.ndarray, valid: np.ndarray, path: Optional[str] = None):
    """Per-point reprojection error plot with mean/max in the title
    (ref utils/plotReprojectionErrors.m:13-27)."""
    plt = _plt()
    e = np.asarray(errors)[np.asarray(valid)]
    fig, ax = plt.subplots(figsize=(7, 3.5))
    ax.stem(np.arange(e.shape[0]), e)
    ax.set_xlabel("point")
    ax.set_ylabel("reprojection error [px]")
    ax.set_title(f"mean={e.mean():.4f}px  max={e.max():.4f}px  n={e.shape[0]}")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def visualize_cylinder_fitting(
    pts3: np.ndarray,
    valid: np.ndarray,
    params0: np.ndarray,
    params: np.ndarray,
    radius: float,
    path: Optional[str] = None,
):
    """3D points + initial/final cylinder surfaces
    (ref utils/visualizeCylinderFitting.m)."""
    plt = _plt()
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    p = np.asarray(pts3)[np.asarray(valid)]
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=4, c="k", label="points")
    for prm, color, label in ((params0, "tab:orange", "init"), (params, "tab:green", "final")):
        xs, ys, zs = cylinder_mesh(np.asarray(prm), radius)
        ax.plot_surface(xs, ys, zs, alpha=0.25, color=color, label=label)
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_fvals(fvals: np.ndarray, path: Optional[str] = None):
    """Init-vs-final per-frame errors as sqrt(fval) curves
    (ref utils/drawFvals.m:14-49)."""
    plt = _plt()
    f = np.sqrt(np.maximum(np.asarray(fvals), 0.0))  # (F, 2)
    fig, ax = plt.subplots(figsize=(7, 3.5))
    ax.plot(f[:, 0], "o-", label="init")
    ax.plot(f[:, 1], "s-", label="optimized")
    ax.set_xlabel("frame")
    ax.set_ylabel("sqrt(fval) [mm]")
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_cylinders_3d(
    params_list, radius: float, pts3=None, valid=None, path: Optional[str] = None
):
    """Multiple cylinders in 3D (ref utils/plotCylinders3D.m, drawMultiCyl.m)."""
    plt = _plt()
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    if pts3 is not None:
        for f in range(len(pts3)):
            p = np.asarray(pts3[f])[np.asarray(valid[f])]
            ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=3)
    for prm in params_list:
        xs, ys, zs = cylinder_mesh(np.asarray(prm), radius)
        ax.plot_surface(xs, ys, zs, alpha=0.2)
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def animate_orbit(
    pts3: np.ndarray,
    valid: np.ndarray,
    params: np.ndarray,
    radius: float,
    path: str,
    n_frames: int = 12,
):
    """Orbiting 3D views saved as a frame strip (ref utils/animateOrbit.m).

    matplotlib-Agg stand-in for the MATLAB camorbit animation: renders
    n_frames azimuth steps into one horizontal strip image."""
    plt = _plt()
    fig = plt.figure(figsize=(2.2 * n_frames, 2.4))
    p = np.asarray(pts3)[np.asarray(valid)]
    xs, ys, zs = cylinder_mesh(np.asarray(params), radius)
    for i in range(n_frames):
        ax = fig.add_subplot(1, n_frames, i + 1, projection="3d")
        ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=1, c="k")
        ax.plot_surface(xs, ys, zs, alpha=0.2, color="tab:green")
        ax.view_init(elev=20.0, azim=360.0 * i / n_frames)
        ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)


def overlay_detection(
    image: np.ndarray, gp: GridPoints, path: Optional[str] = None
):
    """Detection overlay like the reference drivers' "<name>_arc.png"
    (ref python_grid_detection_cylinder.py:54-56)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 6))
    img = np.asarray(image)
    ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
    draw_grid_points(ax, gp)
    ax.set_axis_off()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig
