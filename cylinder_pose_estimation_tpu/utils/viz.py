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
  * plot_transformed_data   -- point cloud + axis line before/after a
                               camera->AGV transform (ref utils/plotTransformedData.m)
  * visualize_3d_points     -- 3D scatter, z-axis reversed
                               (ref utils/visualize_3D_points.m)
  * structure_cyl_info / find_matching_idx / figresize -- small utilities
                               (ref utils/structureCylInfo.m, utils/findMatchingIdx.m,
                               utils/figresize.m)

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


def figresize(fig, size: Tuple[float, float] = (1000, 700)) -> None:
    """Resize a figure to ``size`` pixels (ref utils/figresize.m)."""
    fig.set_size_inches(size[0] / fig.dpi, size[1] / fig.dpi)


def visualize_3d_points(points: np.ndarray, path: Optional[str] = None):
    """Scatter a 3D reconstruction with the z-axis reversed
    (ref utils/visualize_3D_points.m)."""
    plt = _plt()
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    p = np.asarray(points)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=8)
    ax.set_xlabel("X"); ax.set_ylabel("Y"); ax.set_zlabel("Z")
    ax.set_title("3D Reconstruction")
    ax.invert_zaxis()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_transformed_data(
    pts3: np.ndarray,
    line: np.ndarray,
    t_cam_agv: np.ndarray,
    radius: float = 45.0,
    path: Optional[str] = None,
):
    """Point cloud + axis line in the camera frame and mapped through a
    camera->AGV transform, each with the line extended 3x beyond both ends
    and a translucent cylinder around it (ref utils/plotTransformedData.m;
    the reference hardcodes its C2A at :23-27 -- here it is an argument,
    normally ``RegistrationResult.t_cam_agv``).

    pts3: (N, 3); line: (2, 3) two points on the cylinder axis."""
    plt = _plt()
    fig = plt.figure(figsize=(8, 7))
    ax = fig.add_subplot(projection="3d")
    t = np.asarray(t_cam_agv, np.float64)
    p = np.asarray(pts3, np.float64)
    ln = np.asarray(line, np.float64)
    p_t = p @ t[:3, :3].T + t[:3, 3]
    ln_t = ln @ t[:3, :3].T + t[:3, 3]
    for pts, l2, color, tag in (
        (p, ln, "tab:red", "original"),
        (p_t, ln_t, "tab:green", "transformed"),
    ):
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=6, c=color,
                   label=f"{tag} points")
        ext = l2[1] - l2[0]
        a, b = l2[0] - 3.0 * ext, l2[1] + 3.0 * ext
        ax.plot(*np.stack([a, b]).T, color=color, linewidth=2,
                label=f"{tag} line")
        axis_dir = ext / max(np.linalg.norm(ext), 1e-12)
        params = np.concatenate([0.5 * (a + b), axis_dir])
        xs, ys, zs = cylinder_mesh(
            params, radius, half_length=0.5 * float(np.linalg.norm(b - a))
        )
        ax.plot_surface(xs, ys, zs, alpha=0.25, color=color)
    ax.set_xlabel("X"); ax.set_ylabel("Y"); ax.set_zlabel("Z")
    ax.legend(loc="upper left", fontsize=7)
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def structure_cyl_info(idx, xs, ys, zs):
    """Select per-frame cylinder meshes by frame index into a list of
    {"X", "Y", "Z"} dicts (ref utils/structureCylInfo.m; the MATLAB struct
    array becomes a list of dicts)."""
    return [{"X": xs[i], "Y": ys[i], "Z": zs[i]} for i in idx]


def find_matching_idx(img_paths, names):
    """Indices of paths whose filename stem is in ``names``
    (ref utils/findMatchingIdx.m)."""
    import os

    out = []
    for i, p in enumerate(img_paths):
        stem = os.path.splitext(os.path.basename(p))[0]
        if stem in names:
            out.append(i)
    return out


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
