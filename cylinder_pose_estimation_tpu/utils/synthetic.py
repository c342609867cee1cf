"""Synthetic ground truth: stereo rigs, cylinder grids, rendered laser images.

The reference has no tests (SURVEY.md §4); its own geometry
(ref utils/getCylinder.m surface meshing + utils/projPts3.m projection) shows
how to synthesize ground truth, which is what this module does natively:

  * ``default_stereo`` -- a plausible calibrated rig (mm units, ~baseline 120);
  * ``cylinder_grid_points`` -- a laser grid on the camera-facing half of a
    known cylinder, projected into both views, with integer grid indices
    relative to a chosen center -- i.e. perfect GridPoints for both cameras
    plus the 3D ground truth;
  * ``plane_grid_points`` -- same for a calibration plane;
  * ``render_grid_image`` -- an 8-bit image of the projected grid: smooth
    bright curves on dark background with a brighter center blob and an
    optional saturated spot, exercising every detection stage
    (ridge -> joints -> ROI -> bridging -> polyfit -> indexing).

All functions are host-friendly (NumPy in, jnp out where useful); image
rendering is pure jnp and jittable so tests can batch it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.geometry import transforms
from cylinder_pose_estimation_tpu.types import CameraModel, GridPoints, StereoParams


def default_stereo(
    f: float = 900.0,
    cx: float = 320.0,
    cy: float = 240.0,
    baseline: float = 120.0,
    dtype=jnp.float32,
) -> StereoParams:
    """A forward-looking rig with a pure-x baseline and a slight toe-in."""
    k = jnp.array([[f, 0.0, cx], [0.0, f, cy], [0.0, 0.0, 1.0]], dtype=dtype)
    cam = CameraModel(k=k, radial=jnp.zeros(3, dtype), tangential=jnp.zeros(2, dtype))
    # cam2 pose: translated -baseline in x (cam1 coords -> cam2 coords), 2deg toe-in.
    rv = jnp.array([0.0, np.deg2rad(2.0), 0.0], dtype=dtype)
    t = jnp.array([-baseline, 0.0, 8.0], dtype=dtype)
    t_c2_c1 = transforms.vec_to_transform(jnp.concatenate([rv, t]))
    return StereoParams(cam1=cam, cam2=cam, t_c2_c1=t_c2_c1)


class CylinderScene(NamedTuple):
    gp1: GridPoints
    gp2: GridPoints
    pts3: jnp.ndarray       # (N, 3) ground-truth 3D points (cam1 frame)
    valid: jnp.ndarray      # (N,)
    cyl_params: jnp.ndarray  # (6,) ground-truth [origin(on axis), direction]
    radius: float


def cylinder_grid_points(
    stereo: StereoParams,
    origin=(0.0, -60.0, 650.0),
    direction=(0.05, 1.0, 0.02),
    radius: float = 45.0,
    n_rows: int = 9,
    n_cols: int = 9,
    row_spacing: float = 14.0,
    theta_span: float = 1.5,
    capacity: int = 512,
    center_rc: Tuple[int, int] | None = None,
    noise_px: float = 0.0,
    seed: int = 0,
    dtype=jnp.float32,
) -> CylinderScene:
    """Laser grid on a cylinder: rows = constant height, cols = constant angle.

    Returns GridPoints for both views padded to ``capacity`` with masks, plus
    the ground truth.  Grid indices follow the reference convention: integer
    (x_index, y_index) relative to the center point (ref utils/util_cylinder.py
    make_json / pointsStruct2mat.m).
    """
    origin = jnp.asarray(origin, dtype)
    direction = jnp.asarray(direction, dtype)
    direction = direction / jnp.linalg.norm(direction)
    params = jnp.concatenate([origin, direction])
    frame = transforms.cyl_params_to_transform(params)  # y = axis
    x_ax, y_ax, z_ax = frame[:3, 0], frame[:3, 1], frame[:3, 2]
    # Face the camera: surface direction with the most-negative z component.
    phi = jnp.arctan2(-x_ax[2], -z_ax[2])  # maximize -(z component)

    if center_rc is None:
        center_rc = (n_rows // 2, n_cols // 2)
    hs = (jnp.arange(n_rows, dtype=dtype) - center_rc[0]) * row_spacing
    thetas = phi + (jnp.arange(n_cols, dtype=dtype) / max(n_cols - 1, 1) - 0.5) * theta_span

    h_grid, t_grid = jnp.meshgrid(hs, thetas, indexing="ij")  # (R, C)
    surf = (
        origin
        + h_grid[..., None] * y_ax
        + radius * (jnp.cos(t_grid)[..., None] * z_ax + jnp.sin(t_grid)[..., None] * x_ax)
    )  # (R, C, 3)
    pts3 = surf.reshape(-1, 3)

    n = pts3.shape[0]
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)

    def view(pts, cam_t, cam, key):
        p = transforms.transform_points(cam_t[None], pts[None])[0]
        xy = transforms.project_points(p, cam.k)
        if noise_px > 0:
            xy = xy + noise_px * jax.random.normal(key, xy.shape, dtype)
        return xy

    eye = jnp.eye(4, dtype=dtype)
    xy1 = view(pts3, eye, stereo.cam1, k1)
    xy2 = view(pts3, stereo.t_c2_c1, stereo.cam2, k2)

    # Grid indices follow the detector's (and reference's) convention: labels
    # are ranked by image position, so col index must increase with projected
    # x and row index with projected y (ref clean_and_relabel + indexing_data,
    # utils/util_cylinder.py:1154-1206, 1480-1497).  Orient the (theta, h)
    # parametrization accordingly from the view-1 projection.
    xy1_grid = xy1.reshape(n_rows, n_cols, 2)
    col_sign = jnp.where(
        jnp.mean(xy1_grid[:, -1, 0] - xy1_grid[:, 0, 0]) >= 0, 1, -1
    )
    row_sign = jnp.where(
        jnp.mean(xy1_grid[-1, :, 1] - xy1_grid[0, :, 1]) >= 0, 1, -1
    )
    ridx = (jnp.arange(n_rows) - center_rc[0]) * row_sign
    cidx = (jnp.arange(n_cols) - center_rc[1]) * col_sign
    r_grid, c_grid = jnp.meshgrid(ridx, cidx, indexing="ij")
    # Reference cylinder-path id order: (x_index, y_index) = (col, row).
    idx = jnp.stack([c_grid, r_grid], axis=-1).reshape(-1, 2).astype(jnp.int32)

    valid = jnp.ones(n, dtype=bool)
    center_flat = center_rc[0] * n_cols + center_rc[1]

    def pad_gp(xy):
        xy_p = jnp.zeros((capacity, 2), dtype).at[:n].set(xy)
        idx_p = jnp.zeros((capacity, 2), jnp.int32).at[:n].set(idx)
        v_p = jnp.zeros((capacity,), bool).at[:n].set(valid)
        return GridPoints(xy=xy_p, idx=idx_p, valid=v_p, center=xy[center_flat])

    valid_p = jnp.zeros((capacity,), bool).at[:n].set(valid)
    pts3_p = jnp.zeros((capacity, 3), dtype).at[:n].set(pts3)
    return CylinderScene(
        gp1=pad_gp(xy1),
        gp2=pad_gp(xy2),
        pts3=pts3_p,
        valid=valid_p,
        cyl_params=params,
        radius=radius,
    )


class PlaneScene(NamedTuple):
    gp1: GridPoints
    gp2: GridPoints
    pts3: jnp.ndarray
    valid: jnp.ndarray
    plane: jnp.ndarray  # (4,) [n, d]


def plane_grid_points(
    stereo: StereoParams,
    origin=(0.0, 0.0, 700.0),
    normal=(0.05, -0.08, -1.0),
    n_rows: int = 9,
    n_cols: int = 11,
    spacing: float = 18.0,
    capacity: int = 512,
    noise_px: float = 0.0,
    seed: int = 0,
    dtype=jnp.float32,
) -> PlaneScene:
    """Regular grid on a tilted plane, projected into both views."""
    origin = jnp.asarray(origin, dtype)
    normal = jnp.asarray(normal, dtype)
    normal = normal / jnp.linalg.norm(normal)
    # Build an in-plane frame: u = normal x x_hat is ~vertical (the row
    # direction), v completes it ~horizontally (the column direction).
    a = jnp.array([1.0, 0.0, 0.0], dtype)
    u = jnp.cross(normal, a)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(normal, u)

    r0, c0 = n_rows // 2, n_cols // 2
    rr = (jnp.arange(n_rows, dtype=dtype) - r0) * spacing
    cc = (jnp.arange(n_cols, dtype=dtype) - c0) * spacing
    rg, cg = jnp.meshgrid(rr, cc, indexing="ij")
    pts3 = (origin + rg[..., None] * u + cg[..., None] * v).reshape(-1, 3)

    n = pts3.shape[0]
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    eye = jnp.eye(4, dtype=dtype)

    def view(cam_t, cam, key):
        p = transforms.transform_points(cam_t[None], pts3[None])[0]
        xy = transforms.project_points(p, cam.k)
        if noise_px > 0:
            xy = xy + noise_px * jax.random.normal(key, xy.shape, dtype)
        return xy

    xy1 = view(eye, stereo.cam1, k1)
    xy2 = view(stereo.t_c2_c1, stereo.cam2, k2)

    # Index orientation: match the detector's rank-by-position convention
    # (see cylinder_grid_points).
    xy1_grid = xy1.reshape(n_rows, n_cols, 2)
    col_sign = jnp.where(
        jnp.mean(xy1_grid[:, -1, 0] - xy1_grid[:, 0, 0]) >= 0, 1, -1
    )
    row_sign = jnp.where(
        jnp.mean(xy1_grid[-1, :, 1] - xy1_grid[0, :, 1]) >= 0, 1, -1
    )
    ridx = (jnp.arange(n_rows) - r0) * row_sign
    cidx = (jnp.arange(n_cols) - c0) * col_sign
    r_grid, c_grid = jnp.meshgrid(ridx, cidx, indexing="ij")
    # Reference plane-path id order: (row_index, col_index) (SURVEY.md §2a).
    idx = jnp.stack([r_grid, c_grid], axis=-1).reshape(-1, 2).astype(jnp.int32)
    center_flat = r0 * n_cols + c0

    def pad_gp(xy):
        xy_p = jnp.zeros((capacity, 2), dtype).at[:n].set(xy)
        idx_p = jnp.zeros((capacity, 2), jnp.int32).at[:n].set(idx)
        v_p = jnp.zeros((capacity,), bool).at[:n].set(True)
        return GridPoints(xy=xy_p, idx=idx_p, valid=v_p, center=xy[center_flat])

    d = -jnp.dot(normal, origin)
    valid_p = jnp.zeros((capacity,), bool).at[:n].set(True)
    pts3_p = jnp.zeros((capacity, 3), dtype).at[:n].set(pts3)
    return PlaneScene(
        gp1=pad_gp(xy1), gp2=pad_gp(xy2), pts3=pts3_p, valid=valid_p,
        plane=jnp.concatenate([normal, d[None]]),
    )


def render_grid_image(
    gp_xy: jnp.ndarray,
    gp_valid: jnp.ndarray,
    n_rows: int,
    n_cols: int,
    height: int,
    width: int,
    line_sigma: float = 1.6,
    line_gain: float = 170.0,
    center_flat: int | None = None,
    center_gain: float = 70.0,
    background: float = 18.0,
    saturate_center: bool = False,
    col_stride: int = 1,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Render the projected grid as an (H, W) uint8 laser image.

    gp_xy must be the first n_rows*n_cols entries of a scene's GridPoints in
    row-major (row, col) order.  Curves are drawn as Gaussian tubes around the
    polylines connecting grid-adjacent points (rows: along cols; cols: along
    rows), the center point gets a brighter blob (the detector picks the
    brightest joint as origin: ref utils/util_cylinder.py:1350-1571), and an
    optional near-saturated spot exercises the saturation-masking stage.

    ``col_stride > 1`` treats the grid as column-densified: row polylines use
    every column sample (so strongly curved cylinder rows render as the true
    projected arc instead of wide chords -- chord sagitta is a harness
    artifact the detector would faithfully measure), while column curves and
    joints are drawn only at every ``col_stride``-th column (the real laser
    grid).  Generate such a grid with ``cylinder_grid_points(n_cols=
    (C-1)*stride+1, theta_span=span)``: its every stride-th column equals the
    C-column scene's columns exactly (the theta grid is affine in the column
    index).  Column curves are 3D axis-parallel lines, which project to exact
    straight lines, so they need no densification.
    """
    pts = gp_xy[: n_rows * n_cols].reshape(n_rows, n_cols, 2)
    yy = jnp.arange(height, dtype=dtype)[:, None]
    xx = jnp.arange(width, dtype=dtype)[None, :]

    def seg_dist2(img_acc, a, b):
        # Distance from every pixel to segment a-b, accumulated as max response.
        ab = b - a
        ab2 = jnp.maximum(jnp.sum(ab * ab), 1e-6)
        px = xx - a[0]
        py = yy - a[1]
        t = jnp.clip((px * ab[0] + py * ab[1]) / ab2, 0.0, 1.0)
        dx = px - t * ab[0]
        dy = py - t * ab[1]
        d2 = dx * dx + dy * dy
        return jnp.maximum(img_acc, jnp.exp(-d2 / (2.0 * line_sigma**2)))

    resp = jnp.zeros((height, width), dtype)

    # Row curves: consecutive columns within each row.
    a_r = pts[:, :-1].reshape(-1, 2)
    b_r = pts[:, 1:].reshape(-1, 2)
    # Col curves: consecutive rows within each (non-densified) column.
    pts_c = pts[:, ::col_stride]
    a_c = pts_c[:-1].transpose(1, 0, 2).reshape(-1, 2)
    b_c = pts_c[1:].transpose(1, 0, 2).reshape(-1, 2)
    segs_a = jnp.concatenate([a_r, a_c], axis=0)
    segs_b = jnp.concatenate([b_r, b_c], axis=0)

    def body(i, acc):
        return seg_dist2(acc, segs_a[i], segs_b[i])

    resp = jax.lax.fori_loop(0, segs_a.shape[0], body, resp)
    img = background + line_gain * resp

    if center_flat is None:
        center_flat = (n_rows // 2) * n_cols + (n_cols // 2)
    c = gp_xy[center_flat]
    d2c = (xx - c[0]) ** 2 + (yy - c[1]) ** 2
    img = img + center_gain * jnp.exp(-d2c / (2.0 * (2.5 * line_sigma) ** 2))
    if saturate_center:
        # Wide enough to survive the detector's 19x19 pre-threshold blur
        # (real specular blobs are tens of pixels across).
        img = jnp.where(d2c < (8.0 * line_sigma) ** 2, 255.0, img)

    return jnp.clip(img, 0.0, 255.0).astype(jnp.uint8)
