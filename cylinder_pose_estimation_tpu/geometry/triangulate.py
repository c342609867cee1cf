"""Batched two-view triangulation with reprojection errors.

Replaces MATLAB's built-in ``triangulate`` (call sites:
ref utils/fitSingleCylinder.m:15, utils/chooseIdx.m:57,
utils/triangulateWithThreshold.m:28) with a dense, vmappable DLT:

  * per point, the 4x4 DLT system rows are x*P3 - P1, y*P3 - P2 for both
    views; the homogeneous solution is the eigenvector of A^T A with the
    smallest eigenvalue.  A symmetric 4x4 eigendecomposition is far friendlier
    to XLA/TPU than per-point SVD and is numerically equivalent for
    well-conditioned stereo.
  * the per-point reprojection error is the mean of the two views' Euclidean
    pixel errors, matching MATLAB triangulate's reprojectionErrors output that
    the reference thresholds on (ref utils/chooseIdx.m:66, 0.3 px).

Points are assumed to live in *undistorted* pixel space: the reference
undistorts full images up front (ref utils/preProcessing.m:4-21,
utils/iotool.py:22-39) and triangulates without distortion terms.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cylinder_pose_estimation_tpu.types import StereoParams, TriangulationResult


def camera_matrices(stereo: StereoParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """P1 = K1 [I | 0], P2 = K2 [R | t] with X2 = T_C2_C1 . X1 (column form)."""
    k1 = stereo.cam1.k
    k2 = stereo.cam2.k
    rt = stereo.t_c2_c1[:3, :4]
    p1 = jnp.concatenate([k1, jnp.zeros((3, 1), dtype=k1.dtype)], axis=1)
    p2 = k2 @ rt
    return p1, p2


def _normalize_pixels(xy: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized camera coordinates via inv(K) (closed form)."""
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    s = k[0, 1]
    yn = (xy[..., 1] - cy) / fy
    xn = (xy[..., 0] - cx - s * yn) / fx
    return jnp.stack([xn, yn], axis=-1)


def triangulate(
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    stereo: StereoParams,
    valid: jnp.ndarray | None = None,
) -> TriangulationResult:
    """DLT-triangulate (..., M, 2) point pairs; all-array, no control flow.

    Works in K-normalized camera coordinates so the 4x4 DLT system has O(1)
    entries -- pixel-space DLT squares a ~1e3 dynamic range through A^T A,
    which costs ~3 digits of float32 accuracy (mm-level error at 0.6 m range);
    normalized it recovers micron-level points without float64.

    Invalid slots return ZERO points (not garbage): the regularized identity
    system yields a homogeneous solution with w ~ 0, i.e. ~1e12-scale points
    whose squares overflow float32 to inf/nan inside downstream masked sums
    (masked weights multiply AFTER the squaring: inf * 0 = nan).  Zeroing
    under the final mask keeps every masked consumer finite.
    """
    dtype = xy1.dtype
    rt1 = jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], axis=1)
    rt2 = stereo.t_c2_c1[:3, :4]
    xn1 = _normalize_pixels(xy1, stereo.cam1.k)
    xn2 = _normalize_pixels(xy2, stereo.cam2.k)

    def rows(xn, p):
        # (..., M, 2, 4): [x * P3 - P1; y * P3 - P2]
        return xn[..., :, :, None] * p[2][None, :] - p[:2]

    a = jnp.concatenate([rows(xn1, rt1), rows(xn2, rt2)], axis=-2)  # (..., M, 4, 4)
    # Balance the homogeneous column: translations are mm-scale (~1e2) while
    # the normalized-coordinate columns are O(1); scale the last column down
    # so A^T A stays well-conditioned in float32.
    scale = jnp.asarray([1.0, 1.0, 1.0, 0.01], dtype)
    a = a * scale
    ata = jnp.swapaxes(a, -1, -2) @ a
    if valid is not None:
        eye = jnp.eye(4, dtype=dtype)
        ata = jnp.where(valid[..., None, None], ata, eye)
    # Smallest-eigenvalue eigenvector of the symmetric 4x4.
    _, vecs = jnp.linalg.eigh(ata)
    xh = vecs[..., :, 0] * scale  # undo column balancing
    w = xh[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    pts3 = xh[..., :3] / safe_w[..., None]

    err = reprojection_errors(pts3, xy1, xy2, stereo)
    ok = jnp.isfinite(err) & (jnp.abs(w) > 1e-12)
    if valid is not None:
        ok = ok & valid
    ok = ok & jnp.all(jnp.isfinite(pts3), axis=-1)
    pts3 = jnp.where(ok[..., None], pts3, 0.0)
    err = jnp.where(ok, err, 0.0)
    return TriangulationResult(points3=pts3, reproj_error=err, valid=ok)


def reprojection_errors(
    pts3: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray, stereo: StereoParams
) -> jnp.ndarray:
    """Mean over the two views of the Euclidean pixel reprojection error."""
    p1, p2 = camera_matrices(stereo)
    ph = jnp.concatenate([pts3, jnp.ones_like(pts3[..., :1])], axis=-1)

    def proj(p):
        h = ph @ p.T
        return h[..., :2] / (h[..., 2:3] + 1e-12)

    e1 = jnp.linalg.norm(proj(p1) - xy1, axis=-1)
    e2 = jnp.linalg.norm(proj(p2) - xy2, axis=-1)
    return 0.5 * (e1 + e2)


def triangulate_with_threshold(
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    stereo: StereoParams,
    error_threshold: float,
    valid: jnp.ndarray | None = None,
) -> TriangulationResult:
    """Triangulate and keep points under the reprojection-error threshold.

    Equivalent of ref utils/triangulateWithThreshold.m:16-43, including its
    fallback: if the threshold empties the set, return the unfiltered
    correspondences (ref :40-43) -- expressed as a mask-level jnp.where so it
    survives vmap.
    """
    res = triangulate(xy1, xy2, stereo, valid=valid)
    passed = res.valid & (res.reproj_error < error_threshold)
    any_passed = jnp.any(passed)
    final = jnp.where(any_passed, passed, res.valid)
    return TriangulationResult(res.points3, res.reproj_error, final)
