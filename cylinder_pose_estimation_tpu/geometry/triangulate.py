"""Batched two-view triangulation with reprojection errors.

Replaces MATLAB's built-in ``triangulate`` (call sites:
ref utils/fitSingleCylinder.m:15, utils/chooseIdx.m:57,
utils/triangulateWithThreshold.m:28) with a dense, vmappable DLT:

  * per point, the 4x4 DLT system rows are x*P3 - P1, y*P3 - P2 for both
    views; with w fixed to 1 (finite scene points) the spatial coordinates
    solve a symmetric 3x3 normal system in closed form -- pure elementwise
    arithmetic that XLA fuses into one kernel, far friendlier to TPU than
    per-point SVD/eigh and equivalent for well-conditioned stereo.
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

from cylinder_pose_estimation_tpu.ops.linalg import mm

from cylinder_pose_estimation_tpu.types import StereoParams, TriangulationResult


def camera_matrices(stereo: StereoParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """P1 = K1 [I | 0], P2 = K2 [R | t] with X2 = T_C2_C1 . X1 (column form)."""
    k1 = stereo.cam1.k
    k2 = stereo.cam2.k
    rt = stereo.t_c2_c1[:3, :4]
    p1 = jnp.concatenate([k1, jnp.zeros((3, 1), dtype=k1.dtype)], axis=1)
    p2 = mm(k2, rt)
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

    Invalid slots return ZERO points (not garbage): their normal system is
    replaced by identity with a zero right-hand side, and the final mask
    re-zeros anything non-finite -- downstream masked sums stay finite
    (masked weights multiply AFTER squaring, so inf * 0 = nan must never be
    produced).
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
    # Inhomogeneous DLT: finite scene points have w != 0, so fix w = 1 and
    # least-squares the 3 spatial coordinates -- min |B X + c|^2 with
    # B = A[..., :3], c = A[..., 3].  The normal equations are a symmetric
    # 3x3 solved in closed form (adjugate/Cramer): pure elementwise
    # arithmetic that fuses into one kernel, where the previous
    # smallest-eigenvector-of-4x4 (jnp.linalg.eigh) cost ~0.3 ms/frame of
    # batched QR iterations on v5e.  Estimator delta vs the homogeneous TLS
    # form is far below the 1e-3 px parity budget for well-conditioned
    # stereo (normalized coords keep B entries O(1)).
    b = a[..., :, :3]
    c = a[..., :, 3]
    btb = mm(jnp.swapaxes(b, -1, -2), b)  # (..., M, 3, 3)
    btc = jnp.sum(b * c[..., :, None], axis=-2)  # (..., M, 3)
    if valid is not None:
        eye = jnp.eye(3, dtype=dtype)
        btb = jnp.where(valid[..., None, None], btb, eye)
        btc = jnp.where(valid[..., None], btc, 0.0)
    m00, m01, m02 = btb[..., 0, 0], btb[..., 0, 1], btb[..., 0, 2]
    m11, m12, m22 = btb[..., 1, 1], btb[..., 1, 2], btb[..., 2, 2]
    c0 = m11 * m22 - m12 * m12
    c1 = m02 * m12 - m01 * m22
    c2 = m01 * m12 - m02 * m11
    det = m00 * c0 + m01 * c1 + m02 * c2
    a11 = m00 * m22 - m02 * m02
    a12 = m01 * m02 - m00 * m12
    a22 = m00 * m11 - m01 * m01
    r0, r1, r2 = -btc[..., 0], -btc[..., 1], -btc[..., 2]
    safe_det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    pts3 = jnp.stack(
        [
            (c0 * r0 + c1 * r1 + c2 * r2) / safe_det,
            (c1 * r0 + a11 * r1 + a12 * r2) / safe_det,
            (c2 * r0 + a12 * r1 + a22 * r2) / safe_det,
        ],
        axis=-1,
    )

    err = reprojection_errors(pts3, xy1, xy2, stereo)
    ok = jnp.isfinite(err) & (jnp.abs(det) > 1e-20)
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
        h = mm(ph, p.T)
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
