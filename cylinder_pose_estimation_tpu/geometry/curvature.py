"""Principal-curvature estimation over masked point clouds.

Replaces the reference's per-point MATLAB loop (ref utils/estCurvatures.m:1-38:
knnsearch K=20, local plane fit, local coordinate frame, least-squares quadric
z = a x^2 + b xy + c y^2 + d x + e y, eig of the shape matrix
[[2a, b], [b, 2c]]) with fully batched masked operations:

  * kNN: masked pairwise squared distances + lax.top_k (point counts here are
    a few hundred, so the dense (N, N) matrix is tiny for a TPU);
  * per-neighborhood plane fit: batched 3x3 eigh;
  * quadric: one batched (N, 5, 5) normal-equations solve;
  * shape eig: closed-form 2x2.

Deviation from the reference, on purpose: the reference takes K(:, 1, i) --
the eigenvector of the *ascending-ordered* MATLAB eig -- as the cylinder-axis
direction (ref utils/fitCylinderWPts3.m:29).  That ordering only selects the
axis when the fitted normal happens to orient the nonzero curvature positive;
with the opposite normal sign the ascending order puts the circumferential
direction first.  We instead select the direction of **minimum absolute
curvature**, which is the geometric meaning (a cylinder is flat along its
axis) and is sign-stable.  ``principal_directions`` still returns both.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cylinder_pose_estimation_tpu.ops.linalg import eigh2x2, solve_normal_equations


class CurvatureResult(NamedTuple):
    directions: jnp.ndarray   # (N, 3, 2) principal directions (columns)
    curvatures: jnp.ndarray   # (N, 2) eigenvalues of the shape matrix
    flat_direction: jnp.ndarray  # (N, 3) direction of min |curvature|


def _local_frame(normal: jnp.ndarray) -> jnp.ndarray:
    """Local coords with z = normal (ref estCurvatures.m createLocCoordSys).

    x seed is [1,0,0] unless |n . x| > 0.9, then [0,1,0]; y = z x x_seed,
    x = y x z (MATLAB writes cross(z,x) then cross(y,z)).
    """
    x0 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], normal.dtype), normal.shape)
    x1 = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], normal.dtype), normal.shape)
    use_alt = (jnp.abs(normal[..., 0]) > 0.9)[..., None]
    xs = jnp.where(use_alt, x1, x0)
    y = jnp.cross(normal, xs)
    y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-12)
    x = jnp.cross(y, normal)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    return jnp.stack([x, y, normal], axis=-1)  # (..., 3, 3) columns


def estimate_curvatures(
    pts: jnp.ndarray, valid: jnp.ndarray, k: int = 20
) -> CurvatureResult:
    """pts (N, 3), valid (N,) -> per-point principal curvature frame.

    Masked points receive garbage outputs under their own mask.  If fewer than
    k valid points exist, neighborhoods duplicate the nearest valid points
    (top_k over masked distances), which degrades gracefully.
    """
    n = pts.shape[0]
    dtype = pts.dtype
    diff = pts[:, None, :] - pts[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    big = jnp.asarray(1e30, dtype)
    d2 = jnp.where(valid[None, :], d2, big)
    # k nearest (including self, as knnsearch of a set against itself does).
    k = min(k, n)
    _, nbr_idx = jax.lax.top_k(-d2, k)            # (N, k)
    nbr = pts[nbr_idx]                            # (N, k, 3)
    nbr_valid = valid[nbr_idx]                    # (N, k)

    # Local plane per neighborhood -> normal (smallest eigvec of covariance).
    w = nbr_valid.astype(dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(nbr * w, axis=-2, keepdims=True) / cnt
    cd = (nbr - mean) * w
    cov = jnp.swapaxes(cd, -1, -2) @ cd / jnp.maximum(cnt[..., 0, :, None] - 1.0, 1.0)
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[..., :, 0]                      # (N, 3)

    frame = _local_frame(normal)                  # (N, 3, 3)
    local = (nbr - mean) @ frame                  # (N, k, 3)
    x, y, z = local[..., 0], local[..., 1], local[..., 2]
    a = jnp.stack([x * x, x * y, y * y, x, y], axis=-1)  # (N, k, 5)
    coeffs = solve_normal_equations(a, z, nbr_valid.astype(dtype))  # (N, 5)

    evals, evecs2 = eigh2x2(2.0 * coeffs[..., 0], coeffs[..., 1], 2.0 * coeffs[..., 2])
    directions = frame[..., :2] @ evecs2          # (N, 3, 2)
    flat = jnp.argmin(jnp.abs(evals), axis=-1)    # min |curvature| -> axis dir
    flat_dir = jnp.take_along_axis(
        directions, flat[:, None, None].repeat(3, 1), axis=-1
    )[..., 0]
    return CurvatureResult(directions=directions, curvatures=evals, flat_direction=flat_dir)
