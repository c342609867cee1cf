"""Total-least-squares plane fitting (ref utils/fitplane.m).

The reference takes the smallest-eigenvalue eigenvector of the point
covariance as the normal and sets the offset so the plane passes through the
centroid: P = [n, -mean(n . pts)].  Batched + masked here.
"""

from __future__ import annotations

import jax.numpy as jnp

from cylinder_pose_estimation_tpu.ops.linalg import masked_cov, masked_mean


def fit_plane(pts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """pts (..., N, 3), valid (..., N) -> plane (..., 4) [nx, ny, nz, d].

    n has unit norm (eigh returns orthonormal eigenvectors); the plane
    equation is n . x + d = 0, matching ref utils/fitplane.m:12-15.
    """
    cov = masked_cov(pts, valid)
    _, vecs = jnp.linalg.eigh(cov)       # ascending eigenvalues
    normal = vecs[..., :, 0]             # smallest -> normal
    mean = masked_mean(pts, valid)
    d = -jnp.sum(normal * mean, axis=-1)
    return jnp.concatenate([normal, d[..., None]], axis=-1)
