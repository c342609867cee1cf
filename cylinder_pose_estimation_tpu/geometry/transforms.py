"""Rigid transforms, rotation parametrizations and projection.

Replaces the reference's MATLAB pose helpers -- vec2T/T2vec
(ref utils/vec2T.m, utils/T2vec.m via rotvec2mat3d/rotmat2vec3d),
cylParams2T (ref utils/cylParams2T.m), transformEuclid
(ref utils/transformEuclid.m), projPts3 (ref utils/projPts3.m) -- with
batched, jit-safe jnp equivalents.  All functions broadcast over leading axes
and avoid data-dependent branching (lax-free closed forms with jnp.where
guards) so they vmap and differentiate cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp

from cylinder_pose_estimation_tpu.ops.linalg import mm

_EPS = 1e-12


def rotvec_to_matrix(rv: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: rotation vector (..., 3) -> rotation matrix (..., 3, 3).

    Equivalent of MATLAB rotvec2mat3d (used by ref utils/vec2T.m:3). Uses the
    Taylor-safe form sin(t)/t, (1-cos t)/t^2 so t -> 0 is exact.
    """
    rv = jnp.asarray(rv)
    t2 = jnp.sum(rv * rv, axis=-1)[..., None, None]  # theta^2
    t = jnp.sqrt(t2)
    small = t < 1e-4
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / jnp.where(small, 1.0, t))
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
    kx, ky, kz = rv[..., 0], rv[..., 1], rv[..., 2]
    zeros = jnp.zeros_like(kx)
    khat = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rv.dtype), khat.shape)
    return eye + a * khat + b * mm(khat, khat)


def matrix_to_rotvec(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> rotation vector (..., 3).

    Equivalent of MATLAB rotmat2vec3d (used by ref utils/T2vec.m:4). Handles
    the theta ~ 0 and theta ~ pi branches without data-dependent control flow.
    """
    r = jnp.asarray(r)
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Antisymmetric part gives axis*sin(theta)
    w = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.linalg.norm(w, axis=-1) * 0.5
    # Generic branch: rv = theta / (2 sin theta) * w, series-safe near 0.
    small = theta[..., None] < 1e-4
    scale = jnp.where(
        small,
        0.5 + theta[..., None] ** 2 / 12.0,
        theta[..., None] / jnp.where(small, 1.0, 2.0 * sin_t[..., None] + _EPS),
    )
    rv_generic = scale * w
    # Near pi: axis from the symmetric part. R + I = 2(axis axis^T) + O(pi-t).
    m = (r + jnp.swapaxes(r, -1, -2)) * 0.5 + jnp.eye(3, dtype=r.dtype)
    diag = jnp.stack([m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    axis = jnp.take_along_axis(m, k[..., None, None].repeat(3, -2), axis=-1)[..., 0]
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    # Fix sign using the antisymmetric part (w = 2 sin(t) axis, sin(t) >= 0)
    sign = jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    rv_pi = theta[..., None] * axis * sign
    near_pi = (jnp.pi - theta[..., None]) < 1e-3
    return jnp.where(near_pi, rv_pi, rv_generic)


def vec_to_transform(v: jnp.ndarray) -> jnp.ndarray:
    """[rotvec(3), t(3)] -> (4, 4) homogeneous transform (ref utils/vec2T.m)."""
    v = jnp.asarray(v)
    r = rotvec_to_matrix(v[..., :3])
    t = v[..., 3:6]
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=v.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_to_vec(t: jnp.ndarray) -> jnp.ndarray:
    """(4, 4) -> [rotvec, t] (ref utils/T2vec.m)."""
    rv = matrix_to_rotvec(t[..., :3, :3])
    return jnp.concatenate([rv, t[..., :3, 3]], axis=-1)


def cyl_params_to_transform(cyl_params: jnp.ndarray) -> jnp.ndarray:
    """Cylinder [origin, direction] -> (4, 4) pose with y = axis.

    Mirrors ref utils/cylParams2T.m: y = dir/|dir|; z = cross([1,0,0], y)
    normalized; x = cross(y, z) normalized.
    """
    cp = jnp.asarray(cyl_params)
    org = cp[..., :3]
    y = cp[..., 3:6]
    y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + _EPS)
    x0 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=cp.dtype), y.shape)
    z = jnp.cross(x0, y)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + _EPS)
    x = jnp.cross(y, z)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + _EPS)
    r = jnp.stack([x, y, z, org], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=cp.dtype), r.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([r, bottom], axis=-2)


def transform_points(t: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to (..., N, 3) points (ref utils/transformEuclid.m)."""
    return mm(pts, jnp.swapaxes(t[..., :3, :3], -1, -2)) + t[..., None, :3, 3]


def project_points(pts3: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection of (..., N, 3) camera-frame points with (3,3) K.

    Equivalent of ref utils/projPts3.m (hom2cart(pts3' * K')').
    """
    h = mm(pts3, jnp.swapaxes(k, -1, -2))
    return h[..., :2] / (h[..., 2:3] + _EPS)


def invert_transform(t: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid (..., 4, 4) transform."""
    r = t[..., :3, :3]
    tr = t[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -mm(rt, tr[..., None])[..., 0]
    top = jnp.concatenate([rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=t.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
