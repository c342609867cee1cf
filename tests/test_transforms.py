"""Property tests for geometry/transforms (ref utils/{vec2T,T2vec,cylParams2T}.m)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cylinder_pose_estimation_tpu.geometry import transforms as tf


def random_rotvecs(n, seed=0, scale=np.pi * 0.9):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0, scale, size=(n, 1))
    return jnp.asarray(axes * angles, jnp.float32)


def test_rotvec_roundtrip():
    rv = random_rotvecs(64)
    r = tf.rotvec_to_matrix(rv)
    rv2 = tf.matrix_to_rotvec(r)
    np.testing.assert_allclose(np.asarray(rv2), np.asarray(rv), atol=2e-5)


def test_rotation_orthonormal():
    rv = random_rotvecs(32, seed=1)
    r = np.asarray(tf.rotvec_to_matrix(rv))
    eye = np.eye(3)
    for m in r:
        np.testing.assert_allclose(m @ m.T, eye, atol=1e-5)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-5)


def test_rotvec_small_angle():
    rv = jnp.asarray([[1e-9, -2e-9, 3e-10]], jnp.float32)
    r = tf.rotvec_to_matrix(rv)
    np.testing.assert_allclose(np.asarray(r[0]), np.eye(3), atol=1e-6)
    rv2 = tf.matrix_to_rotvec(r)
    assert np.all(np.isfinite(np.asarray(rv2)))


def test_rotvec_near_pi():
    axis = np.array([0.6, -0.64, 0.48])
    axis /= np.linalg.norm(axis)
    rv = jnp.asarray([axis * (np.pi - 1e-5)], jnp.float32)
    r = tf.rotvec_to_matrix(rv)
    rv2 = np.asarray(tf.matrix_to_rotvec(r))[0]
    # Compare as rotations (axis may flip sign at pi).
    r2 = np.asarray(tf.rotvec_to_matrix(jnp.asarray([rv2])))[0]
    np.testing.assert_allclose(r2, np.asarray(r)[0], atol=1e-4)


def test_vec_transform_roundtrip():
    rng = np.random.default_rng(3)
    v = jnp.asarray(
        np.concatenate([np.asarray(random_rotvecs(8, 4)), rng.normal(size=(8, 3)) * 100], axis=1),
        jnp.float32,
    )
    t = tf.vec_to_transform(v)
    v2 = tf.transform_to_vec(t)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-3)


def test_invert_transform():
    v = jnp.concatenate([random_rotvecs(4, 7), jnp.ones((4, 3)) * 50.0], axis=1)
    t = tf.vec_to_transform(v)
    ti = tf.invert_transform(t)
    prod = np.asarray(t @ ti)
    for m in prod:
        np.testing.assert_allclose(m, np.eye(4), atol=1e-4)


def test_cyl_params_to_transform():
    """Mirrors ref utils/cylParams2T.m: y column = normalized direction."""
    params = jnp.asarray([1.0, 2.0, 3.0, 0.1, 2.0, 0.3], jnp.float32)
    t = np.asarray(tf.cyl_params_to_transform(params))
    d = np.asarray([0.1, 2.0, 0.3])
    d /= np.linalg.norm(d)
    np.testing.assert_allclose(t[:3, 1], d, atol=1e-6)
    np.testing.assert_allclose(t[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)
    r = t[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_transform_and_project_points():
    v = jnp.asarray([0.0, 0.1, 0.0, 10.0, -5.0, 2.0], jnp.float32)
    t = tf.vec_to_transform(v)
    pts = jnp.asarray([[0.0, 0.0, 100.0], [5.0, 5.0, 200.0]], jnp.float32)
    out = np.asarray(tf.transform_points(t, pts))
    r = np.asarray(tf.rotvec_to_matrix(v[:3]))
    expected = np.asarray(pts) @ r.T + np.asarray([10.0, -5.0, 2.0])
    np.testing.assert_allclose(out, expected, atol=1e-4)

    k = jnp.asarray([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]], jnp.float32)
    xy = np.asarray(tf.project_points(pts, k))
    np.testing.assert_allclose(xy[0], [320.0, 240.0], atol=1e-4)


def test_batched_jit_vmap():
    rv = random_rotvecs(16, 9)
    f = jax.jit(jax.vmap(tf.rotvec_to_matrix))
    out = f(rv)
    assert out.shape == (16, 3, 3)
