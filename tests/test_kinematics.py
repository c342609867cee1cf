"""Pan/tilt forward kinematics vs a direct NumPy composition (ref utils/getTAGVcyl.m)."""

import numpy as np

from cylinder_pose_estimation_tpu.config import KinematicsConfig
from cylinder_pose_estimation_tpu.geometry.kinematics import t_agv_cyl


def numpy_t_agv_cyl(pan, tilt, l1=321.1, l2=143.1, h=110.0):
    cp, sp = np.cos(pan), np.sin(pan)
    ct, st = np.cos(-tilt), np.sin(-tilt)
    t_a_p = np.array([[cp, -sp, 0, 0], [sp, cp, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    t_p_t0 = np.eye(4); t_p_t0[0, 3] = -l2
    t_t0_t1 = np.eye(4); t_t0_t1[2, 3] = -np.tan(tilt) * abs(l2)
    t_t1_t2 = np.array([[ct, 0, st, 0], [0, 1, 0, 0], [-st, 0, ct, 0], [0, 0, 0, 1]])
    t_t2_cyl = np.array([[0, -1, 0, l1], [-1, 0, 0, 0], [0, 0, -1, h], [0, 0, 0, 1]])
    return t_a_p @ t_p_t0 @ t_t0_t1 @ t_t1_t2 @ t_t2_cyl


def test_zero_angles():
    out = np.asarray(t_agv_cyl(0.0, 0.0))
    np.testing.assert_allclose(out, numpy_t_agv_cyl(0.0, 0.0), atol=1e-5)


def test_random_angles_match_numpy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        pan = rng.uniform(-np.pi, np.pi)
        tilt = rng.uniform(-0.6, 0.6)
        out = np.asarray(t_agv_cyl(pan, tilt))
        np.testing.assert_allclose(out, numpy_t_agv_cyl(pan, tilt), atol=1e-4)


def test_batched():
    pans = np.linspace(-1, 1, 5)
    tilts = np.linspace(-0.3, 0.3, 5)
    out = np.asarray(t_agv_cyl(pans, tilts))
    assert out.shape == (5, 4, 4)
    for i in range(5):
        np.testing.assert_allclose(out[i], numpy_t_agv_cyl(pans[i], tilts[i]), atol=1e-4)


def test_config_override():
    cfg = KinematicsConfig(l1=300.0, l2=100.0, h=50.0)
    out = np.asarray(t_agv_cyl(0.3, 0.1, cfg))
    np.testing.assert_allclose(out, numpy_t_agv_cyl(0.3, 0.1, 300.0, 100.0, 50.0), atol=1e-4)
