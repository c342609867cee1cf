"""Triangulation property tests (replacing MATLAB built-in triangulate)."""

import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.geometry import transforms as tf
from cylinder_pose_estimation_tpu.geometry.triangulate import (
    triangulate,
    triangulate_with_threshold,
)
from cylinder_pose_estimation_tpu.utils.synthetic import cylinder_grid_points, default_stereo


def test_triangulate_recovers_points():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    res = triangulate(scene.gp1.xy, scene.gp2.xy, stereo, valid=scene.valid)
    v = np.asarray(scene.valid)
    err3d = np.linalg.norm(np.asarray(res.points3 - scene.pts3), axis=-1)[v]
    assert err3d.max() < 0.05  # mm, noise-free
    assert np.asarray(res.reproj_error)[v].max() < 1e-2  # px


def test_reprojection_error_reflects_noise():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128, noise_px=0.5, seed=5)
    res = triangulate(scene.gp1.xy, scene.gp2.xy, stereo, valid=scene.valid)
    v = np.asarray(scene.valid)
    errs = np.asarray(res.reproj_error)[v]
    assert 0.05 < errs.mean() < 1.5


def test_threshold_filters_outliers():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    # Corrupt one match across the epipolar line (y: baseline is along x, so
    # an x shift would be absorbed as a depth change with ~zero residual).
    xy2 = scene.gp2.xy.at[3, 1].add(25.0)
    res = triangulate_with_threshold(scene.gp1.xy, xy2, stereo, 0.5, valid=scene.valid)
    v = np.asarray(res.valid)
    assert not v[3]
    assert v[np.asarray(scene.valid)].sum() == np.asarray(scene.valid).sum() - 1


def test_threshold_fallback_when_all_filtered():
    """If nothing passes, return unfiltered (ref utils/triangulateWithThreshold.m:40-43)."""
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128, noise_px=3.0, seed=2)
    res = triangulate_with_threshold(
        scene.gp1.xy, scene.gp2.xy, stereo, 1e-9, valid=scene.valid
    )
    assert np.asarray(res.valid).sum() == np.asarray(scene.valid).sum()


def test_triangulate_masked_entries_do_not_nan():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    res = triangulate(scene.gp1.xy, scene.gp2.xy, stereo, valid=scene.valid)
    assert np.all(np.isfinite(np.asarray(res.points3)))
