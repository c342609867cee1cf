"""Correspondence tests (ref utils/findGridCorrespondences.m, utils/chooseIdx.m)."""

import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.geometry.correspond import (
    choose_idx,
    find_grid_correspondences,
)
from cylinder_pose_estimation_tpu.types import GridPoints
from cylinder_pose_estimation_tpu.utils.synthetic import cylinder_grid_points, default_stereo


def _drop_point(gp: GridPoints, i: int) -> GridPoints:
    return gp._replace(valid=gp.valid.at[i].set(False))


def test_find_grid_correspondences_matches_common_indices():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    gp2 = _drop_point(scene.gp2, 5)
    corr = find_grid_correspondences(scene.gp1, gp2)
    n1 = int(np.asarray(scene.gp1.valid).sum())
    assert int(np.asarray(corr.valid).sum()) == n1 - 1
    # Matched coordinates agree with the inputs at the same grid index.
    v = np.asarray(corr.valid)
    idx = np.asarray(corr.idx)[v]
    xy1 = np.asarray(corr.xy1)[v]
    src_idx = np.asarray(scene.gp1.idx)
    src_xy = np.asarray(scene.gp1.xy)
    lookup = {tuple(src_idx[i]): src_xy[i] for i in range(len(src_idx)) if np.asarray(scene.gp1.valid)[i]}
    for k in range(v.sum()):
        np.testing.assert_allclose(xy1[k], lookup[tuple(idx[k])], atol=1e-5)


def test_choose_idx_selects_clean_points():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    corr = choose_idx(scene.gp1, scene.gp2, stereo, patch_size=3, error_threshold=0.3)
    assert not bool(corr.used_fallback)
    assert int(np.asarray(corr.valid).sum()) == int(np.asarray(scene.gp1.valid).sum())


def test_choose_idx_rejects_epipolar_outlier():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    # Corrupt a corner point across the epipolar direction: every patch that
    # contains it fails the mean-error gate, so it must not be selected.
    bad = 0
    gp2 = scene.gp2._replace(xy=scene.gp2.xy.at[bad, 1].add(15.0))
    corr = choose_idx(scene.gp1, gp2, stereo, patch_size=3, error_threshold=0.3)
    v = np.asarray(corr.valid)
    idx = np.asarray(corr.idx)
    bad_idx = tuple(np.asarray(scene.gp1.idx)[bad])
    hit = (idx[:, 0] == bad_idx[0]) & (idx[:, 1] == bad_idx[1])
    assert not v[hit].any()
    assert v.sum() >= int(np.asarray(scene.gp1.valid).sum()) - 9


def test_choose_idx_fallback_when_no_patch_passes():
    """ref utils/chooseIdx.m:101-104: empty consensus -> plain index match."""
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128, noise_px=4.0, seed=11)
    corr = choose_idx(scene.gp1, scene.gp2, stereo, patch_size=3, error_threshold=1e-6)
    assert bool(corr.used_fallback)
    assert int(np.asarray(corr.valid).sum()) == int(np.asarray(scene.gp1.valid).sum())


def test_choose_idx_requires_complete_patches():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    # Knock out enough interior points that some survivors lose all patches.
    gp2 = scene.gp2
    for i in range(0, 81, 2):
        gp2 = _drop_point(gp2, i)
    corr = choose_idx(scene.gp1, gp2, stereo, patch_size=3, error_threshold=0.3)
    v_sel = int(np.asarray(corr.valid).sum())
    common = int((np.asarray(scene.gp1.valid) & np.asarray(gp2.valid)).sum())
    assert v_sel <= common
