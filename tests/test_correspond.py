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


def test_masked_nonfinite_coords_do_not_poison_raster():
    """Regression (round 4): invalid GridPoints slots may hold nan/inf (e.g.
    diverged Newton intersections with accept=False).  The scatter-free
    rasterizer reduces coords with a one-hot matmul where 0 * nan = nan, so
    unsanitized masked slots poisoned EVERY raster cell -> zero triangulable
    correspondences -> a degenerate [r,0,0,0,0,1] cylinder fit (the full-res
    distorted roundtrip's 88.9 deg axis failure)."""
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)

    def poison(gp):
        inval = ~np.asarray(gp.valid)
        xy = np.asarray(gp.xy).copy()
        xy[inval] = np.nan
        xy[np.where(inval)[0][:3]] = np.inf
        return gp._replace(xy=jnp.asarray(xy))

    gp1, gp2 = poison(scene.gp1), poison(scene.gp2)
    clean = choose_idx(scene.gp1, scene.gp2, stereo)
    dirty = choose_idx(gp1, gp2, stereo)
    assert int(np.asarray(dirty.valid).sum()) == int(np.asarray(clean.valid).sum())
    assert bool(np.isfinite(np.asarray(dirty.xy1)[np.asarray(dirty.valid)]).all())
    np.testing.assert_array_equal(np.asarray(dirty.valid), np.asarray(clean.valid))

    corr_f = find_grid_correspondences(gp1, gp2)
    assert int(np.asarray(corr_f.valid).sum()) == int(
        np.asarray(find_grid_correspondences(scene.gp1, scene.gp2).valid).sum()
    )


def test_detector_invalid_slots_are_finite():
    """The detector boundary itself must emit finite placeholders in masked
    slots (defense in depth for consumers that multiply before masking)."""
    from cylinder_pose_estimation_tpu.config import CylinderDetectConfig
    from cylinder_pose_estimation_tpu.models.detector import detect_grid
    from cylinder_pose_estimation_tpu.utils.synthetic import render_grid_image

    stereo = default_stereo(cx=160.0, cy=120.0)
    scene = cylinder_grid_points(
        stereo, capacity=128, origin=(0.0, -15.0, 560.0), radius=52.0,
        row_spacing=12.0, theta_span=2.2,
    )
    img = render_grid_image(scene.gp1.xy, scene.gp1.valid, 9, 9, 240, 320)
    res = detect_grid(
        img.astype(jnp.float32), CylinderDetectConfig(height=240, width=320)
    )
    assert bool(np.isfinite(np.asarray(res.grid.xy)).all())


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
