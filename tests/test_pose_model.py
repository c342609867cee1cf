"""End-to-end per-frame pose estimation (ref utils/fitSingleCylinder.m).

This is the minimum end-to-end slice of SURVEY.md §7 step 2: grid points in,
cylinder pose out, on synthetic ground truth -- plus vmap-over-frames and jit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.config import FitConfig
from cylinder_pose_estimation_tpu.geometry.cylinder import dist_points_to_line
from cylinder_pose_estimation_tpu.models.pose import fit_single_cylinder
from cylinder_pose_estimation_tpu.utils.synthetic import cylinder_grid_points, default_stereo


def axis_angle_deg(d1, d2):
    d1 = d1 / np.linalg.norm(d1)
    d2 = d2 / np.linalg.norm(d2)
    return np.degrees(np.arccos(min(abs(float(np.dot(d1, d2))), 1.0)))


def test_pose_recovery_noise_free():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    res = fit_single_cylinder(scene.gp1, scene.gp2, stereo)
    assert float(res.mean_reproj_error) < 0.01
    p = np.asarray(res.params)
    assert axis_angle_deg(p[3:6], np.asarray(scene.cyl_params[3:6])) < 0.3
    d_axis = float(
        np.asarray(
            dist_points_to_line(
                jnp.asarray(p[None, :3]), scene.cyl_params[:3], scene.cyl_params[3:6]
            )
        )[0]
    )
    assert d_axis < 0.3
    # t_cam_cyl y axis = cylinder direction
    t = np.asarray(res.t_cam_cyl)
    assert axis_angle_deg(t[:3, 1], np.asarray(scene.cyl_params[3:6])) < 0.3
    f = np.asarray(res.fvals)
    assert f[1] <= f[0]


def test_pose_recovery_with_noise():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128, noise_px=0.3, seed=9)
    cfg = FitConfig(error_threshold=1.5)
    res = fit_single_cylinder(scene.gp1, scene.gp2, stereo, cfg)
    p = np.asarray(res.params)
    assert axis_angle_deg(p[3:6], np.asarray(scene.cyl_params[3:6])) < 2.0


def test_pose_jit_and_vmap_over_frames():
    stereo = default_stereo()
    scenes = [
        cylinder_grid_points(stereo, capacity=128, seed=s, origin=(10.0 * s, -60.0, 650.0))
        for s in range(3)
    ]
    gp1 = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.gp1 for s in scenes])
    gp2 = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.gp2 for s in scenes])

    fn = jax.jit(jax.vmap(lambda a, b: fit_single_cylinder(a, b, stereo).params))
    batched = np.asarray(fn(gp1, gp2))
    for f, scene in enumerate(scenes):
        assert axis_angle_deg(batched[f, 3:6], np.asarray(scene.cyl_params[3:6])) < 0.5


def test_pose_degenerate_sparse_grids_stay_finite():
    """Near-empty detections (the multichip dryrun's tiny frames) must flow
    through correspond -> triangulate -> fit without inf/nan: triangulate
    zeroes masked-out slots so their ~1e12 homogeneous garbage cannot
    overflow downstream masked sums (regression: reg fval was nan)."""
    from cylinder_pose_estimation_tpu.types import GridPoints

    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128, seed=2)
    # Keep 4 points in view 1 and a DISJOINT set of 4 indices in view 2:
    # correspondence falls back, triangulation keeps nothing.
    v1 = np.zeros(128, bool); v1[:4] = True
    v2 = np.zeros(128, bool); v2[8:12] = True
    gp1 = scene.gp1._replace(valid=jnp.asarray(v1))
    gp2 = scene.gp2._replace(valid=jnp.asarray(v2))
    res = jax.jit(lambda a, b: fit_single_cylinder(a, b, stereo))(gp1, gp2)
    for leaf in jax.tree.leaves(res):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            assert np.isfinite(arr).all(), arr
