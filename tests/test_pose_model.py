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
