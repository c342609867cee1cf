"""Cylinder fitting chain tests (ref utils/fitCylinderWPts3.m + prior + plane)."""

import jax
import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.geometry.curvature import estimate_curvatures
from cylinder_pose_estimation_tpu.geometry.cylinder import (
    apply_prior,
    cylinder_residuals,
    dist_points_to_line,
    fit_cylinder,
    init_cylinder,
)
from cylinder_pose_estimation_tpu.geometry.plane import fit_plane
from cylinder_pose_estimation_tpu.utils.synthetic import cylinder_grid_points, default_stereo


def _scene(noise=0.0, seed=0):
    return cylinder_grid_points(default_stereo(), capacity=128, noise_px=noise, seed=seed)


def axis_angle_deg(d1, d2):
    d1 = d1 / np.linalg.norm(d1)
    d2 = d2 / np.linalg.norm(d2)
    c = abs(float(np.dot(d1, d2)))
    return np.degrees(np.arccos(min(c, 1.0)))


def test_dist_points_to_line():
    pts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 5.0, 2.0], [3.0, 4.0, 0.0]], jnp.float32)
    d = np.asarray(dist_points_to_line(pts, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(d, [1.0, 2.0, 3.0], atol=1e-5)


def test_fit_plane():
    rng = np.random.default_rng(0)
    n = np.asarray([0.2, -0.3, 0.93])
    n /= np.linalg.norm(n)
    u = np.cross(n, [1, 0, 0]); u /= np.linalg.norm(u)
    v = np.cross(n, u)
    pts = 50 * rng.normal(size=(64, 1)) * u + 50 * rng.normal(size=(64, 1)) * v + n * 7.0
    p = np.asarray(fit_plane(jnp.asarray(pts, jnp.float32), jnp.ones(64, bool)))
    assert axis_angle_deg(p[:3], n) < 0.5
    # plane passes through the points: n.x + d ~ 0
    assert abs(p[:3] @ pts[0] + p[3]) < 0.1


def test_curvature_flat_direction_is_axis():
    scene = _scene()
    res = estimate_curvatures(scene.pts3, scene.valid, k=20)
    gt_axis = np.asarray(scene.cyl_params[3:6])
    v = np.asarray(scene.valid)
    dirs = np.asarray(res.flat_direction)[v]
    angles = [axis_angle_deg(d, gt_axis) for d in dirs]
    assert np.median(angles) < 5.0


def test_curvature_at_matches_batched():
    """The single-point fast path must reproduce the all-points batch exactly
    (same distance row, same top_k tie-breaking, same neighborhood math)."""
    from cylinder_pose_estimation_tpu.geometry.curvature import estimate_curvature_at

    scene = _scene(noise=0.2, seed=5)
    full = estimate_curvatures(scene.pts3, scene.valid, k=20)
    for idx in (0, 17, 100):
        one = jax.jit(
            lambda i: estimate_curvature_at(scene.pts3, scene.valid, i, k=20)
        )(jnp.asarray(idx))
        np.testing.assert_allclose(
            np.asarray(one.flat_direction),
            np.asarray(full.flat_direction[idx]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(one.curvatures), np.asarray(full.curvatures[idx]), atol=1e-5
        )


def test_init_cylinder_reasonable():
    scene = _scene()
    init = init_cylinder(scene.pts3, scene.valid, scene.radius)
    p0 = np.asarray(init.params0)
    assert bool(init.ok)
    assert axis_angle_deg(p0[3:6], np.asarray(scene.cyl_params[3:6])) < 10.0
    # Origin should be within a couple radii of the true axis.
    d_axis = np.asarray(
        dist_points_to_line(
            jnp.asarray(p0[None, :3]), scene.cyl_params[:3], scene.cyl_params[3:6]
        )
    )[0]
    assert d_axis < 2 * scene.radius


def test_fit_cylinder_recovers_pose():
    scene = _scene()
    fit = fit_cylinder(scene.pts3, scene.valid, scene.radius)
    p = np.asarray(fit.params)
    assert axis_angle_deg(p[3:6], np.asarray(scene.cyl_params[3:6])) < 0.2
    d_axis = np.asarray(
        dist_points_to_line(
            jnp.asarray(p[None, :3]), scene.cyl_params[:3], scene.cyl_params[3:6]
        )
    )[0]
    assert d_axis < 0.2  # mm: recovered origin lies on the true axis
    fvals = np.asarray(fit.fvals)
    assert fvals[1] <= fvals[0]
    assert fvals[1] < 1e-2  # noise-free residual ~ 0


def test_fit_cylinder_with_noise():
    scene = _scene(noise=0.3, seed=3)
    # Re-triangulate noisy image points for realistic 3D noise.
    from cylinder_pose_estimation_tpu.geometry.triangulate import triangulate

    stereo = default_stereo()
    tri = triangulate(scene.gp1.xy, scene.gp2.xy, stereo, valid=scene.valid)
    fit = fit_cylinder(tri.points3, tri.valid, scene.radius)
    p = np.asarray(fit.params)
    assert axis_angle_deg(p[3:6], np.asarray(scene.cyl_params[3:6])) < 2.0


def test_apply_prior():
    """ref utils/applyCylParamsPrior.m: dir_y >= 0, origin_y = min point y."""
    scene = _scene()
    params = jnp.asarray(
        np.concatenate([np.asarray(scene.cyl_params[:3]), -np.asarray(scene.cyl_params[3:6])]),
        jnp.float32,
    )
    out = np.asarray(apply_prior(params, scene.pts3, scene.valid))
    assert out[4] > 0  # flipped
    v = np.asarray(scene.valid)
    y_min = np.asarray(scene.pts3)[v, 1].min()
    assert abs(out[1] - y_min) < 1e-2
    # Residuals are invariant to the prior (it slides along the axis).
    r0 = np.asarray(cylinder_residuals(scene.cyl_params, scene.pts3, scene.radius))
    r1 = np.asarray(cylinder_residuals(jnp.asarray(out), scene.pts3, scene.radius))
    np.testing.assert_allclose(r0[v], r1[v], atol=1e-2)


def test_fit_cylinder_vmap():
    """Batched-vs-single consistency (SURVEY.md §4 test strategy)."""
    s1 = _scene(seed=0)
    s2 = _scene(noise=0.2, seed=7)
    pts = jnp.stack([s1.pts3, s2.pts3])
    val = jnp.stack([s1.valid, s2.valid])
    batched = jax.vmap(lambda p, v: fit_cylinder(p, v, 45.0).params)(pts, val)
    single = fit_cylinder(s1.pts3, s1.valid, 45.0).params
    # The fit has two gauge freedoms (origin slides along the axis, direction
    # norm is free), so compare solution *invariants*, not raw params: the
    # direction and the residuals against the same points.
    b, s = np.asarray(batched[0]), np.asarray(single)
    assert axis_angle_deg(b[3:6], s[3:6]) < 0.05
    rb = np.asarray(cylinder_residuals(batched[0], s1.pts3, 45.0))
    rs = np.asarray(cylinder_residuals(single, s1.pts3, 45.0))
    v = np.asarray(s1.valid)
    np.testing.assert_allclose(rb[v], rs[v], atol=5e-3)


def test_cylinder_residuals_jac_matches_jacfwd():
    """The closed-form LM Jacobian must equal forward-mode autodiff."""
    import jax

    from cylinder_pose_estimation_tpu.geometry.cylinder import (
        cylinder_residuals,
        cylinder_residuals_jac,
    )

    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.normal(0, 50.0, (40, 3)).astype(np.float32))
    params = jnp.asarray(
        np.concatenate([rng.normal(0, 10.0, 3), rng.normal(0, 1.0, 3)])
        .astype(np.float32)
    )
    j_auto = jax.jacfwd(lambda p: cylinder_residuals(p, pts, 45.0))(params)
    j_form = cylinder_residuals_jac(params, pts, 45.0)
    np.testing.assert_allclose(
        np.asarray(j_form), np.asarray(j_auto), atol=2e-5
    )
