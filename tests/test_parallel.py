"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The full GSPMD-pipeline equivalence test is marked slow (minutes of CPU
execution); the fast suite keeps the shard_map-vs-vmap equivalence and the
driver separately exercises the jit_sharded_pipeline path via
__graft_entry__.dryrun_multichip.

Exercise the same code paths the driver's dryrun_multichip validates, plus a
sharded-vs-unsharded equivalence check: data-parallel frame sharding must not
change results (up to f32 reduction-order noise in the registration).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cylinder_pose_estimation_tpu.config import (
    CylinderDetectConfig,
    FitConfig,
    RegistrationConfig,
)
from cylinder_pose_estimation_tpu.models.pipeline import (
    estimate_poses_batch,
    full_experiment,
)
from cylinder_pose_estimation_tpu.parallel.mesh import make_mesh
from cylinder_pose_estimation_tpu.parallel.sharding import (
    jit_sharded_pipeline,
    shard_map_pose,
)
from cylinder_pose_estimation_tpu.utils.synthetic import (
    cylinder_grid_points,
    default_stereo,
    render_grid_image,
)

H, W = 192, 256
N_DEV = 8


# Ground-truth camera<->AGV transform: maps the kinematic cylinder poses in
# front of the camera (axis ~ +y_cam).  The translation is chosen so the
# rendered grid stays FULLY visible in both views across the whole pan range
# on these miniature 192x256 frames: frames whose grid clips the frame edge
# detect partial/origin-shifted grids, get health-masked out of the
# registration, and the remaining near-coplanar viewpoints make the 6-dof
# problem gauge-flat (a genuinely lower-objective wrong pose exists).
_R_GT = np.asarray([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
_T_GT = np.eye(4)
_T_GT[:3, :3] = _R_GT
_T_GT[:3, 3] = [0.0, 158.0, 360.0]

_ANGLES = np.stack(
    [np.linspace(-0.15, 0.15, N_DEV), np.linspace(0.05, -0.05, N_DEV)], axis=-1
).astype(np.float32)


def _frames(stereo, n):
    """Kinematically consistent frames: each scene's cylinder sits at
    T_GT @ t_agv_cyl(pan, tilt), so the registration problem is well-posed."""
    from cylinder_pose_estimation_tpu.geometry.kinematics import t_agv_cyl

    i1, i2 = [], []
    rng = np.random.default_rng(0)
    tac = np.asarray(t_agv_cyl(_ANGLES[:, 0], _ANGLES[:, 1]))
    for k in range(n):
        t_cam_cyl = _T_GT @ tac[k]
        scene = cylinder_grid_points(
            stereo,
            origin=tuple(float(v) for v in t_cam_cyl[:3, 3]),
            direction=tuple(float(v) for v in t_cam_cyl[:3, 1]),
            radius=55.0,
            row_spacing=7.0,
            theta_span=1.1,
            capacity=128,
            seed=k,
        )
        for buf, gp in ((i1, scene.gp1), (i2, scene.gp2)):
            img = render_grid_image(gp.xy, gp.valid, 9, 9, H, W)
            img = jnp.clip(
                img.astype(jnp.float32)
                + jnp.asarray(rng.normal(0, 2.0, (H, W)), jnp.float32),
                0, 255,
            )
            buf.append(img)
    return jnp.stack(i1), jnp.stack(i2)


def _assert_fits_equivalent(fit_a, fit_b):
    """Per-frame fit equivalence up to gauge freedom and f32 layout noise.

    Sharded lowering changes f32 reduction orders, which perturbs the LM
    trajectory; the cylinder parametrization also has two gauge directions
    (origin slides along the axis pre-prior, direction norm is free).
    Compare solution invariants: axis direction, objective value, and the
    reprojection error of the correspondences used.
    """
    pa = np.asarray(fit_a.params)
    pb = np.asarray(fit_b.params)
    for f in range(pa.shape[0]):
        da = pa[f, 3:6] / np.linalg.norm(pa[f, 3:6])
        db = pb[f, 3:6] / np.linalg.norm(pb[f, 3:6])
        ang = np.degrees(np.arccos(min(abs(float(da @ db)), 1.0)))
        assert ang < 2.0, (f, ang)
    fa = np.asarray(fit_a.fvals)[:, 1]
    fb = np.asarray(fit_b.fvals)[:, 1]
    np.testing.assert_allclose(fa, fb, rtol=0.05, atol=0.5)
    np.testing.assert_allclose(
        np.asarray(fit_a.mean_reproj_error),
        np.asarray(fit_b.mean_reproj_error),
        rtol=1e-3, atol=1e-3,
    )


@pytest.mark.slow
def test_sharded_pipeline_matches_unsharded():
    assert jax.device_count() >= N_DEV, "conftest must provide 8 CPU devices"
    stereo = default_stereo(cx=W / 2.0, cy=H / 2.0, baseline=30.0)
    i1, i2 = _frames(stereo, N_DEV)
    angles = jnp.asarray(_ANGLES)
    # min_ok_points proportionate to these small 192x256 scenes (~24-point
    # grids): the production default (20) would mark the sparse-but-good
    # tilted frames not-ok and leave registration only 2 near-identical
    # viewpoints -- an ill-conditioned problem this test isn't about.
    # drop_first_row/drop_last_col OFF: the reference's min-y-ordered prune
    # (r5 oracle-exact, detector stage 6d) sits on a tie boundary for these
    # near-symmetric tilted miniatures and can drop DIFFERENT physical
    # columns in the two views, shifting the index correspondence and
    # poisoning frames 5-6 (reproj ~23 px, registration well_posed=False --
    # the fence works, but this test is about sharding equivalence, not
    # pruning fragility on miniature scenes).
    cfg = CylinderDetectConfig(
        height=H, width=W, cc_iters=8, min_ok_points=5,
        drop_first_row=False, drop_last_col=False,
    )
    fit_cfg = FitConfig(cyl_radius=55.0, lm_iters=40)
    # min_frame_points proportionate too: these miniature frames carry
    # 5-24 triangulated points, and dropping the sparse tilted frames
    # starves the registration of angular spread (the 6-dof objective
    # goes gauge-flat with <= 5 near-coplanar viewpoints).
    reg_cfg = RegistrationConfig(cyl_radius=55.0, lm_iters=10,
                                 min_frame_points=5)

    batch_ref, reg_ref = jax.jit(
        lambda a, b, g: full_experiment(a, b, g, stereo, cfg, fit_cfg, reg_cfg)
    )(i1, i2, angles)

    mesh = make_mesh(jax.devices()[:N_DEV])
    fn = jit_sharded_pipeline(mesh, stereo, cfg, fit_cfg, reg_cfg)
    batch_sh, reg_sh = fn(i1, i2, angles)

    _assert_fits_equivalent(batch_sh.fit, batch_ref.fit)
    # Registration reduces across frames (all-gather + replicated solve);
    # both paths must land near the ground truth.  Compare what the
    # objective actually determines -- the per-frame predicted cylinder
    # AXIS LINES (T @ t_agv_cyl(pan, tilt), axis = y column) -- rather than
    # the raw translation of T: with a ~17 deg total pan swing the
    # objective is nearly flat along the shared axis direction, so the
    # translation component alone is weakly observable even for a correct
    # solution.
    from cylinder_pose_estimation_tpu.geometry.kinematics import t_agv_cyl

    tac = np.asarray(t_agv_cyl(angles[:, 0], angles[:, 1]))
    # The ground-truth closeness claim only binds when the registration's own
    # observability diagnostic says the problem is well-posed.  On these
    # miniature frames (30 mm baseline -> ~3 mm triangulation noise, 17 deg
    # total swing) the r5 reference-exact point sets make the 6-dof landscape
    # admit a lower-objective wrong pose (measured: fval(found) 192 <
    # fval(gt) 298) and well_posed correctly reads False -- the FENCE is the
    # correct behavior, and gt-accuracy of registration on well-posed
    # problems is pinned separately (tests/test_registration.py, incl. the
    # 1x/2x scale-free observability pins).  Sharding equivalence -- this
    # test's actual subject -- is asserted unconditionally above and below.
    assert bool(reg_ref.well_posed) == bool(reg_sh.well_posed)
    for reg in (reg_ref, reg_sh):
        t = np.asarray(reg.t_cam_agv)
        assert np.all(np.isfinite(t))
        if not bool(reg.well_posed):
            continue
        for k in range(N_DEV):
            a_gt = _T_GT @ tac[k]
            a_fd = t @ tac[k]
            da = a_gt[:3, 1] / np.linalg.norm(a_gt[:3, 1])
            db = a_fd[:3, 1] / np.linalg.norm(a_fd[:3, 1])
            ang = np.degrees(np.arccos(min(1.0, abs(float(da @ db)))))
            assert ang < 5.0, (k, ang)
            d = a_fd[:3, 3] - a_gt[:3, 3]
            perp = d - (d @ da) * da
            assert np.linalg.norm(perp) < 10.0, (k, np.linalg.norm(perp))
    np.testing.assert_allclose(
        np.asarray(reg_sh.t_cam_agv), np.asarray(reg_ref.t_cam_agv),
        rtol=0.05, atol=5.0,
    )


@pytest.mark.slow
def test_shard_map_pose_matches_vmap():
    stereo = default_stereo(cx=W / 2.0, cy=H / 2.0, baseline=30.0)
    i1, i2 = _frames(stereo, N_DEV)
    # min_ok_points proportionate to these small 192x256 scenes (~24-point
    # grids): the production default (20) would mark the sparse-but-good
    # tilted frames not-ok and leave registration only 2 near-identical
    # viewpoints -- an ill-conditioned problem this test isn't about.
    cfg = CylinderDetectConfig(height=H, width=W, cc_iters=8, min_ok_points=5)
    fit_cfg = FitConfig(cyl_radius=55.0, lm_iters=40)

    ref = jax.jit(
        lambda a, b: estimate_poses_batch(a, b, stereo, cfg, fit_cfg).fit
    )(i1, i2)
    mesh = make_mesh(jax.devices()[:N_DEV])
    fn = shard_map_pose(mesh, stereo, cfg, fit_cfg)
    out = fn(i1, i2).fit
    _assert_fits_equivalent(out, ref)


def test_shard_map_fit_matches_vmap():
    """Fast multi-device check: the grid-points -> fit stage under an
    8-device shard_map must match the vmap result bit-for-bit shape-wise and
    numerically to f32 noise.  The full image pipelines are exercised by the
    slow tests above and by __graft_entry__.dryrun_multichip each round."""
    from jax.sharding import PartitionSpec as P

    from cylinder_pose_estimation_tpu.config import FitConfig
    from cylinder_pose_estimation_tpu.models.pose import fit_single_cylinder
    from cylinder_pose_estimation_tpu.parallel.mesh import FRAME_AXIS
    from cylinder_pose_estimation_tpu.utils.synthetic import (
        cylinder_grid_points,
        default_stereo,
    )
    from cylinder_pose_estimation_tpu.types import GridPoints

    stereo = default_stereo()
    fit_cfg = FitConfig(cyl_radius=55.0, lm_iters=30)
    scenes = [
        cylinder_grid_points(
            stereo, radius=55.0, origin=(5.0 * k - 15.0, -10.0, 450.0),
            capacity=128, seed=k, noise_px=0.1,
        )
        for k in range(N_DEV)
    ]
    gp1 = GridPoints(*[jnp.stack([s.gp1[i] for s in scenes]) for i in range(4)])
    gp2 = GridPoints(*[jnp.stack([s.gp2[i] for s in scenes]) for i in range(4)])

    def batched(a, b):
        return jax.vmap(
            lambda p, q: fit_single_cylinder(p, q, stereo, fit_cfg)
        )(a, b)

    ref = jax.jit(batched)(gp1, gp2)
    mesh = make_mesh(jax.devices()[:N_DEV])
    fn = jax.jit(
        jax.shard_map(
            batched, mesh=mesh,
            in_specs=(P(FRAME_AXIS), P(FRAME_AXIS)),
            out_specs=P(FRAME_AXIS),
        )
    )
    out = fn(gp1, gp2)
    _assert_fits_equivalent(out, ref)


@pytest.mark.slow
def test_stream_matches_batch():
    """estimate_poses_stream (bounded-memory host chunking for the 10k-frame
    config) is numerically identical to one estimate_poses_batch call,
    including a padded tail chunk."""
    from cylinder_pose_estimation_tpu.models.pipeline import (
        estimate_poses_stream,
    )

    stereo = default_stereo(cx=W / 2.0, cy=H / 2.0, baseline=30.0)
    i1, i2 = _frames(stereo, 5)
    # min_ok_points proportionate to these small 192x256 scenes (~24-point
    # grids): the production default (20) would mark the sparse-but-good
    # tilted frames not-ok and leave registration only 2 near-identical
    # viewpoints -- an ill-conditioned problem this test isn't about.
    cfg = CylinderDetectConfig(height=H, width=W, cc_iters=8, min_ok_points=5)
    fit_cfg = FitConfig(cyl_radius=55.0, lm_iters=20)

    ref = jax.jit(
        lambda a, b: estimate_poses_batch(a, b, stereo, cfg, fit_cfg)
    )(i1, i2)
    got = estimate_poses_stream(i1, i2, stereo, cfg, fit_cfg, chunk=2)

    np.testing.assert_array_equal(
        np.asarray(got.detect1.grid.valid), np.asarray(ref.detect1.grid.valid)
    )
    np.testing.assert_allclose(
        np.asarray(got.detect1.grid.xy), np.asarray(ref.detect1.grid.xy),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.fit.mean_reproj_error),
        np.asarray(ref.fit.mean_reproj_error), atol=1e-4,
    )

    # compact + double-buffered serving mode: the on-device summary of the
    # same chunks, overlapped H2D/compute/D2H, must agree with the batch
    # reference field by field (round-4 streaming redesign: D2H over a
    # remote-attached device is the bottleneck, so serving reads back
    # ~200 B/frame summaries instead of the full pytree).
    from cylinder_pose_estimation_tpu.models.pipeline import frame_health

    smry = estimate_poses_stream(
        i1, i2, stereo, cfg, fit_cfg, chunk=2, compact=True, overlap=True
    )
    np.testing.assert_allclose(
        np.asarray(smry.params), np.asarray(ref.fit.params), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(smry.mean_reproj_error),
        np.asarray(ref.fit.mean_reproj_error), atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(smry.ok),
        np.asarray(ref.detect1.ok) & np.asarray(ref.detect2.ok),
    )
    np.testing.assert_array_equal(
        np.asarray(smry.n_points),
        np.asarray(ref.fit.points_valid).sum(-1).astype(np.int32),
    )
    np.testing.assert_array_equal(
        np.asarray(smry.healthy), np.asarray(jax.jit(frame_health)(ref))
    )

    # overlap=True on the FULL pytree path must also be identical
    got_ov = estimate_poses_stream(
        i1, i2, stereo, cfg, fit_cfg, chunk=2, overlap=True
    )
    np.testing.assert_allclose(
        np.asarray(got_ov.fit.params), np.asarray(ref.fit.params), atol=1e-5
    )


@pytest.mark.slow
def test_stream_survives_undetectable_frames():
    """Serving robustness: a stream containing frames with no grid at all
    (dark noise) must flow through -- failed frames come back ok=False /
    healthy=False with finite summaries, and the good frames around them are
    unaffected (per-frame isolation, SURVEY.md §5 degraded modes; the
    reference's per-image try/except at
    python_grid_detection_cylinder.py:32-44 is the analogue)."""
    from cylinder_pose_estimation_tpu.models.pipeline import (
        estimate_poses_batch,
        estimate_poses_stream,
    )

    stereo = default_stereo(cx=W / 2.0, cy=H / 2.0, baseline=30.0)
    i1, i2 = _frames(stereo, 4)
    rng = np.random.default_rng(3)
    dark1 = np.clip(rng.normal(8, 3, (1, H, W)), 0, 255).astype(np.float32)
    dark2 = np.clip(rng.normal(8, 3, (1, H, W)), 0, 255).astype(np.float32)
    j1 = np.concatenate([i1[:2], dark1, i1[2:]])
    j2 = np.concatenate([i2[:2], dark2, i2[2:]])

    cfg = CylinderDetectConfig(height=H, width=W, cc_iters=8, min_ok_points=5)
    fit_cfg = FitConfig(cyl_radius=55.0, lm_iters=20)

    smry = estimate_poses_stream(
        j1, j2, stereo, cfg, fit_cfg, chunk=2, compact=True, overlap=True
    )
    ok = np.asarray(smry.ok)
    assert not ok[2], "dark frame must not report a detected grid"
    assert not bool(np.asarray(smry.healthy)[2])
    # EVERY summary leaf stays finite even for the failed frame --
    # including grid centers, which for a zero-intersection frame come from
    # an argmax over all -inf brightness and carried raw diverged-Newton
    # coordinates before the round-4 finite-placeholder guard
    for name, leaf in zip(smry._fields, smry):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            assert np.all(np.isfinite(arr)), f"non-finite summary leaf {name}"
    # neighbours are bit-identical to the same frames run without the dark
    # frame present (chunking isolation: frame k's result depends only on
    # frame k)
    ref = jax.jit(
        lambda a, b: estimate_poses_batch(a, b, stereo, cfg, fit_cfg)
    )(i1, i2)
    good_rows = [0, 1, 3, 4]
    np.testing.assert_allclose(
        np.asarray(smry.params)[good_rows],
        np.asarray(ref.fit.params),
        atol=1e-5,
    )


@pytest.mark.slow
def test_stream_sharded_matches_batch():
    """estimate_poses_stream(mesh=...) shards each chunk's frame axis over
    the 8-device mesh and must stay numerically identical to the unsharded
    batch reference -- multi-chip serving is a sharding annotation, not a
    different program (SURVEY.md §5 distributed backend)."""
    from cylinder_pose_estimation_tpu.models.pipeline import (
        estimate_poses_stream,
    )

    stereo = default_stereo(cx=W / 2.0, cy=H / 2.0, baseline=30.0)
    i1, i2 = _frames(stereo, 8)
    # pad the stack to 16 so the stream sees 2 chunks of mesh-divisible 8
    i1 = np.concatenate([i1, i1])
    i2 = np.concatenate([i2, i2])
    cfg = CylinderDetectConfig(height=H, width=W, cc_iters=8, min_ok_points=5)
    fit_cfg = FitConfig(cyl_radius=55.0, lm_iters=20)

    ref = jax.jit(
        lambda a, b: estimate_poses_batch(a, b, stereo, cfg, fit_cfg)
    )(i1, i2)

    mesh = make_mesh(jax.devices()[:N_DEV])
    smry = estimate_poses_stream(
        i1, i2, stereo, cfg, fit_cfg, chunk=8, compact=True, overlap=True,
        mesh=mesh,
    )
    # the partitioned lowering reorders f32 reductions, so compare solution
    # invariants (axis, objective, reproj) exactly like the GSPMD pipeline
    # tests -- StreamPoseSummary duck-types the fit fields the helper reads
    _assert_fits_equivalent(smry, ref.fit)
    np.testing.assert_array_equal(
        np.asarray(smry.ok),
        np.asarray(ref.detect1.ok) & np.asarray(ref.detect2.ok),
    )

    # the serial (overlap=False) loop shares the cached sharded step and
    # must produce the identical summary
    smry_serial = estimate_poses_stream(
        i1, i2, stereo, cfg, fit_cfg, chunk=8, compact=True, overlap=False,
        mesh=mesh,
    )
    np.testing.assert_array_equal(
        np.asarray(smry_serial.params), np.asarray(smry.params)
    )

    # chunk not divisible by mesh size must be rejected loudly
    with pytest.raises(ValueError):
        estimate_poses_stream(
            i1, i2, stereo, cfg, fit_cfg, chunk=6, mesh=mesh
        )
