"""Pin the JAX package against an INDEPENDENT oracle: literal NumPy/SciPy
ports of the reference's formulas (tests/_oracle.py).

Every other parity test in the suite compares the rebuild against itself
(Pallas vs XLA, TPU vs CPU); these compare against the reference
implementation's actual math, so a silent semantic deviation -- a
Hessian-ridge sign flip, a Sauvola formula typo, a kinematics-chain sign --
fails the suite (VERDICT r2, missing #2)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests import _oracle as oracle

from cylinder_pose_estimation_tpu.geometry.cylinder import (
    apply_prior,
    cylinder_residuals,
    dist_points_to_line,
    fit_cylinder,
)
from cylinder_pose_estimation_tpu.geometry.kinematics import t_agv_cyl
from cylinder_pose_estimation_tpu.geometry.triangulate import triangulate
from cylinder_pose_estimation_tpu.ops import ridge
from cylinder_pose_estimation_tpu.ops.image import gaussian_blur_cv
from cylinder_pose_estimation_tpu.ops.polyfit import (
    masked_polyfit,
    poly_intersection,
)
from cylinder_pose_estimation_tpu.utils.synthetic import default_stereo


def _lines_image(h=96, w=128, seed=0):
    """Gray image with bright smooth lines on a dark background -- the input
    class the preprocess chain is specified on."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for y0 in (20.0, 44.0, 70.0):
        cy = y0 + 4.0 * np.sin(xx[0] / 37.0)
        img += 180.0 * np.exp(-((yy - cy[None, :]) ** 2) / (2 * 2.0**2))
    for x0 in (25.0, 64.0, 100.0):
        img += 180.0 * np.exp(-((xx - x0) ** 2) / (2 * 2.0**2))
    img = np.clip(img + rng.normal(0, 1.5, (h, w)), 0, 255)
    return img


TRIM = 20  # > gaussian support (4*sigma=12) + gradient stencils: the rebuild
           # uses reflect padding where skimage zero-pads (documented
           # deviation), so parity is an interior statement.


def test_ridge_minima_match_reference_formula():
    """Our Hessian eigen-minima == skimage's smooth + np.gradient^2 + closed
    form, on the interior.  A sign flip in ridge.py (e.g. returning maxima)
    breaks this by orders of magnitude."""
    img = _lines_image()
    _, minima_ref = oracle.detect_ridges(img, sigma=3.0)
    _, minima_ours = jax.jit(ridge.hessian_eigenimages, static_argnums=1)(
        jnp.asarray(img, jnp.float32), 3.0
    )
    got = np.asarray(minima_ours)[TRIM:-TRIM, TRIM:-TRIM]
    want = minima_ref[TRIM:-TRIM, TRIM:-TRIM]
    scale = np.abs(want).max()
    assert scale > 1.0  # the scene actually has ridges
    np.testing.assert_allclose(got, want, atol=2e-3 * scale)
    # sign convention: on a bright line crest the minima eigenvalue is
    # strongly negative (curvature across the line)
    assert want[24 - TRIM + 16, 44] < -0.1 * scale or want.min() < -0.1 * scale


def test_sauvola_threshold_matches_reference_formula():
    img = _lines_image(seed=1)
    want = oracle.sauvola_threshold_fast(img, 15, 0.5, 128.0)
    got = np.asarray(
        jax.jit(ridge.sauvola_threshold)(jnp.asarray(img, jnp.float32))
    )
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_preprocess_binary_matches_reference_chain():
    """Full blur -> ridge -> Sauvola -> invert chain vs the oracle, interior.
    Near-threshold pixels may tie-break differently in float32; demand
    99.5% agreement and exact agreement on confident pixels."""
    img = _lines_image(seed=2)
    want = oracle.preprocess_binary(img)[TRIM:-TRIM, TRIM:-TRIM]
    blurred = gaussian_blur_cv(jnp.asarray(img, jnp.float32), 5)
    got = np.asarray(jax.jit(ridge.binarize_ridges)(blurred))[
        TRIM:-TRIM, TRIM:-TRIM
    ]
    agree = (got == want).mean()
    assert agree > 0.995, f"binary agreement {agree}"
    # the laser lines themselves must be identically True
    assert got[24 - TRIM, :].any() and want[24 - TRIM, :].any()


@pytest.mark.parametrize("degree", [1, 2])
def test_masked_polyfit_matches_np_polyfit(degree):
    rng = np.random.default_rng(3)
    x = rng.uniform(40, 600, 24)
    y = np.polyval(rng.normal(0, 1, degree + 1) * [1e-4, 0.1, 200.0][-degree - 1 :], x)
    y = y + rng.normal(0, 0.3, x.shape)
    want = oracle.polynomial_fitting_row(x, y, degree)
    got = np.asarray(
        masked_polyfit(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.ones_like(jnp.asarray(x, jnp.float32)),
            degree,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_poly_intersection_matches_scipy_root():
    rng = np.random.default_rng(4)
    for trial in range(8):
        # row: y = f(x) gently curved; col: x = g(y)
        a = [rng.normal(0, 2e-4), rng.normal(0, 0.05), rng.uniform(60, 400)]
        b = [rng.normal(0, 2e-4), rng.normal(0, 0.05), rng.uniform(60, 560)]
        row_eq = a + [40.0, 600.0]
        col_eq = b + [40.0, 440.0]
        want = oracle.poly_intersection_solver(row_eq, col_eq, 2)
        x, y = poly_intersection(
            jnp.asarray(a, jnp.float32),
            jnp.asarray(b, jnp.float32),
            jnp.asarray(0.5 * (row_eq[3] + row_eq[4]), jnp.float32),
        )
        if want is None:
            continue
        np.testing.assert_allclose(float(x), want[0], atol=2e-2)
        np.testing.assert_allclose(float(y), want[1], atol=2e-2)


def _cyl_points(seed=5, n=80, radius=45.0):
    rng = np.random.default_rng(seed)
    org = np.array([20.0, -30.0, 540.0])
    ax = np.array([0.05, 1.0, 0.08])
    ax /= np.linalg.norm(ax)
    # orthonormal frame around the axis
    u = np.cross(ax, [0.0, 0.0, 1.0])
    u /= np.linalg.norm(u)
    v = np.cross(ax, u)
    th = rng.uniform(-1.2, 1.2, n)
    t = rng.uniform(-60, 60, n)
    pts = (
        org[None]
        + t[:, None] * ax[None]
        + radius * (np.cos(th)[:, None] * u[None] + np.sin(th)[:, None] * v[None])
    )
    return pts + rng.normal(0, 0.05, pts.shape), org, ax


def test_cylinder_objective_matches_matlab_dist():
    pts, org, ax = _cyl_points()
    params = np.concatenate([org + [1.0, 2.0, -0.5], ax + [0.02, 0.0, -0.01]])
    want = oracle.cylinder_objective(params, pts.T, 45.0)
    r = np.asarray(
        cylinder_residuals(
            jnp.asarray(params, jnp.float32), jnp.asarray(pts, jnp.float32), 45.0
        )
    )
    got = float(r @ r)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # and the underlying point-line distances agree
    d_want, _ = oracle.get_dist_pts3_to_line(pts.T, params[:3], params[:3] + params[3:])
    d_got = np.asarray(
        dist_points_to_line(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(params[:3], jnp.float32),
            jnp.asarray(params[3:], jnp.float32),
        )
    )
    np.testing.assert_allclose(d_got, d_want, atol=1e-3)


def test_apply_prior_matches_matlab():
    pts, org, ax = _cyl_points(seed=6)
    params = np.concatenate([org, -ax])  # flipped: prior must unflip
    want = oracle.apply_cyl_params_prior(params, pts.T)
    got = np.asarray(
        apply_prior(
            jnp.asarray(params, jnp.float32),
            jnp.asarray(pts, jnp.float32),
            jnp.ones(len(pts), bool),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_t_agv_cyl_matches_matlab_chain():
    for pan in (-0.6, 0.0, 0.37):
        for tilt in (-0.2, 0.0, 0.31):
            want = oracle.get_t_agv_cyl(pan, tilt)
            got = np.asarray(t_agv_cyl(jnp.asarray(pan), jnp.asarray(tilt)))
            np.testing.assert_allclose(got, want, atol=1e-4)


def test_lm_fit_not_worse_than_fminsearch():
    """The rebuild swaps fminsearch for LM (documented); validate on the
    OBJECTIVE VALUE per SURVEY hard-part (d): from the same data our final
    fval must be <= the reference optimizer's (it should be better)."""
    pts, org, ax = _cyl_points(seed=7)
    fit = jax.jit(
        lambda p, v: fit_cylinder(p, v, 45.0)
    )(jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool))
    # reference: Nelder-Mead from ITS OWN init recipe's neighborhood -- use
    # our init (params0) for both so the comparison isolates the optimizer.
    p0 = np.asarray(fit.params0, np.float64)
    _, fval_nm = oracle.fminsearch_cylinder(p0, pts.T, 45.0)
    fval_lm = float(fit.fvals[1])
    assert fval_lm <= fval_nm * 1.05 + 1e-6, (fval_lm, fval_nm)


def test_triangulate_matches_svd_dlt():
    stereo = default_stereo(cx=320.0, cy=240.0)
    rng = np.random.default_rng(8)
    pts3 = np.stack(
        [rng.uniform(-80, 80, 40), rng.uniform(-60, 60, 40), rng.uniform(450, 700, 40)],
        axis=-1,
    )
    k1 = np.asarray(stereo.cam1.k, np.float64)
    k2 = np.asarray(stereo.cam2.k, np.float64)
    t21 = np.asarray(stereo.t_c2_c1, np.float64)

    def proj(p, k, t):
        q = (t[:3, :3] @ p.T).T + t[:3, 3]
        uv = (k @ q.T).T
        return uv[:, :2] / uv[:, 2:3]

    xy1 = proj(pts3, k1, np.eye(4))
    xy2 = proj(pts3, k2, t21)
    want = oracle.triangulate_dlt(xy1, xy2, k1, k2, t21)
    res = jax.jit(lambda a, b: triangulate(a, b, stereo))(
        jnp.asarray(xy1, jnp.float32), jnp.asarray(xy2, jnp.float32)
    )
    got = np.asarray(res.points3)
    np.testing.assert_allclose(got, want, atol=0.05)
    np.testing.assert_allclose(got, pts3, atol=0.05)


# ---------------------------------------------------------------------------
# Round-4 oracle extension: the correspondence/registration half (VERDICT r3
# missing #2) -- chooseIdx, findGridCorrespondences, estCurvatures, fitplane,
# and the multi-frame registration objective.
# ---------------------------------------------------------------------------

from cylinder_pose_estimation_tpu.geometry.correspond import (
    choose_idx,
    find_grid_correspondences,
)
from cylinder_pose_estimation_tpu.geometry.curvature import estimate_curvatures
from cylinder_pose_estimation_tpu.geometry.plane import fit_plane
from cylinder_pose_estimation_tpu.geometry.registration import (
    registration_residuals,
)
from cylinder_pose_estimation_tpu.types import GridPoints


def _grid_scene(seed=11, nx=7, ny=7, drop1=(), drop2=(), corrupt2=()):
    """Two-view grid observations of smooth 3D surface points.

    Returns (gp1_mat, gp2_mat) as the reference's (m, 4) [x, y, ix, iy]
    matrices plus the matching GridPoints pair and the stereo rig.
    ``drop1``/``drop2``: (ix, iy) pairs removed per view; ``corrupt2``:
    (ix, iy) pairs whose view-2 pixel is shifted by +10 px in y --
    perpendicular to the (horizontal-baseline) epipolar direction, so the
    point cannot triangulate consistently and its reprojection error far
    exceeds the 0.3 px patch threshold (an x shift would only change the
    triangulated depth)."""
    stereo = default_stereo(cx=320.0, cy=240.0)
    rng = np.random.default_rng(seed)
    k1 = np.asarray(stereo.cam1.k, np.float64)
    k2 = np.asarray(stereo.cam2.k, np.float64)
    t21 = np.asarray(stereo.t_c2_c1, np.float64)

    rows = []
    for ix in range(-(nx // 2), nx - nx // 2):
        for iy in range(-(ny // 2), ny - ny // 2):
            p = np.array([
                18.0 * ix + rng.normal(0, 0.3),
                16.0 * iy + rng.normal(0, 0.3),
                560.0 + 3.0 * ix - 2.0 * iy + rng.normal(0, 1.0),
            ])
            uv1 = k1 @ p
            q = t21[:3, :3] @ p + t21[:3, 3]
            uv2 = k2 @ q
            rows.append((ix, iy, uv1[:2] / uv1[2], uv2[:2] / uv2[2]))

    noise = rng.normal(0, 0.03, (len(rows), 2, 2))
    gp1, gp2 = [], []
    for i, (ix, iy, xy1, xy2) in enumerate(rows):
        if (ix, iy) not in drop1:
            gp1.append([xy1[0] + noise[i, 0, 0], xy1[1] + noise[i, 0, 1], ix, iy])
        if (ix, iy) not in drop2:
            off = 10.0 if (ix, iy) in corrupt2 else 0.0
            gp2.append(
                [xy2[0] + noise[i, 1, 0], xy2[1] + noise[i, 1, 1] + off, ix, iy]
            )
    gp1 = np.array(gp1)
    gp2 = np.array(gp2)

    def to_gp(mat, cap=64):
        xy = np.zeros((cap, 2), np.float32)
        idx = np.zeros((cap, 2), np.int32)
        valid = np.zeros((cap,), bool)
        xy[: len(mat)] = mat[:, 0:2]
        idx[: len(mat)] = mat[:, 2:4]
        valid[: len(mat)] = True
        return GridPoints(
            xy=jnp.asarray(xy), idx=jnp.asarray(idx),
            valid=jnp.asarray(valid), center=jnp.zeros(2, jnp.float32),
        )

    return gp1, gp2, to_gp(gp1), to_gp(gp2), stereo, (k1, k2, t21)


def _corr_to_map(corr):
    """Correspondences raster -> {(ix, iy): (xy1, xy2)} over valid cells."""
    idx = np.asarray(corr.idx)
    v = np.asarray(corr.valid)
    xy1 = np.asarray(corr.xy1)
    xy2 = np.asarray(corr.xy2)
    return {
        (int(ix), int(iy)): (xy1[i], xy2[i])
        for i, (ix, iy) in enumerate(idx)
        if v[i]
    }


def test_find_grid_correspondences_matches_reference():
    """Index matching with per-view dropouts == the reference's loop
    (ref utils/findGridCorrespondences.m:7-21)."""
    gp1m, gp2m, gp1, gp2, stereo, _ = _grid_scene(
        seed=12, drop1={(1, 1), (-2, 0)}, drop2={(0, 2), (3, -3), (-2, 0)}
    )
    c1, c2, ci = oracle.find_grid_correspondences_ref(gp1m, gp2m)
    want = {
        (int(ix), int(iy)): (a, b) for (ix, iy), a, b in zip(ci, c1, c2)
    }
    got = _corr_to_map(jax.jit(find_grid_correspondences)(gp1, gp2))
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(got[key][0], want[key][0], atol=1e-3)
        np.testing.assert_allclose(got[key][1], want[key][1], atol=1e-3)


def test_choose_idx_matches_reference_patch_consensus():
    """The dense choose_idx reduction == the literal chooseIdx port
    (ref utils/chooseIdx.m:29-104) on a scene with a corrupted point (its
    covering patches must fail), per-view dropouts, and a wholly-missing
    view-1 index column (the unique() compaction must bridge it).

    This directly tests the 'per-point reprojection error is
    patch-independent' reduction claim (geometry/correspond.py:13-30): the
    selected KEY SET and coordinates must equal the reference's min-error
    candidate map."""
    drop_col = {(2, iy) for iy in range(-3, 4)}
    gp1m, gp2m, gp1, gp2, stereo, (k1, k2, t21) = _grid_scene(
        seed=13,
        drop1=drop_col | {(-1, -1)},
        drop2={(-3, -3)},
        corrupt2={(1, 0)},
    )
    point_map, fb = oracle.choose_idx_ref(
        gp1m, gp2m, k1, k2, t21, patch_size=3, error_th=0.3
    )
    assert not fb
    # the corrupted point must be gated out, its clean neighbours kept
    assert (1, 0) not in point_map
    assert (1, 1) in point_map and (0, 0) in point_map

    got = _corr_to_map(
        jax.jit(lambda a, b: choose_idx(a, b, stereo))(gp1, gp2)
    )
    assert set(got) == set(point_map)
    for key, (a, b, _e) in point_map.items():
        np.testing.assert_allclose(got[key][0], a, atol=1e-3)
        np.testing.assert_allclose(got[key][1], b, atol=1e-3)


def test_choose_idx_fallback_matches_reference():
    """With an unreachable threshold no patch passes; both implementations
    must fall back to plain index matching (ref utils/chooseIdx.m:101-104)."""
    gp1m, gp2m, gp1, gp2, stereo, (k1, k2, t21) = _grid_scene(seed=14)
    point_map, fb = oracle.choose_idx_ref(
        gp1m, gp2m, k1, k2, t21, patch_size=3, error_th=1e-9
    )
    assert fb
    res = jax.jit(
        lambda a, b: choose_idx(a, b, stereo, error_threshold=1e-9)
    )(gp1, gp2)
    assert bool(res.used_fallback)
    got = _corr_to_map(res)
    assert set(got) == set(point_map)


def test_fitplane_matches_reference():
    """fit_plane == ref utils/fitplane.m:12-15 (smallest covariance
    eigenvector through the centroid), including under masking."""
    rng = np.random.default_rng(15)
    n_pts = 40
    u = rng.uniform(-50, 50, n_pts)
    v = rng.uniform(-40, 40, n_pts)
    normal = np.array([0.3, -0.5, 0.81])
    normal /= np.linalg.norm(normal)
    b1 = np.cross(normal, [0, 0, 1.0]); b1 /= np.linalg.norm(b1)
    b2 = np.cross(normal, b1)
    pts = (
        np.array([5.0, -8.0, 300.0])[None]
        + u[:, None] * b1[None] + v[:, None] * b2[None]
        + rng.normal(0, 0.5, (n_pts, 3))
    )
    want = oracle.fitplane_ref(pts.T)

    # masked call: garbage rows appended under valid=False must not leak
    pts_pad = np.concatenate([pts, rng.uniform(-1e3, 1e3, (8, 3))])
    valid = np.concatenate([np.ones(n_pts, bool), np.zeros(8, bool)])
    got = np.asarray(
        jax.jit(fit_plane)(jnp.asarray(pts_pad, jnp.float32), jnp.asarray(valid))
    )
    sign = np.sign(got[:3] @ want[:3])
    np.testing.assert_allclose(got[:3] * sign, want[:3], atol=2e-3)
    np.testing.assert_allclose(got[3] * sign, want[3], atol=0.5)


def test_est_curvatures_matches_reference():
    """estimate_curvatures == ref utils/estCurvatures.m:1-38 per point, up
    to two documented reference artifacts the oracle exposes:

      * the reference's local frame is NOT normalized (|x|=|y|=s<=1 with
        s^2 = 1 - (normal . x_seed)^2), which scales its curvature
        eigenvalues by 1/s^2 -- a coordinate artifact, corrected here;
      * the covariance normal's SIGN is eigensolver-dependent; flipping it
        negates the curvature pair but leaves the principal directions and
        |curvature| unchanged (Shape' = -D Shape D, D=diag(1,-1)).

    So the pinned quantities are |curvatures| (scale-corrected) and the
    principal directions up to sign -- exactly what the cylinder-axis init
    consumes (ref utils/fitCylinderWPts3.m:29)."""
    pts, org, ax = _cyl_points(seed=16, n=90, radius=45.0)
    ks, ls = oracle.est_curvatures_ref(pts.T, k=20)

    got = jax.jit(lambda p, v: estimate_curvatures(p, v, k=20))(
        jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool)
    )
    got_k = np.asarray(got.directions, np.float64)   # (N, 3, 2)
    got_l = np.asarray(got.curvatures, np.float64)   # (N, 2)
    got_flat = np.asarray(got.flat_direction, np.float64)

    n = len(pts)
    n_dir_ok = 0
    for i in range(n):
        # scale of the unnormalized reference frame = column norm of K
        # (V's columns are unit; lc's x/y columns both have norm s)
        s = np.linalg.norm(ks[:, 0, i])
        want_l = np.sort(np.abs(ls[:, i] * s * s))
        have_l = np.sort(np.abs(got_l[i]))
        np.testing.assert_allclose(have_l, want_l, rtol=0.08, atol=5e-4)
        # directions up to sign (eigvec order may differ when |l0|~|l1|)
        ref_dirs = ks[:, :, i] / np.linalg.norm(ks[:, :, i], axis=0)
        dots = np.abs(got_k[i].T @ ref_dirs)         # (2, 2)
        if dots[0, 0] + dots[1, 1] < dots[0, 1] + dots[1, 0]:
            dots = dots[:, ::-1]
        if min(dots[0, 0], dots[1, 1]) > 0.99:
            n_dir_ok += 1
        # flat direction: min-|curvature| column of the reference frame
        j = int(np.argmin(np.abs(ls[:, i])))
        fd = ref_dirs[:, j]
        assert abs(fd @ got_flat[i]) > 0.98, (i, fd, got_flat[i])
    # near-degenerate |l0|~|l1| neighbourhoods may legitimately swap the
    # eigenbasis between solvers; demand agreement on the vast majority
    assert n_dir_ok >= int(0.9 * n), n_dir_ok


def test_registration_objective_matches_reference():
    """sum(registration_residuals^2) == the reference's dist() value
    (ref utils/fitCylinderWPts3sAngs.m:82-94) at matching poses, with
    per-frame point counts differing (masking must reproduce the 1/n_f
    frame weighting exactly)."""
    rng = np.random.default_rng(17)
    radius = 55.0
    angs = [(-0.4, 0.1), (0.0, 0.0), (0.3, -0.2), (0.6, 0.25)]
    t_agv_cyls = np.stack([oracle.get_t_agv_cyl(p, t) for p, t in angs])

    f, cap = len(angs), 48
    counts = [30, 44, 17, 26]
    pts_pad = rng.uniform(-1e3, 1e3, (f, cap, 3))    # garbage in masked slots
    valid = np.zeros((f, cap), bool)
    pts_lists = []
    for i, c in enumerate(counts):
        p, _, _ = _cyl_points(seed=30 + i, n=c, radius=radius)
        pts_pad[i, :c] = p
        valid[i, :c] = True
        pts_lists.append(p.T)

    pose = np.array([0.2, -0.35, 0.1, 40.0, -25.0, 90.0])
    want = oracle.registration_dist_ref(pose, t_agv_cyls, pts_lists, radius)

    r = np.asarray(
        jax.jit(registration_residuals, static_argnums=(4,))(
            jnp.asarray(pose, jnp.float32),
            jnp.asarray(t_agv_cyls, jnp.float32),
            jnp.asarray(pts_pad, jnp.float32),
            jnp.asarray(valid),
            radius,
        ),
        np.float64,
    )
    got = float(r @ r)
    np.testing.assert_allclose(got, want, rtol=2e-4)
