"""Independent reference oracle: literal NumPy/SciPy ports of the
reference implementation's formulas, used ONLY as test oracles.

Every function here is a direct transliteration of the cited reference
code (cv3vpl-lab/cylinder-pose-estimation), kept deliberately naive --
loops, float64, scipy -- so that a silent semantic deviation in the JAX
package (a sign convention, a border mode, a formula typo) fails the
suite instead of passing "self-vs-self" parity.  Nothing in the package
imports this module.

cv2/skimage are not installed in this image; where the reference calls
them, the oracle reproduces the library primitive's documented math
with scipy.ndimage / numpy (noted per function).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage, optimize


# ---------------------------------------------------------------------------
# Preprocess / binarize (ref utils/util_cylinder.py:1734-1802)
# ---------------------------------------------------------------------------

def gaussian_blur_cv(img: np.ndarray, ksize: int = 5) -> np.ndarray:
    """cv2.GaussianBlur(img, (k, k), 0): sigma = 0.3*((k-1)*0.5 - 1) + 0.8,
    kernel from the cv2.getGaussianKernel formula, BORDER_REFLECT_101
    (cv2's default border).  Ref call site: utils/util_cylinder.py:1790."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    c = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - c
    k1 = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k1 /= k1.sum()
    out = ndimage.correlate1d(img.astype(np.float64), k1, axis=0, mode="mirror")
    return ndimage.correlate1d(out, k1, axis=1, mode="mirror")


def detect_ridges(gray: np.ndarray, sigma: float = 3.0):
    """skimage.feature.hessian_matrix(order='rc') + hessian_matrix_eigvals
    as called by ref utils/util_cylinder.py:1734-1738: Gaussian smooth, then
    np.gradient twice, closed-form symmetric 2x2 eigenvalues (descending).

    skimage's default border is 'constant' (zero pad), which manufactures a
    ridge ring along the border; the rebuild deliberately uses reflect
    padding (documented deviation).  Oracle comparisons therefore trim the
    border by > gaussian support.  Returns (maxima, minima)."""
    g = ndimage.gaussian_filter(gray.astype(np.float64), sigma, mode="constant")
    gr, gc = np.gradient(g)
    hrr = np.gradient(gr, axis=0)
    hrc = np.gradient(gr, axis=1)
    hcc = np.gradient(gc, axis=1)
    tr = hrr + hcc
    det_disc = np.sqrt((hrr - hcc) ** 2 + 4.0 * hrc * hrc)
    maxima = (tr + det_disc) / 2.0
    minima = (tr - det_disc) / 2.0
    return maxima, minima


def sauvola_threshold_fast(
    image: np.ndarray, window_size: int = 15, k: float = 0.5, r: float = 128.0
) -> np.ndarray:
    """Literal port of ref utils/util_cylinder.py:1740-1766: box-filter local
    mean/variance (cv2.boxFilter BORDER_REPLICATE == uniform_filter
    mode='nearest'), T = m * (1 + k*(s/R - 1))."""
    image = image.astype(np.float64)
    mean = ndimage.uniform_filter(image, size=window_size, mode="nearest")
    mean_sq = ndimage.uniform_filter(image * image, size=window_size, mode="nearest")
    variance = mean_sq - mean * mean
    variance[variance < 0] = 0
    std = np.sqrt(variance)
    return mean * (1 + k * ((std / r) - 1))


def preprocess_binary(gray: np.ndarray) -> np.ndarray:
    """Full ref preprocess chain (utils/util_cylinder.py:1769-1802): 5x5
    Gaussian blur -> Hessian minima (sigma 3) -> Sauvola -> INVERTED binary
    (True where minima <= threshold, i.e. laser lines)."""
    blurred = gaussian_blur_cv(gray, 5)
    _, b = detect_ridges(blurred, sigma=3.0)
    t = sauvola_threshold_fast(b, window_size=15, k=0.5, r=128.0)
    return ~(b > t)


# ---------------------------------------------------------------------------
# Polynomial fitting + grid intersections (ref utils/util_cylinder.py:454-470,
# :1074-1104)
# ---------------------------------------------------------------------------

def polynomial_fitting_row(pts_x, pts_y, degree):
    """np.polyfit y = f(x), highest power first (ref :454-461)."""
    return np.polyfit(np.asarray(pts_x, np.float64), np.asarray(pts_y, np.float64), degree)


def polynomial_fitting_col(pts_y, pts_x, degree):
    """np.polyfit x = f(y) (ref :463-470)."""
    return np.polyfit(np.asarray(pts_y, np.float64), np.asarray(pts_x, np.float64), degree)


def poly_intersection_solver(row_eq, col_eq, degree):
    """Literal port of ref :1074-1104: scipy.optimize.root(method='hybr') on
    [y - polyval(row, x), x - polyval(col, y)], init at the row-domain
    midpoint; accept only inside both domains (+- 1e-3)."""
    row_coeff = row_eq[: degree + 1]
    x_min, x_max = row_eq[degree + 1], row_eq[degree + 2]
    col_coeff = col_eq[: degree + 1]
    y_min, y_max = col_eq[degree + 1], col_eq[degree + 2]

    def func(v):
        x, y = v[0], v[1]
        return [y - np.polyval(row_coeff, x), x - np.polyval(col_coeff, y)]

    x0 = 0.5 * (x_min + x_max)
    y0 = np.polyval(row_coeff, x0)
    sol = optimize.root(func, [x0, y0], method="hybr")
    if sol.success:
        xs, ys = sol.x[0], sol.x[1]
        if (x_min - 1e-3 <= xs <= x_max + 1e-3) and (y_min - 1e-3 <= ys <= y_max + 1e-3):
            return (xs, ys)
    return None


# ---------------------------------------------------------------------------
# MATLAB geometry chain
# ---------------------------------------------------------------------------

def get_dist_pts3_to_line(pts: np.ndarray, p1: np.ndarray, p2: np.ndarray):
    """ref utils/getDistPts3ToLine.m: pts (3, n); line through p1, p2."""
    v = p2 - p1
    normv2 = float(np.sum(v ** 2))
    alphas = np.sum((pts - p1[:, None]) * v[:, None], axis=0) / normv2
    proj = p1[:, None] + v[:, None] * alphas[None, :]
    d = np.sqrt(np.sum((pts - proj) ** 2, axis=0))
    return d, proj


def cylinder_objective(cyl_params: np.ndarray, pts3: np.ndarray, radius: float) -> float:
    """ref utils/fitCylinderWPts3.m:44-49 (dist): sum of squared
    (distance-to-axis - radius); pts3 is (3, n), params [org, dir]."""
    p1 = np.asarray(cyl_params[:3], np.float64)
    p2 = p1 + np.asarray(cyl_params[3:6], np.float64)
    d, _ = get_dist_pts3_to_line(np.asarray(pts3, np.float64), p1, p2)
    v = d - radius
    return float(v @ v)


def fminsearch_cylinder(params0: np.ndarray, pts3: np.ndarray, radius: float):
    """ref utils/fitCylinderWPts3.m:33-38: Nelder-Mead with TolFun/TolX 1e-5,
    MaxFunEvals/MaxIter 1e5 (MATLAB fminsearch ~= scipy Nelder-Mead with
    xatol/fatol)."""
    res = optimize.minimize(
        lambda p: cylinder_objective(p, pts3, radius),
        np.asarray(params0, np.float64),
        method="Nelder-Mead",
        options=dict(xatol=1e-5, fatol=1e-5, maxfev=100000, maxiter=100000),
    )
    return res.x, float(res.fun)


def apply_cyl_params_prior(cyl_params: np.ndarray, cyl_pts3: np.ndarray) -> np.ndarray:
    """Literal port of ref utils/applyCylParamsPrior.m:9-30; pts3 (3, n)."""
    origin = np.asarray(cyl_params[:3], np.float64).copy()
    direction = np.asarray(cyl_params[3:6], np.float64).copy()
    if direction[1] < 0:
        direction = -direction
    y_min = float(np.min(cyl_pts3[1, :]))
    if abs(direction[1]) < np.finfo(np.float64).eps:
        t = 0.0
    else:
        t = (y_min - origin[1]) / direction[1]
    new_origin = origin + t * direction
    return np.concatenate([new_origin, direction])


def get_t_agv_cyl(pan: float, tilt: float, config=(321.1, 143.1, 110.0)) -> np.ndarray:
    """Literal port of ref utils/getTAGVcyl.m:8-38 (note the reference
    hardcodes -143.1 / 321.1 / 110 inside T_P_T0 and T_T2_CYL regardless of
    the config argument; so does this oracle)."""
    cp, sp = np.cos(pan), np.sin(pan)
    ct, st = np.cos(-tilt), np.sin(-tilt)
    t_a_p = np.array([[cp, -sp, 0, 0], [sp, cp, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    t_p_t0 = np.eye(4)
    t_p_t0[:3, 3] = [-143.1, 0, 0]
    l_p_t0 = np.linalg.norm(t_p_t0[:3, 3])
    mtr_move = -np.tan(tilt) * l_p_t0
    t_t0_t1 = np.eye(4)
    t_t0_t1[2, 3] = mtr_move
    t_t1_t2 = np.array([[ct, 0, st, 0], [0, 1, 0, 0], [-st, 0, ct, 0], [0, 0, 0, 1]])
    t_t2_cyl = np.array(
        [[0, -1, 0, 321.1], [-1, 0, 0, 0], [0, 0, -1, 110], [0, 0, 0, 1]], np.float64
    )
    return t_a_p @ t_p_t0 @ t_t0_t1 @ t_t1_t2 @ t_t2_cyl


def triangulate_dlt(xy1: np.ndarray, xy2: np.ndarray, k1, k2, t_c2_c1) -> np.ndarray:
    """Independent pixel-space SVD-DLT triangulation (the standard algorithm
    behind MATLAB's ``triangulate``; ref call site utils/fitSingleCylinder.m:15).
    xy1/xy2: (n, 2); camera 1 at the origin, x2 = T_C2_C1 x1."""
    p1 = np.asarray(k1, np.float64) @ np.hstack([np.eye(3), np.zeros((3, 1))])
    p2 = np.asarray(k2, np.float64) @ np.asarray(t_c2_c1, np.float64)[:3, :4]
    out = np.zeros((len(xy1), 3))
    for i, ((x1, y1), (x2, y2)) in enumerate(zip(xy1, xy2)):
        a = np.stack([
            x1 * p1[2] - p1[0],
            y1 * p1[2] - p1[1],
            x2 * p2[2] - p2[0],
            y2 * p2[2] - p2[1],
        ])
        _, _, vt = np.linalg.svd(a)
        x = vt[-1]
        out[i] = x[:3] / x[3]
    return out


def project_points(pts3: np.ndarray, k, t=None) -> np.ndarray:
    """Pinhole projection x = K [R|t] X (ref utils/projPts3.m).  pts3 (n, 3)
    in camera-1 coordinates; ``t`` maps them into the projecting camera."""
    p = np.asarray(pts3, np.float64)
    if t is not None:
        t = np.asarray(t, np.float64)
        p = p @ t[:3, :3].T + t[:3, 3]
    uv = p @ np.asarray(k, np.float64).T
    return uv[:, :2] / uv[:, 2:3]


def reprojection_errors_matlab(pts3, xy1, xy2, k1, k2, t_c2_c1) -> np.ndarray:
    """MATLAB triangulate's reprojectionErrors output: per-point MEAN over
    the two views of the Euclidean pixel reprojection distance (ref call
    sites utils/chooseIdx.m:58, utils/triangulateWithThreshold.m)."""
    e1 = np.linalg.norm(project_points(pts3, k1) - xy1, axis=1)
    e2 = np.linalg.norm(project_points(pts3, k2, t_c2_c1) - xy2, axis=1)
    return (e1 + e2) / 2.0


# ---------------------------------------------------------------------------
# Grid correspondences (ref utils/findGridCorrespondences.m:7-21)
# ---------------------------------------------------------------------------

def find_grid_correspondences_ref(gp1: np.ndarray, gp2: np.ndarray):
    """Literal port: gp1/gp2 are (m, 4) [x, y, x_index, y_index]; for each
    gp1 row find the gp2 row with identical index pair (first match)."""
    cgp1, cgp2, cgpi = [], [], []
    for i in range(len(gp1)):
        hits = np.where((gp2[:, 2] == gp1[i, 2]) & (gp2[:, 3] == gp1[i, 3]))[0]
        if len(hits) == 0:
            continue
        cgp1.append(gp1[i, 0:2])
        cgp2.append(gp2[hits[0], 0:2])
        cgpi.append(gp1[i, 2:4])
    z = np.zeros((0, 2))
    return (
        np.array(cgp1) if cgp1 else z,
        np.array(cgp2) if cgp2 else z,
        np.array(cgpi) if cgpi else z,
    )


# ---------------------------------------------------------------------------
# Patch-consensus selection (ref utils/chooseIdx.m:29-104)
# ---------------------------------------------------------------------------

def choose_idx_ref(gp1, gp2, k1, k2, t_c2_c1, patch_size=3, error_th=0.3):
    """Literal port of chooseIdx: slide a patch_size^2 window over the
    sorted unique grid-index values of VIEW 1 (ref :23-35 -- missing
    rows/cols are bridged by the unique() compaction), require every cell
    present in both views, triangulate the patch, accept if the patch's
    MEAN reprojection error < error_th, and per point keep the candidate
    with the lowest error across accepted patches (ref :66-86).  Falls back
    to find_grid_correspondences_ref when nothing is accepted (ref :101-104).

    Returns (point_map, used_fallback): point_map maps (ix, iy) ->
    (xy1, xy2, error)."""
    gp1 = np.asarray(gp1, np.float64)
    gp2 = np.asarray(gp2, np.float64)
    unique_x = np.sort(np.unique(gp1[:, 2]))
    unique_y = np.sort(np.unique(gp1[:, 3]))
    point_map = {}

    def _loc(gp, pairs):
        """ismember(pairs, gp[:, 2:4], 'rows'): first-match row or -1."""
        out = np.full(len(pairs), -1, int)
        for j, (ix, iy) in enumerate(pairs):
            hits = np.where((gp[:, 2] == ix) & (gp[:, 3] == iy))[0]
            if len(hits):
                out[j] = hits[0]
        return out

    for ax in range(len(unique_x) - patch_size + 1):
        for ay in range(len(unique_y) - patch_size + 1):
            cand = [
                (unique_x[ax + i], unique_y[ay + j])
                for i in range(patch_size)
                for j in range(patch_size)
            ]
            loc1 = _loc(gp1, cand)
            loc2 = _loc(gp2, cand)
            if (loc1 < 0).any() or (loc2 < 0).any():
                continue
            c1 = gp1[loc1, 0:2]
            c2 = gp2[loc2, 0:2]
            pts3 = triangulate_dlt(c1, c2, k1, k2, t_c2_c1)
            errs = reprojection_errors_matlab(pts3, c1, c2, k1, k2, t_c2_c1)
            if np.mean(errs) < error_th:
                for (ix, iy), e, a, b in zip(cand, errs, c1, c2):
                    key = (int(ix), int(iy))
                    if key not in point_map or e < point_map[key][2]:
                        point_map[key] = (a.copy(), b.copy(), float(e))
    if not point_map:
        c1, c2, ci = find_grid_correspondences_ref(gp1, gp2)
        for a, b, (ix, iy) in zip(c1, c2, ci):
            point_map[(int(ix), int(iy))] = (a, b, np.nan)
        return point_map, True
    return point_map, False


# ---------------------------------------------------------------------------
# Plane fit (ref utils/fitplane.m:12-15) + curvature (ref utils/estCurvatures.m)
# ---------------------------------------------------------------------------

def fitplane_ref(pts: np.ndarray) -> np.ndarray:
    """pts (3, n) -> [nx, ny, nz, d]: smallest-eigenvector of cov(pts'),
    offset through the centroid.  MATLAB eig on a symmetric matrix returns
    ascending eigenvalues, so V(:, 1) is the smallest."""
    cv = np.cov(np.asarray(pts, np.float64))     # ddof=1, like MATLAB cov
    w, v = np.linalg.eigh(cv)
    n = v[:, 0]
    return np.concatenate([n, [-np.mean(n @ pts)]])


def _create_loc_coord_sys_ref(normal: np.ndarray) -> np.ndarray:
    z = np.asarray(normal, np.float64)
    x = np.array([1.0, 0.0, 0.0])
    if abs(z @ x) > 0.9:
        x = np.array([0.0, 1.0, 0.0])
    y = np.cross(z, x)
    x = np.cross(y, z)
    return np.stack([x, y, z], axis=1)


def est_curvatures_ref(pts3: np.ndarray, k: int = 20):
    """Literal port of estCurvatures (ref utils/estCurvatures.m:1-38):
    knnsearch K=20 (self included), local plane fit, local frame, quadric
    least squares, eig of [[2a, b], [b, 2c]].  pts3 (3, n); returns
    K (3, 2, n) principal directions, L (2, n) curvature eigenvalues
    (MATLAB eig ascending).  NOTE: the local frame here does NOT normalize
    x/y (the reference's cross products of a unit eigenvector are already
    unit up to rounding)."""
    from scipy.spatial import cKDTree

    pts3 = np.asarray(pts3, np.float64)
    n = pts3.shape[1]
    tree = cKDTree(pts3.T)
    _, idx = tree.query(pts3.T, k=min(k, n))
    ks = np.zeros((3, 2, n))
    ls = np.zeros((2, n))
    for i in range(n):
        nb = pts3[:, idx[i]]
        pln = fitplane_ref(nb)
        lc = _create_loc_coord_sys_ref(pln[:3])
        local = (nb.T - nb.T.mean(axis=0)) @ lc
        x, y = local[:, 0], local[:, 1]
        a = np.stack([x * x, x * y, y * y, x, y], axis=1)
        coeffs, *_ = np.linalg.lstsq(a, local[:, 2], rcond=None)
        shape = np.array(
            [[coeffs[0] * 2.0, coeffs[1]], [coeffs[1], coeffs[2] * 2.0]]
        )
        d, v = np.linalg.eigh(shape)
        ks[:, :, i] = lc[:, :2] @ v
        ls[:, i] = d
    return ks, ls


# ---------------------------------------------------------------------------
# Multi-frame registration objective (ref utils/fitCylinderWPts3sAngs.m:82-94)
# ---------------------------------------------------------------------------

def vec2t_ref(v: np.ndarray) -> np.ndarray:
    """[rotvec(3), t(3)] -> 4x4 (ref utils/vec2T.m: rotvec2mat3d + t)."""
    from scipy.spatial.transform import Rotation

    v = np.asarray(v, np.float64)
    t = np.eye(4)
    t[:3, :3] = Rotation.from_rotvec(v[:3]).as_matrix()
    t[:3, 3] = v[3:6]
    return t


def registration_dist_ref(agv_pose, t_agv_cyls, pts3s, radius) -> float:
    """Literal port of dist() (ref utils/fitCylinderWPts3sAngs.m:82-94):
    v = sum_f (1/n_f) * sum_i (dist(pts_f,i -> axis line of T * TAGVcyl_f)
    - radius)^2, where the axis line runs through the transform origin along
    its y column.  pts3s: list of (3, n_f) arrays."""
    t = vec2t_ref(agv_pose)
    v = 0.0
    for t_agv_cyl_f, pts in zip(t_agv_cyls, pts3s):
        t_c1_cyl = t @ np.asarray(t_agv_cyl_f, np.float64)
        dy = t_c1_cyl[:3, 1]
        p1 = t_c1_cyl[:3, 3]
        d, _ = get_dist_pts3_to_line(np.asarray(pts, np.float64), p1, p1 + dy)
        vi = d - radius
        v += float(vi @ vi) / len(vi)
    return v
