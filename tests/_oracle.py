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
