"""Laser-grid detection front-end: image in, indexed grid points out.

The TPU-native rebuild of the reference's detect_grid six-stage pipeline
(ref python_grid_detection_cylinder.py:68-112, python_grid_detection_plane.py:74-119,
orchestrated by color_and_expand_lines, ref utils/util_cylinder.py:2014-2060):

  1. preprocess/binarize  -- Gaussian -> Hessian ridge minima -> Sauvola
  2. joints               -- 20-px line openings, AND, component centroids
  3. ROI                  -- line-density region (cylinder) / intensity
                             threshold hull (plane)
  4. center seed          -- brightest joint in ROI, 2nd-nearest radius
  5. saturation masking   -- carve the specular blob ellipse out of the masks
  6. lines -> grid        -- bridge -> label -> polyfit -> prune ->
                             intersections -> relabel -> index -> GridPoints

Everything is fixed-shape masked array code: ragged contour/label dicts of the
reference become (MAX_ROWS/MAX_COLS/MAX_POINTS)-capacity slots with validity
masks, so the whole detector jits once and vmaps over frames.

Documented deviations from the reference (capability-preserving redesigns;
each feeds *masks* or seeds, where the geometry chain's 1e-3 px parity budget
does not bind -- SURVEY.md §7 hard parts (c)):
  * SimpleBlobDetector ROI -> line-density ROI (dilated line masks, largest
    component, orthoconvex fill).  Same role: a mask containing the grid.
  * cv2.minEnclosingCircle -> component centroid + max point distance
    (a circumscribing circle; the +5/+20 padding absorbs the difference).
  * per-contour PCA endpoint expansion -> dense directional endpoint
    detection + oriented line dilation at the component-median angle.
  * per-point adaptive brightness patch (circle_radius0/5) -> static patch
    (config.patch_half_min); the center blob is far brighter than other
    joints, so the argmax is insensitive to patch size.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cylinder_pose_estimation_tpu.config import (
    CylinderDetectConfig,
    DetectConfig,
    PlaneDetectConfig,
)
from cylinder_pose_estimation_tpu.ops import labeling, morphology
from cylinder_pose_estimation_tpu.ops.image import (
    bgr_to_gray,
    box_filter,
    gaussian_blur_cv,
)
from cylinder_pose_estimation_tpu.ops.polyfit import (
    masked_polyfit,
    poly_domain,
    poly_intersection,
    polyval,
)
from cylinder_pose_estimation_tpu.ops.ridge import binarize_ridges
from cylinder_pose_estimation_tpu.types import DetectResult, GridPoints

_MAX_COMPONENTS = 48  # per-mask line components tracked for angles/gating


def _cc(mask: jnp.ndarray, xla_iters: int, cfg: DetectConfig, frac: float = 1.0):
    """Connected components: Pallas VMEM propagation or the XLA scan path.

    frac scales the Pallas pool-iteration budget by expected component
    diameter (small blobs need far fewer rounds than full-length lines).
    """
    if cfg.use_pallas:
        from cylinder_pose_estimation_tpu.ops.pallas.frontend import (
            connected_components as cc_pallas,
        )

        rounds = max(6, int(round(cfg.pallas_cc_rounds * frac)))
        return cc_pallas(mask, rounds=rounds, interpret=cfg.pallas_interpret)
    return labeling.connected_components(mask, iters=xla_iters)


class DetectDebug(NamedTuple):
    """Intermediate masks for visualization/tests (all (H, W) bool)."""

    binary: jnp.ndarray
    h_mask: jnp.ndarray
    v_mask: jnp.ndarray
    roi_mask: jnp.ndarray
    h_expanded: jnp.ndarray
    v_expanded: jnp.ndarray
    centroids: jnp.ndarray       # (P, 2) float
    centroids_valid: jnp.ndarray  # (P,)
    center_seed: jnp.ndarray     # (2,)
    row_coeffs: jnp.ndarray      # (R, D+1)
    col_coeffs: jnp.ndarray      # (C, D+1)
    row_valid: jnp.ndarray
    col_valid: jnp.ndarray


def _to_gray(image: jnp.ndarray, dtype) -> jnp.ndarray:
    img = image.astype(dtype)
    if img.ndim == 3:
        return bgr_to_gray(img)
    return img


def _joint_centroids(
    joints: jnp.ndarray, cfg: DetectConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Component centroids of the joints mask (ref extract_joints contours).

    Returns int-truncated float centroids (the reference casts int(M10/M00))
    and a validity mask, capacity cfg.max_points.
    """
    labels = _cc(joints, 8, cfg, frac=0.4)
    stats = labeling.component_stats_first_k(
        labels, k=cfg.max_points, compute_bbox=False
    )
    cents = jnp.floor(stats.centroid)
    return cents, stats.valid


def _largest_component_lowres(mask: jnp.ndarray, cfg: DetectConfig) -> jnp.ndarray:
    """Largest connected component computed at 1/4 resolution.

    ROI components span most of the image (geodesic diameter ~500 px), which
    is expensive for any label-propagation scheme at full resolution but
    trivial at 1/4: max-pool down, label with the (cheap, tiny) XLA scan CC,
    upsample the winner.  The ROI feeds a bbox + mask with +35 px margins, so
    quarter-pixel fidelity is irrelevant."""
    h, w = mask.shape
    small = jax.lax.reduce_window(
        mask.astype(jnp.float32), -jnp.inf, jax.lax.max, (4, 4), (4, 4), "VALID"
    ) > 0.5
    labels = labeling.connected_components(small, iters=cfg.cc_iters)
    largest = labeling.largest_component_mask(labels)
    return jnp.repeat(jnp.repeat(largest, 4, axis=0), 4, axis=1)[:h, :w]


def _roi_cylinder(
    h_mask: jnp.ndarray, v_mask: jnp.ndarray, cfg: CylinderDetectConfig
) -> jnp.ndarray:
    """Grid-region mask: dilate the line masks until they merge, take the
    largest component, orthoconvex-fill (stands in for the blob-hull ROI,
    ref detect_largest_blob utils/util_cylinder.py:1830-1899)."""
    lines = h_mask | v_mask
    merged = morphology.dilate_rect(lines, 35, 35)
    largest = _largest_component_lowres(merged, cfg) & merged
    return labeling.fill_orthoconvex(largest)


def _roi_plane(gray: jnp.ndarray, cfg: PlaneDetectConfig) -> jnp.ndarray:
    """Threshold-127 hull ROI (ref get_convex_hull utils/util_plane.py:2590-2689)."""
    th = gray > cfg.roi_threshold
    largest = _largest_component_lowres(th, cfg) & th
    hull = labeling.fill_orthoconvex(largest)
    return morphology.dilate_rect(hull, 2 * cfg.roi_expand + 1, 2 * cfg.roi_expand + 1)


def _bbox_of(mask: jnp.ndarray) -> jnp.ndarray:
    """(x, y, w, h) int32 bounding box of a bool mask (cv2.boundingRect)."""
    h, w = mask.shape
    cols_any = jnp.any(mask, axis=0)
    rows_any = jnp.any(mask, axis=1)
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    x0 = jnp.min(jnp.where(cols_any, xs, w))
    x1 = jnp.max(jnp.where(cols_any, xs, -1))
    y0 = jnp.min(jnp.where(rows_any, ys, h))
    y1 = jnp.max(jnp.where(rows_any, ys, -1))
    return jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1]).astype(jnp.int32)


def _center_seed(
    cents: jnp.ndarray,
    cvalid: jnp.ndarray,
    gray: jnp.ndarray,
    bbox: jnp.ndarray,
    cfg: DetectConfig,
    bright_img: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Brightest joint inside the ROI bbox + distance to its 2nd neighbor
    (ref find_cylinder_centroids_and_center utils/util_cylinder.py:1902-1941)."""
    x0, y0, bw, bh = bbox[0], bbox[1], bbox[2], bbox[3]
    inside = (
        cvalid
        & (cents[:, 0] >= x0)
        & (cents[:, 0] < x0 + bw)
        & (cents[:, 1] >= y0)
        & (cents[:, 1] < y0 + bh)
    )
    if bright_img is None:
        patch = 2 * cfg.center_patch_half + 1
        bright_img = box_filter(gray, patch, mode="constant")
    xi = jnp.clip(cents[:, 0].astype(jnp.int32), 0, gray.shape[1] - 1)
    yi = jnp.clip(cents[:, 1].astype(jnp.int32), 0, gray.shape[0] - 1)
    bright = jnp.where(inside, bright_img[yi, xi], -jnp.inf)
    ci = jnp.argmax(bright)
    center = cents[ci]
    d = jnp.linalg.norm(cents - center, axis=-1)
    d = jnp.where(inside, d, jnp.inf)
    d2 = jnp.sort(d)[1]  # 2nd nearest (the nearest is the center itself)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return center, jnp.floor(d2), inside


def _saturation_carve(
    gray: jnp.ndarray,
    h_mask: jnp.ndarray,
    v_mask: jnp.ndarray,
    roi_mask: jnp.ndarray,
    cfg: DetectConfig,
    sat: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Carve the saturated (specular) blob out of the line masks
    (ref mask_roi_around_center utils/util_cylinder.py:1944-2007)."""
    if sat is None:
        blurred = gaussian_blur_cv(gray, cfg.sat_blur_ksize)
        sat = blurred > cfg.sat_threshold
    labels = _cc(sat, 8, cfg, frac=0.4)
    stats = labeling.component_stats_first_k(labels, k=16)
    li = jnp.argmax(stats.count)  # largest saturated blob
    has = stats.valid[li]
    cx, cy = stats.centroid[li, 0], stats.centroid[li, 1]
    # Circumscribing radius: max distance from the centroid to blob pixels.
    hgt, wdt = gray.shape
    yy = jnp.arange(hgt, dtype=jnp.float32)[:, None]
    xx = jnp.arange(wdt, dtype=jnp.float32)[None, :]
    blob = labels == stats.root[li]
    dist = jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    radius0 = jnp.where(has, jnp.max(jnp.where(blob, dist, 0.0)), 0.0)
    r0i = jnp.floor(radius0)
    # ref :1979-1983: small blobs get +20, large +5
    radius = jnp.where(r0i < 30, r0i + 20.0, r0i + 5.0)
    # ellipse axes (ref :1986-1991): semi-x (r+40)/2, semi-y (r+20)/2
    ax = (radius + 40.0) / 2.0
    ay = jnp.maximum(radius + 20.0, 1.0) / 2.0
    in_ellipse = ((xx - cx) / ax) ** 2 + ((yy - cy) / ay) ** 2 <= 1.0
    carve = has & in_ellipse
    mh = h_mask & ~carve & roi_mask
    mv = v_mask & ~carve & roi_mask
    mh = morphology.open_rect(mh, 3, 3)
    mv = morphology.open_rect(mv, 3, 3)
    return mh, mv, r0i


def _bridge(
    mask: jnp.ndarray,
    base_angle: float,
    kernel_len: jnp.ndarray,
    max_kernel_len: int,
    cfg: DetectConfig,
) -> jnp.ndarray:
    """Bridge broken line segments along their direction
    (ref expands_line_roi utils/util_cylinder.py:137-237).

    Per repeat: label components, take the *median* component orientation
    (ref expand_line_roi takes the median of per-contour PCA angles), detect
    endpoints (mask pixels whose directional probe is empty), and dilate them
    with an oriented line kernel of traced length; 3x3 erosion follows, as in
    the reference (ref :186-189).

    The reference's crucial merge guard is preserved: components whose extent
    exceeds bridge_long_frac * max extent are NOT expanded on the cylinder
    path (ref :169) -- unbroken full-length lines stay untouched, so tightly
    spaced neighbors cannot be bridged into one label.

    base_angle pins the orientation branch (0 rows, pi/2 cols)."""
    hgt, wdt = mask.shape
    hw = hgt * wdt
    out = mask
    for _ in range(cfg.bridge_repeats):
        labels = _cc(out, cfg.cc_iters // 2, cfg, frac=1.0)
        stats = labeling.component_stats_first_k(
            labels, k=_MAX_COMPONENTS, min_area=4
        )
        ang = labeling.component_orientation(stats)
        # wrap into (base - pi/2, base + pi/2]
        ang = ang - base_angle
        ang = jnp.arctan2(jnp.sin(ang), jnp.cos(ang))
        ang = jnp.where(ang > jnp.pi / 2, ang - jnp.pi, ang)
        ang = jnp.where(ang <= -jnp.pi / 2, ang + jnp.pi, ang)
        diag = jnp.linalg.norm(
            (stats.bbox[:, 2:4] - stats.bbox[:, 0:2]).astype(jnp.float32), axis=-1
        )
        gate_med = stats.valid & (diag >= cfg.bridge_min_len) & (
            diag <= cfg.bridge_max_len
        )
        med = jnp.nanmedian(jnp.where(gate_med, ang, jnp.nan))
        angle = jnp.where(jnp.isnan(med), 0.0, med) + base_angle

        # Per-pixel expansion gate: short (broken) segments only.
        if cfg.bridge_skip_long:
            max_diag = jnp.max(jnp.where(stats.valid, diag, 0.0))
            expandable = stats.valid & (diag <= cfg.bridge_long_frac * max_diag)
            exp_full = (
                jnp.zeros((hw + 1,), bool).at[stats.root].set(expandable)
            )
            exp_img = exp_full[labels]
        else:
            exp_img = out

        fwd = morphology.directional_count(out, angle, cfg.endpoint_probe_len, +1)
        bwd = morphology.directional_count(out, angle, cfg.endpoint_probe_len, -1)
        endpoints = out & exp_img & ((fwd <= 1.0) | (bwd <= 1.0))
        grown = morphology.dilate_line(endpoints, angle, max_kernel_len, kernel_len)
        grown = morphology.dilate_rect(grown, 3, 3)  # give the line thickness
        out = out | (morphology.erode_rect(out | grown, 3, 3) & grown)
    return out


def _assign_labels(
    label_img: jnp.ndarray, cents: jnp.ndarray, cvalid: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Map each centroid to the component label under it (3x3 tolerant),
    compacted to [0, capacity) slot ids (ref group_points_by_label
    utils/util_cylinder.py:376-389)."""
    h, w = label_img.shape
    hw = h * w
    xi = jnp.clip(cents[:, 0].astype(jnp.int32), 1, w - 2)
    yi = jnp.clip(cents[:, 1].astype(jnp.int32), 1, h - 2)
    best = jnp.full((cents.shape[0],), hw, jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            best = jnp.minimum(best, label_img[yi + dy, xi + dx])
    assigned = cvalid & (best < hw)
    roots = jnp.where(assigned, best, hw)
    slot_roots = jnp.unique(roots, size=capacity, fill_value=hw)
    slot_valid = slot_roots < hw
    slot_of = jnp.searchsorted(slot_roots, roots)
    slot_of = jnp.clip(slot_of, 0, capacity - 1)
    ok = assigned & (slot_roots[slot_of] == roots)
    return jnp.where(ok, slot_of, capacity - 1), ok, slot_valid


def _fit_label_polys(
    cents: jnp.ndarray,
    slot_of: jnp.ndarray,
    ok: jnp.ndarray,
    capacity: int,
    degree: int,
    margin: float,
    swap_xy: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-label polynomial fit over member centroids, one batched solve
    (ref fit_and_draw_polynomial utils/util_cylinder.py:473-550).

    Rows fit y = f(x); cols (swap_xy) fit x = g(y).  Returns (coeffs, domain,
    valid, count)."""
    x = cents[:, 1] if swap_xy else cents[:, 0]
    y = cents[:, 0] if swap_xy else cents[:, 1]
    w = (
        (slot_of[None, :] == jnp.arange(capacity)[:, None]) & ok[None, :]
    ).astype(x.dtype)  # (capacity, P)
    xs = jnp.broadcast_to(x, w.shape)
    ys = jnp.broadcast_to(y, w.shape)
    coeffs = masked_polyfit(xs, ys, w, degree)
    domain = poly_domain(xs, w, margin)
    count = jnp.sum(w, axis=-1)
    valid = count >= degree + 1
    return coeffs, domain, valid, count


def _rank_by(key: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Dense rank of valid entries by key (invalid sink to the end)."""
    k = jnp.where(valid, key, jnp.inf)
    order = jnp.argsort(k)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return ranks


def detect_grid(
    image: jnp.ndarray, cfg: DetectConfig, return_debug: bool = False
):
    """Full single-image grid detection -> DetectResult (+ DetectDebug).

    image: (H, W) or (H, W, 3) uint8/float.  Jittable; vmap over a leading
    frame axis for batched detection (cfg is static).
    """
    dtype = jnp.float32 if cfg.image_dtype == "float32" else jnp.bfloat16
    gray = _to_gray(image, jnp.float32)

    # 1.-2. preprocess / binarize + line openings + joints.  The Pallas path
    # fuses all of it into one VMEM-resident kernel (~0.06 ms/frame on v5e vs
    # tens of ms of HBM-bound XLA passes); the XLA path is the portable
    # reference implementation.
    if cfg.use_pallas:
        from cylinder_pose_estimation_tpu.ops.pallas.frontend import (
            preprocess_binarize,
        )

        assert cfg.height % 8 == 0 and cfg.width % 128 == 0, (
            "pallas front-end needs TPU-tiled image shapes"
        )
        b_f, h_f, v_f, j_f, sat_f, bright_center, bright_index = (
            preprocess_binarize(
                gray,
                blur_ksize=cfg.blur_ksize,
                ridge_sigma=cfg.ridge_sigma,
                sauvola_window=cfg.sauvola_window,
                sauvola_k=cfg.sauvola_k,
                sauvola_r=cfg.sauvola_r,
                min_contrast=0.05,
                line_len=cfg.line_kernel_len,
                margin=cfg.line_kernel_len,
                sat_blur_ksize=cfg.sat_blur_ksize,
                sat_threshold=cfg.sat_threshold,
                center_patch=2 * cfg.center_patch_half + 1,
                index_blur_ksize=cfg.index_blur_ksize,
                index_patch=2 * cfg.patch_half_min + 1,
                interpret=cfg.pallas_interpret,
            )
        )
        binary = b_f > 0.5
        h_mask = h_f > 0.5
        v_mask = v_f > 0.5
        joints = j_f > 0.5
        sat_mask = sat_f > 0.5
    else:
        blurred = gaussian_blur_cv(gray.astype(dtype), cfg.blur_ksize)
        binary = binarize_ridges(
            blurred.astype(jnp.float32),
            cfg.ridge_sigma,
            cfg.sauvola_window,
            cfg.sauvola_k,
            cfg.sauvola_r,
            min_contrast=0.05,
        )
        h_mask = morphology.open_rect(binary, 1, cfg.line_kernel_len)
        v_mask = morphology.open_rect(binary, cfg.line_kernel_len, 1)
        joints = h_mask & v_mask
        sat_mask = None
        bright_center = None
        bright_index = None
    cents, cvalid = _joint_centroids(joints, cfg)

    # 3. ROI
    if cfg.mode == "cylinder":
        roi = _roi_cylinder(h_mask, v_mask, cfg)  # type: ignore[arg-type]
    else:
        roi = _roi_plane(gray, cfg)  # type: ignore[arg-type]
    bbox = _bbox_of(roi)

    # 4. center seed
    center, seed_radius, inside = _center_seed(
        cents, cvalid, gray, bbox, cfg, bright_img=bright_center
    )

    # 5. saturation carve
    mh, mv, circle_radius0 = _saturation_carve(
        gray, h_mask, v_mask, roi, cfg, sat=sat_mask
    )

    # 6a. bridge lines
    kernel_len = jnp.asarray(cfg.bridge_kernel_base, jnp.float32) + circle_radius0
    max_kernel = cfg.bridge_kernel_base + 160
    h_exp = _bridge(mh, 0.0, kernel_len, max_kernel, cfg)
    v_exp = _bridge(mv, jnp.pi / 2, kernel_len, max_kernel, cfg)

    # 6b. label rows/cols and assign centroids
    h_labels = _cc(h_exp, cfg.cc_iters, cfg)
    v_labels = _cc(v_exp, cfg.cc_iters, cfg)
    row_of, row_ok, _ = _assign_labels(h_labels, cents, inside, cfg.max_rows)
    col_of, col_ok, _ = _assign_labels(v_labels, cents, inside, cfg.max_cols)

    # 6c. per-label polynomial fits
    row_coeffs, row_dom, row_valid, _ = _fit_label_polys(
        cents, row_of, row_ok, cfg.max_rows, cfg.poly_degree, cfg.domain_margin, False
    )
    col_coeffs, col_dom, col_valid, _ = _fit_label_polys(
        cents, col_of, col_ok, cfg.max_cols, cfg.poly_degree, cfg.domain_margin, True
    )

    # 6c'. optional subpixel refinement of the fitted curves toward the
    # grayscale center of gravity (the reference ships this but keeps it off
    # its main path, ref :2040; enable via cfg.subpixel_refine)
    if cfg.subpixel_refine:
        from cylinder_pose_estimation_tpu.models.refine import refine_curves_cog

        row_coeffs = refine_curves_cog(
            gray, row_coeffs, row_dom, row_valid, cfg.poly_degree,
            n_samples=cfg.subpixel_samples, window=cfg.subpixel_window,
            swap_xy=False,
        )
        col_coeffs = refine_curves_cog(
            gray, col_coeffs, col_dom, col_valid, cfg.poly_degree,
            n_samples=cfg.subpixel_samples, window=cfg.subpixel_window,
            swap_xy=True,
        )

    # 6d. prune first row / last col (ref remove_label utils/util_cylinder.py:1211-1269)
    if getattr(cfg, "drop_first_row", False):
        row_min_y = _label_extreme(cents[:, 1], row_of, row_ok, cfg.max_rows, "min")
        first = jnp.argmin(jnp.where(row_valid, row_min_y, jnp.inf))
        row_valid = row_valid & (jnp.arange(cfg.max_rows) != first)
    if getattr(cfg, "drop_last_col", False):
        col_min_x = _label_extreme(cents[:, 0], col_of, col_ok, cfg.max_cols, "min")
        last = jnp.argmax(jnp.where(col_valid, col_min_x, -jnp.inf))
        col_valid = col_valid & (jnp.arange(cfg.max_cols) != last)

    # 6e. intersections (ref find_and_assign_intersections_P :1106-1151)
    x0 = 0.5 * (row_dom[:, 0] + row_dom[:, 1])
    xi, yi = poly_intersection(
        row_coeffs[:, None, :],
        col_coeffs[None, :, :],
        jnp.broadcast_to(x0[:, None], (cfg.max_rows, cfg.max_cols)),
        iters=cfg.newton_iters,
    )
    tol = cfg.intersection_tol
    bx0, by0 = bbox[0].astype(jnp.float32), bbox[1].astype(jnp.float32)
    bx1 = bx0 + bbox[2].astype(jnp.float32)
    by1 = by0 + bbox[3].astype(jnp.float32)
    residual_ok = jnp.abs(xi - polyval(col_coeffs[None, :, :], yi)) < 0.5
    accept = (
        row_valid[:, None]
        & col_valid[None, :]
        & (xi >= row_dom[:, None, 0] - tol)
        & (xi <= row_dom[:, None, 1] + tol)
        & (yi >= col_dom[None, :, 0] - tol)
        & (yi <= col_dom[None, :, 1] + tol)
        & (xi >= bx0) & (xi <= bx1) & (yi >= by0) & (yi <= by1)
        & residual_ok
        & jnp.isfinite(xi) & jnp.isfinite(yi)
    )

    # 6f. relabel by position (ref clean_and_relabel :1154-1206)
    any_row = jnp.any(accept, axis=1)
    any_col = jnp.any(accept, axis=0)
    mean_y = jnp.sum(jnp.where(accept, yi, 0.0), axis=1) / jnp.maximum(
        jnp.sum(accept, axis=1), 1
    )
    mean_x = jnp.sum(jnp.where(accept, xi, 0.0), axis=0) / jnp.maximum(
        jnp.sum(accept, axis=0), 1
    )
    row_rank = _rank_by(mean_y, any_row)
    col_rank = _rank_by(mean_x, any_col)

    # 6g. center indexing (ref indexing_data :1350-1571)
    if bright_index is None:
        blur_idx = gaussian_blur_cv(gray, cfg.index_blur_ksize)
        patch = 2 * cfg.patch_half_min + 1
        bright_img = box_filter(blur_idx, patch, mode="constant")
    else:
        bright_img = bright_index
    xg = jnp.clip(jnp.round(xi).astype(jnp.int32), 0, gray.shape[1] - 1)
    yg = jnp.clip(jnp.round(yi).astype(jnp.int32), 0, gray.shape[0] - 1)
    bright = jnp.where(accept, bright_img[yg, xg], -jnp.inf)
    flat_ci = jnp.argmax(bright.reshape(-1))
    c_r = flat_ci // cfg.max_cols
    c_c = flat_ci % cfg.max_cols

    row_idx = row_rank - row_rank[c_r]
    col_idx = col_rank - col_rank[c_c]
    if getattr(cfg, "drop_negative_cols", False):
        accept = accept & (col_idx[None, :] >= 0)

    # ids: cylinder (x=col, y=row) ref :1497; plane (row, col) ref plane :1398
    ri = jnp.broadcast_to(row_idx[:, None], accept.shape)
    ci = jnp.broadcast_to(col_idx[None, :], accept.shape)
    if cfg.id_row_major:
        ids = jnp.stack([ri, ci], axis=-1)
    else:
        ids = jnp.stack([ci, ri], axis=-1)

    n = cfg.max_rows * cfg.max_cols
    grid = GridPoints(
        xy=jnp.stack([xi, yi], axis=-1).reshape(n, 2),
        idx=ids.reshape(n, 2).astype(jnp.int32),
        valid=accept.reshape(n),
        center=jnp.stack(
            [xi[c_r, c_c], yi[c_r, c_c]]
        ),
    )
    ok = jnp.sum(accept) >= 4
    result = DetectResult(
        grid=grid, ok=ok, roi_bbox=bbox, circle_radius0=circle_radius0
    )
    if not return_debug:
        return result
    debug = DetectDebug(
        binary=binary,
        h_mask=mh,
        v_mask=mv,
        roi_mask=roi,
        h_expanded=h_exp,
        v_expanded=v_exp,
        centroids=cents,
        centroids_valid=inside,
        center_seed=center,
        row_coeffs=row_coeffs,
        col_coeffs=col_coeffs,
        row_valid=row_valid,
        col_valid=col_valid,
    )
    return result, debug


def _label_extreme(
    vals: jnp.ndarray, slot_of: jnp.ndarray, ok: jnp.ndarray, capacity: int, kind: str
) -> jnp.ndarray:
    """Per-label min/max of a per-centroid value."""
    onehot = (slot_of[None, :] == jnp.arange(capacity)[:, None]) & ok[None, :]
    if kind == "min":
        return jnp.min(jnp.where(onehot, vals[None, :], jnp.inf), axis=-1)
    return jnp.max(jnp.where(onehot, vals[None, :], -jnp.inf), axis=-1)
