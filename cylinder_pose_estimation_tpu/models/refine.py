"""Subpixel curve refinement and plane-path outlier-label removal.

Two inventory components the reference ships but keeps OFF its main path:

  * Grayscale center-of-gravity refinement of the fitted row/col polynomials
    (ref utils/util_cylinder.py:706-971 modify_grayscale_Cline, commented out
    at ref :2040; plane variant utils/util_plane.py:789-921).  Sample each
    fitted curve at fixed steps, shift every sample to the intensity center
    of gravity within a +-window perpendicular to the curve (clamped to
    +-0.5 px per step like the reference), and refit the polynomial.
  * Interval-based anomaly removal of row/col labels on the plane path
    (ref utils/util_plane.py:1861-2042, called from remove_line :2243-2297
    where the reference keeps the slope stage commented out) plus the
    drop-first/last-row/col stage (ref :1789-1858).

Both are dense masked-array transforms over the detector's label slots, so
they vmap over frames and compose with detect_grid outputs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cylinder_pose_estimation_tpu.ops.polyfit import masked_polyfit, polyval


def refine_curves_cog(
    gray: jnp.ndarray,
    coeffs: jnp.ndarray,
    domain: jnp.ndarray,
    valid: jnp.ndarray,
    degree: int,
    n_samples: int = 64,
    window: int = 7,
    max_shift: float = 0.5,
    swap_xy: bool = False,
) -> jnp.ndarray:
    """Refine per-label polynomials to the grayscale center of gravity.

    coeffs: (L, D+1) label polynomials y=f(x) (or x=g(y) with swap_xy);
    domain: (L, 2); valid: (L,).  Returns refined coefficients (invalid labels
    pass through).  The CoG runs over a +-window strip perpendicular to the
    curve, sampled bilinearly; shifts are clamped to +-max_shift like the
    reference (ref utils/util_cylinder.py:737-757).
    """
    h, w = gray.shape
    g = gray.astype(jnp.float32)

    def refine_one(c, dom, ok):
        t = jnp.linspace(0.0, 1.0, n_samples)
        xs = dom[0] + t * (dom[1] - dom[0])
        ys = polyval(c, xs)
        offs = jnp.arange(-window, window + 1, dtype=jnp.float32)
        # perpendicular strip: vary y for rows, x for cols
        if swap_xy:
            px = ys[:, None] + offs[None, :]
            py = jnp.broadcast_to(xs[:, None], px.shape)
            sx, sy = px, py
        else:
            py = ys[:, None] + offs[None, :]
            px = jnp.broadcast_to(xs[:, None], py.shape)
            sx, sy = px, py
        from cylinder_pose_estimation_tpu.ops.image import bilinear_sample

        vals = bilinear_sample(g, sx, sy)
        wsum = jnp.sum(vals, axis=-1)
        cog = jnp.sum(vals * offs[None, :], axis=-1) / jnp.maximum(wsum, 1e-6)
        cog = jnp.clip(cog, -max_shift * window, max_shift * window)
        ys_new = ys + cog
        # keep only samples whose curve point lies inside the image
        img_x = ys if swap_xy else xs
        img_y = xs if swap_xy else ys
        inside = (img_x >= 0) & (img_x < w) & (img_y >= 0) & (img_y < h)
        wts = inside.astype(jnp.float32)
        c_new = masked_polyfit(xs, ys_new, wts, degree)
        return jnp.where(ok, c_new, c)

    return jax.vmap(refine_one)(coeffs, domain, valid)


def remove_first_last_labels(
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    row_rank: jnp.ndarray,
    col_rank: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop the first & last row and col by rank
    (ref utils/util_plane.py:1789-1858 remove_first_last_labels)."""
    n_rows = jnp.sum(row_valid)
    n_cols = jnp.sum(col_valid)
    rv = row_valid & (row_rank != 0) & (row_rank != n_rows - 1)
    cv = col_valid & (col_rank != 0) & (col_rank != n_cols - 1)
    return rv, cv


def interval_anomaly_mask(
    means: jnp.ndarray,
    valid: jnp.ndarray,
    rel_tolerance: float = 0.45,
) -> jnp.ndarray:
    """Interval-based anomaly gate over sorted label positions
    (ref utils/util_plane.py:1861-2042).

    The reference extrapolates each label's mean x (cols) / mean y (rows)
    linearly from its neighbors and drops labels whose spacing deviates.
    Dense equivalent: compare each consecutive gap to the median gap and mark
    labels bounding gaps that deviate more than rel_tolerance, keeping the
    side consistent with its other neighbor.
    """
    big = jnp.asarray(jnp.finfo(means.dtype).max, means.dtype)
    key = jnp.where(valid, means, big)
    order = jnp.argsort(key)
    sorted_means = key[order]
    n = jnp.sum(valid)
    idx = jnp.arange(means.shape[0])
    gaps = sorted_means[1:] - sorted_means[:-1]          # (L-1,)
    gap_valid = (idx[1:] < n)
    med = jnp.nanmedian(jnp.where(gap_valid, gaps, jnp.nan))
    med = jnp.where(jnp.isnan(med), 1.0, med)
    bad_gap = gap_valid & (jnp.abs(gaps - med) > rel_tolerance * jnp.abs(med))
    # gaps[i] sits between ranks i and i+1: for the label at rank i the gap
    # below is gaps[i-1], the gap above is gaps[i].  A label is anomalous if
    # BOTH its gaps are bad (interior) or its single gap is bad (ends).
    bad_below = jnp.concatenate([jnp.zeros((1,), bool), bad_gap])
    bad_above = jnp.concatenate([bad_gap, jnp.zeros((1,), bool)])
    bad_sorted = jnp.where(
        idx == 0,
        bad_above,
        jnp.where(idx == n - 1, bad_below, bad_below & bad_above),
    )
    keep_sorted = ~bad_sorted & (idx < n)
    keep = jnp.zeros_like(valid).at[order].set(keep_sorted)
    return valid & keep
