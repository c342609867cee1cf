"""Hessian ridge detection + fast Sauvola binarization.

Replaces the reference's preprocess/binarize stage
(ref utils/util_cylinder.py:1734-1802 = utils/util_plane.py:2459-2492):

  1. Hessian ridge: skimage.feature.hessian_matrix(sigma, order='rc') smooths
     with a Gaussian then applies np.gradient twice; eigenvalues of the 2x2
     [[Hrr, Hrc], [Hrc, Hcc]] come from the closed form.  The reference keeps
     the *minima* image (smaller eigenvalue): bright thin lines have strongly
     negative curvature across the line.
  2. Sauvola: local mean/std via box filters (window 15, BORDER_REPLICATE),
     threshold T = m * (1 + k*(s/R - 1)); the binarized ridge image is then
     inverted, so laser lines are True (ref :1797-1801).

All stages are dense fixed-shape math -- one fused XLA graph per image.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cylinder_pose_estimation_tpu.ops.image import box_filter, gaussian_blur_scipy, gradient2d
from cylinder_pose_estimation_tpu.ops.linalg import eigh2x2


def hessian_eigenimages(
    img: jnp.ndarray, sigma: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(maxima, minima) Hessian eigenvalue images, skimage-compatible.

    skimage computes the Hessian as np.gradient applied to the Gaussian
    smoothed image twice (mode='constant'); eigvals sorted descending.
    """
    # skimage defaults to mode='constant', which manufactures a strong ridge
    # ring along the image border (zero padding vs real intensities); the
    # reference's blob-based ROI happens to mask it out downstream.  We use
    # reflect padding instead: flat borders stay flat, no ring, and interior
    # response is identical beyond the kernel support.
    g = gaussian_blur_scipy(img, sigma, mode="reflect101")
    gr, gc = gradient2d(g)
    hrr, hrc = gradient2d(gr)
    _, hcc = gradient2d(gc)
    evals, _ = eigh2x2(hrr, hrc, hcc)  # ascending: [minima, maxima]
    return evals[..., 1], evals[..., 0]


def sauvola_threshold(
    img: jnp.ndarray, window: int = 15, k: float = 0.5, r: float = 128.0
) -> jnp.ndarray:
    """Sauvola threshold surface via box-filter mean/variance
    (ref utils/util_cylinder.py:1740-1766 sauvola_threshold_fast)."""
    mean = box_filter(img, window, mode="edge")
    mean_sq = box_filter(img * img, window, mode="edge")
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    std = jnp.sqrt(var)
    return mean * (1.0 + k * (std / r - 1.0))


def binarize_ridges(
    gray_blurred: jnp.ndarray,
    ridge_sigma: float = 3.0,
    window: int = 15,
    k: float = 0.5,
    r: float = 128.0,
    min_contrast: float = 0.0,
) -> jnp.ndarray:
    """Full preprocess/binarize: ridge minima -> Sauvola -> inverted binary.

    Returns a bool mask where laser-grid lines are True (the reference's
    255-valued pixels after inversion, ref :1798-1801).

    min_contrast > 0 additionally requires minima < -min_contrast, rejecting
    perfectly flat (zero-curvature) regions that Sauvola tie-breaks to True.
    Real sensor noise makes those regions speckle (which the downstream
    20-px line opening removes, as in the reference); the floor makes the
    stage robust to noise-free synthetic input too.  Default 0 = exact
    reference behavior.
    """
    _, minima = hessian_eigenimages(gray_blurred, ridge_sigma)
    t = sauvola_threshold(minima, window, k, r)
    binary = ~(minima > t)
    if min_contrast > 0.0:
        binary = binary & (minima < -min_contrast)
    return binary
