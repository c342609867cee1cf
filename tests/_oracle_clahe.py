"""NumPy oracle for MATLAB-style adapthisteq (ref utils/preProcessing.m:17-18).

The reference's stereo preprocessing runs MATLAB ``adapthisteq`` with
defaults: 8x8 tiles, normalized ClipLimit 0.01, 256 bins, 'uniform'
distribution, 'full' range.  That algorithm (Zuiderveld's CLAHE, Graphics
Gems IV, which the MATLAB documentation cites) differs from the cv2-style
implementation in three places:

1. clip limit   = minClip + round(normClip * (tilePx - minClip)),
                  minClip = ceil(tilePx / nBins)   -- not norm*tilePx;
2. excess redistribution is ITERATIVE: uniform add, re-clip, repeat until
   the leftover excess stops shrinking (a single uniform pass leaves bins
   above the limit whenever redistribution pushes clipped bins back over);
3. the 'uniform' output mapping is  range * cdf / tilePx  over the FULL
   output range -- not the (cdf - cdf_min)/(N - cdf_min) equalizeHist
   normalization.

Pixel lookups blend the four surrounding tile mappings bilinearly (standard
CLAHE; identical in cv2/MATLAB).  Loops are fine here -- this runs on a few
test images.
"""

from __future__ import annotations

import numpy as np


def _clip_histogram(hist: np.ndarray, clip_limit: float) -> np.ndarray:
    """Zuiderveld clipping: move all excess above the limit into the bins
    uniformly, re-clipping until stable (integer-free float variant)."""
    h = hist.astype(np.float64).copy()
    n_bins = h.shape[-1]
    for _ in range(64):
        excess = np.sum(np.maximum(h - clip_limit, 0.0))
        if excess <= 1e-9:
            break
        # total mass preserved; the re-generated excess (bins already at the
        # limit receiving the uniform share) shrinks geometrically
        h = np.minimum(h, clip_limit) + excess / n_bins
    return h


def adapthisteq(
    img: np.ndarray,
    tiles: int = 8,
    clip_limit: float = 0.01,
    n_bins: int = 256,
    out_range: float = 255.0,
) -> np.ndarray:
    """MATLAB-default adapthisteq over an (H, W) image in [0, 255].

    H, W must be tile multiples (the callers' 480x640 with 8x8 tiles are).
    Returns float64 in [0, out_range].
    """
    h, w = img.shape
    assert h % tiles == 0 and w % tiles == 0
    th, tw = h // tiles, w // tiles
    tile_px = th * tw

    x = np.clip(np.asarray(img, np.float64), 0.0, 255.0)
    bins = np.clip((x * (n_bins / 256.0)).astype(np.int64), 0, n_bins - 1)

    min_clip = np.ceil(tile_px / n_bins)
    limit = min_clip + np.round(clip_limit * (tile_px - min_clip))

    luts = np.zeros((tiles, tiles, n_bins), np.float64)
    for ty in range(tiles):
        for tx in range(tiles):
            tile_bins = bins[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            hist = np.bincount(tile_bins.reshape(-1), minlength=n_bins).astype(
                np.float64
            )
            hist = _clip_histogram(hist, limit)
            cdf = np.cumsum(hist)
            luts[ty, tx] = np.minimum(out_range * cdf / tile_px, out_range)

    fy = (np.arange(h, dtype=np.float64) + 0.5) / th - 0.5
    fx = (np.arange(w, dtype=np.float64) + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, tiles - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, tiles - 1)
    y1 = np.clip(y0 + 1, 0, tiles - 1)
    x1 = np.clip(x0 + 1, 0, tiles - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :]

    y0g, y1g = y0[:, None], y1[:, None]
    x0g, x1g = x0[None, :], x1[None, :]
    v00 = luts[y0g, x0g, bins]
    v01 = luts[y0g, x1g, bins]
    v10 = luts[y1g, x0g, bins]
    v11 = luts[y1g, x1g, bins]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
