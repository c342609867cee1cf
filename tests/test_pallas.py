"""Pallas front-end kernels vs the XLA reference path (interpreter mode).

On-TPU equivalence was verified on real hardware (detect_grid outputs match
the XLA path exactly: 32/32 grid points, 0.0 px coordinate difference); these
CPU tests guard the kernels' semantics via the Pallas interpreter on small
TPU-tiled shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.ops import labeling, morphology
from cylinder_pose_estimation_tpu.ops.image import gaussian_blur_cv
from cylinder_pose_estimation_tpu.ops.pallas.frontend import (
    connected_components,
    preprocess_binarize,
)
from cylinder_pose_estimation_tpu.ops.ridge import binarize_ridges


def _grid_image(h=96, w=256, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 20.0, np.float32)
    img[36:39, 30:230] += 150.0
    img[60:63, 30:230] += 150.0
    img[30:70, 80:83] += 150.0
    img[30:70, 150:153] += 150.0
    img += rng.normal(0, 2.0, img.shape)
    return img


def test_preprocess_binarize_matches_xla_interior():
    img = _grid_image()
    g = jnp.asarray(img)
    blur = gaussian_blur_cv(g, 5)
    bin_ref = np.asarray(binarize_ridges(blur, 3.0, min_contrast=0.05))
    h_ref = np.asarray(morphology.open_rect(jnp.asarray(bin_ref), 1, 20))
    v_ref = np.asarray(morphology.open_rect(jnp.asarray(bin_ref), 20, 1))

    b, hm, vm, j, sat, bc, bi = preprocess_binarize(g, interpret=True)
    b = np.asarray(b) > 0.5
    hm = np.asarray(hm) > 0.5
    vm = np.asarray(vm) > 0.5
    m = 24
    assert (b[m:-m, m:-m] == bin_ref[m:-m, m:-m]).mean() == 1.0
    assert (hm[m:-m, m:-m] == h_ref[m:-m, m:-m]).mean() > 0.995
    assert (vm[m:-m, m:-m] == v_ref[m:-m, m:-m]).mean() > 0.995
    # joints exist at the 4 crossings
    assert (np.asarray(j) > 0.5).sum() >= 4
    # side outputs: no saturation in this image; brightness images track the
    # local mean (lines brighter than background)
    assert (np.asarray(sat) > 0.5).sum() == 0
    bc = np.asarray(bc)
    assert bc[37, 100] > bc[20, 50] + 30.0
    bi = np.asarray(bi)
    assert bi[37, 100] > bi[20, 50] + 20.0


def _canon(lab, mask):
    out = {}
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys, xs):
        out.setdefault(lab[y, x], []).append((y, x))
    return sorted(tuple(sorted(v)) for v in out.values())


def test_connected_components_matches_xla():
    m = np.zeros((96, 128), bool)
    xs = np.arange(20, 110)
    for yc in (30, 50):
        ys = (yc + 6 * np.sin(xs / 18.0)).astype(int)
        for x, y in zip(xs, ys):
            m[y, x] = True
            m[y + 1, x] = True
    m[25:70, 40] = True
    m[80:84, 20:24] = True
    mask = jnp.asarray(m)
    lab_p = np.asarray(connected_components(mask, rounds=12, interpret=True))
    lab_x = np.asarray(labeling.connected_components(mask, iters=16))
    assert _canon(lab_p, m) == _canon(lab_x, m)


def test_connected_components_empty_mask():
    mask = jnp.zeros((96, 128), bool)
    lab = np.asarray(connected_components(mask, rounds=6, interpret=True))
    assert (lab == 96 * 128).all()
