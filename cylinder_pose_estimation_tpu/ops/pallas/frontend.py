"""Pallas TPU kernels for the detection front-end hot ops.

The XLA expression of the preprocess/binarize + joint-extraction stages costs
tens of ms per frame: every elementwise/stencil pass round-trips HBM, and a
480x640 float image is only 1.2 MB -- it fits in VMEM ~13x over.  These
kernels keep the image resident in VMEM across ALL passes:

  * ``preprocess_binarize``: Gaussian 5x5 -> scipy-style Gaussian(sigma=3)
    -> np.gradient Hessian -> closed-form 2x2 eigen minima -> Sauvola
    (15x15 box mean/var) -> inverted binary -> 1x20 / 20x1 binary openings
    -> joints mask -> joint box-count + per-blob peak.  One kernel, one HBM
    read of the image.  (Replaces ref utils/util_cylinder.py:1734-1827
    load_and_preprocess_image + extract_joints.)  The dense statistic
    images (saturation, brightness, centroid moments) ride the MXU outside
    the kernel instead: models/detector._stats_images + ops/mxu_conv.
  * ``connected_components``: iterative 3x3 min-label propagation entirely in
    VMEM.  Per-iteration cost is so low on-chip that plain diameter-bounded
    pooling beats the clever-but-HBM-hungry segmented-scan formulation used
    on the XLA path (ops/labeling.py).

Stencil shifts use circular rolls (pltpu.roll) with a border-margin mask
applied at the end: the reference's own border behavior is already artifactual
(skimage constant-pad ridges), and every downstream consumer gates on the ROI.

Shapes must be TPU-tiled: H % 8 == 0, W % 128 == 0 (pad images beforehand).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as _np

from cylinder_pose_estimation_tpu.ops import labeling
from cylinder_pose_estimation_tpu.ops.mxu_conv import (
    gauss_taps_cv as _gauss_taps_cv,
    gauss_taps_scipy as _gauss_taps_scipy,
)


def _roll(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Static circular shift usable inside Pallas kernels.

    pltpu.roll requires a non-negative shift; normalize modulo the axis size.
    """
    shift = shift % x.shape[axis]
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis)


def _sep_conv_roll(x: jnp.ndarray, k: tuple, axis: int) -> jnp.ndarray:
    """1-D correlation along ``axis`` via static rolls (wrap borders).

    Symmetric taps (every Gaussian) pair the +-i shifts as k_i*(a+b): one
    multiply per tap pair instead of two, ~25% fewer VPU ops on the 25-tap
    sigma=3 kernel."""
    r = len(k) // 2
    out = k[r] * x
    symmetric = all(
        math.isclose(k[r - i], k[r + i], rel_tol=0.0, abs_tol=0.0)
        for i in range(1, r + 1)
    )
    for i in range(1, r + 1):
        a = _roll(x, i, axis)
        b = _roll(x, -i, axis)
        if symmetric:
            out = out + k[r - i] * (a + b)
        else:
            out = out + k[r - i] * a + k[r + i] * b
    return out


def _box_sum_roll(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Odd-size centered box sum along axis, by Hillis-Steele doubling.

    Builds forward window sums S_m[p] = sum_{i<m} x[p+i] by doubling
    (S_2m = S_m + roll(S_m, -m)), combines the binary decomposition of
    ``size``, then recenters: O(log size) roll+adds instead of size-1.
    Summation ORDER differs from a direct loop (f32 reassociation); every
    consumer is either exact integer counting (joint box count) or a
    threshold far from ties (Sauvola mean/var), and the A/B parity gate
    compares final grid points, which were verified exact on TPU."""
    assert size % 2 == 1
    # S[m] caches the forward window sums for power-of-two m.
    pows = {1: x}
    m = 1
    while m * 2 <= size:
        pows[m * 2] = pows[m] + _roll(pows[m], -m, axis)
        m *= 2
    out = None
    off = 0
    while size:
        p = 1 << (size.bit_length() - 1)
        part = pows[p] if off == 0 else _roll(pows[p], -off, axis)
        out = part if out is None else out + part
        off += p
        size -= p
    # Window [p, p+n) recentered so the sum is over [p-r, p+r].
    return _roll(out, off // 2, axis)


def _binary_erode_line(x: jnp.ndarray, length: int, axis: int) -> jnp.ndarray:
    """Binary (0/1 float) erosion with a length-tap line via min-doubling."""
    covered = 1
    out = x
    step = 1
    # erosion over a centered window of `length`: min over offsets
    # [-length//2, length - length//2 - 1]; build by doubling.
    target = length
    # min over [0, covered) extent in +axis direction, then recenter.
    while covered < target:
        take = min(covered, target - covered)
        out = jnp.minimum(out, _roll(out, -take, axis))
        covered += take
    # recenter to match reduce_window 'SAME' anchoring for even sizes:
    # window covers [p - (l-1)//2, p + l//2]
    return _roll(out, (target - 1) // 2, axis)


def _binary_dilate_line(x: jnp.ndarray, length: int, axis: int) -> jnp.ndarray:
    covered = 1
    out = x
    target = length
    while covered < target:
        take = min(covered, target - covered)
        out = jnp.maximum(out, _roll(out, -take, axis))
        covered += take
    return _roll(out, (target - 1) // 2, axis)


def _preprocess_kernel(
    gray_ref,
    binary_ref,
    h_ref,
    v_ref,
    joints_ref,
    joint_cnt_ref,
    joint_peak_ref,
    *,
    k5: tuple,
    k25: tuple,
    pre_smoothed: bool,
    sauvola_window: int,
    sauvola_k: float,
    sauvola_r: float,
    min_contrast: float,
    line_len: int,
    margin: int,
    joint_window: int,
    joint_peak_iters: int,
):
    g0 = gray_ref[:]
    h, w = g0.shape

    # Border margin ring (computed up front; applied to every mask output so
    # circular-roll wrap-around can never leak content across image edges).
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside_f = (
        jnp.where(rows >= margin, 1.0, 0.0)
        * jnp.where(rows < h - margin, 1.0, 0.0)
        * jnp.where(cols >= margin, 1.0, 0.0)
        * jnp.where(cols < w - margin, 1.0, 0.0)
    )

    # The saturation / brightness / centroid-moment statistics that earlier
    # revisions computed here as VPU roll chains now live OUTSIDE the kernel
    # as banded-matrix MXU matmuls shared by the Pallas and XLA detector
    # paths (models/detector._stats_images, ops/mxu_conv) -- ~124 VPU
    # shift+FMA passes replaced by a dozen MXU dots.  This kernel keeps only
    # the passes that are sequential/maskful (binarize chain, openings, joint
    # box-count + per-blob peak propagation, which feeds on the joint mask
    # produced two statements earlier and cannot leave VMEM for free).

    if pre_smoothed:
        # The caller already composed Gaussian(5x5 cv) o Gaussian(sigma=3)
        # as batched banded MXU matmuls (ops/mxu_conv, exact mode) -- the
        # VPU's biggest per-view roll chain moves to the matrix unit.
        s = g0
    else:
        # Gaussian 5x5 (cv2 sigma rule), separable.
        g = _sep_conv_roll(g0, k5, 1)
        g = _sep_conv_roll(g, k5, 0)

        # scipy Gaussian sigma=3 (radius 12 -> 25 taps).
        s = _sep_conv_roll(g, k25, 1)
        s = _sep_conv_roll(s, k25, 0)

    # np.gradient-style central differences (borders handled by margin mask).
    def ddy(x):
        return 0.5 * (_roll(x, -1, 0) - _roll(x, 1, 0))

    def ddx(x):
        return 0.5 * (_roll(x, -1, 1) - _roll(x, 1, 1))

    gr = ddy(s)
    gc = ddx(s)
    hrr = ddy(gr)
    hrc = ddx(gr)
    hcc = ddx(gc)

    half_tr = 0.5 * (hrr + hcc)
    half_diff = 0.5 * (hrr - hcc)
    root = jnp.sqrt(half_diff * half_diff + hrc * hrc)
    minima = half_tr - root

    # Sauvola threshold from 15x15 box mean/var.
    n_px = float(sauvola_window * sauvola_window)
    m1 = _box_sum_roll(minima, sauvola_window, 1)
    m1 = _box_sum_roll(m1, sauvola_window, 0) / n_px
    m2 = _box_sum_roll(minima * minima, sauvola_window, 1)
    m2 = _box_sum_roll(m2, sauvola_window, 0) / n_px
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    std = jnp.sqrt(var)
    thresh = m1 * (1.0 + sauvola_k * (std / sauvola_r - 1.0))

    # Mosaic dislikes i1 vector selects: carry masks as float 0/1 throughout.
    bf = jnp.where(minima > thresh, 0.0, 1.0)
    if min_contrast > 0.0:
        bf = bf * jnp.where(minima < -min_contrast, 1.0, 0.0)

    # Border margin: roll wrap + constant-pad reference artifacts both die here.
    bf = bf * inside_f

    # Morphological openings with 1x20 / 20x1 lines (erode then dilate).
    h_open = _binary_dilate_line(_binary_erode_line(bf, line_len, 1), line_len, 1)
    v_open = _binary_dilate_line(_binary_erode_line(bf, line_len, 0), line_len, 0)

    binary_ref[:] = bf
    h_ref[:] = h_open
    v_ref[:] = v_open
    joints = jnp.minimum(h_open, v_open)
    joints_ref[:] = joints

    # Joint-blob box count + per-blob peak, fused in-VMEM (the algorithm and
    # its exactness argument live in models/detector._joint_centroids; this
    # is the identical math).  Counts are integer-valued < 2^24, so f32
    # accumulation is exact and roll-order-independent; circular wrap is
    # harmless because the line masks carry a `margin`-wide zero band.  The
    # box first-moments (centroids) ride the MXU outside the kernel; the
    # peak propagation stays here because its 4*joint_peak_iters masked max
    # passes would each round-trip HBM as XLA ops (~0.7 ms/frame measured).
    cnt = _box_sum_roll(joints, joint_window, 1)
    cnt = _box_sum_roll(cnt, joint_window, 0)
    joint_cnt_ref[:] = cnt
    lin = rows * w + cols
    # Same count-dominant key packing as the XLA mirror (a fixed 19-bit
    # shift would alias lin into cnt for images > 524,288 px).
    key = cnt.astype(jnp.int32) * (
        1 << labeling.peak_key_shift(h, w, joint_window)
    ) + lin
    neg = jnp.iinfo(jnp.int32).min
    km = jnp.where(joints > 0.5, key, neg)
    for _ in range(joint_peak_iters):
        km = jnp.maximum(km, jnp.maximum(_roll(km, 1, 0), _roll(km, -1, 0)))
        km = jnp.maximum(km, jnp.maximum(_roll(km, 1, 1), _roll(km, -1, 1)))
        km = jnp.where(joints > 0.5, km, neg)
    joint_peak_ref[:] = jnp.where(km == key, 1.0, 0.0) * joints


@functools.partial(
    jax.jit,
    static_argnames=(
        "blur_ksize",
        "ridge_sigma",
        "sauvola_window",
        "sauvola_k",
        "sauvola_r",
        "min_contrast",
        "line_len",
        "margin",
        "joint_window",
        "joint_peak_iters",
        "pre_smoothed",
        "interpret",
    ),
)
def preprocess_binarize(
    gray: jnp.ndarray,
    blur_ksize: int = 5,
    ridge_sigma: float = 3.0,
    sauvola_window: int = 15,
    sauvola_k: float = 0.5,
    sauvola_r: float = 128.0,
    min_contrast: float = 0.05,
    line_len: int = 20,
    margin: int = 20,
    joint_window: int = 11,
    joint_peak_iters: int = 8,
    pre_smoothed: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused preprocess + binarize + openings + joints + joint peaks.

    gray: (H, W) float32, H % 8 == 0, W % 128 == 0.  With
    ``pre_smoothed=True`` the input is ALREADY the composed
    Gaussian(blur_ksize) o Gaussian(ridge_sigma) smoothing of the gray
    image (computed outside as banded MXU matmuls, ops/mxu_conv) and the
    kernel skips its in-VMEM roll-chain convolutions.
    Returns (binary, h_mask, v_mask, joints, joint_cnt, joint_peak): 0/1
    float masks, the joint-blob 11x11 box-count image, and the per-blob
    peak mask consumed by models/detector._joint_centroids.  The
    saturation / brightness / centroid-moment statistic images are NOT
    computed here anymore -- they are banded-matrix MXU matmuls
    (models/detector._stats_images) shared verbatim by the Pallas and XLA
    detector paths."""
    h, w = gray.shape
    kernel = functools.partial(
        _preprocess_kernel,
        k5=_gauss_taps_cv(blur_ksize),
        k25=_gauss_taps_scipy(ridge_sigma),
        pre_smoothed=pre_smoothed,
        sauvola_window=sauvola_window,
        sauvola_k=sauvola_k,
        sauvola_r=sauvola_r,
        min_contrast=min_contrast,
        line_len=line_len,
        margin=margin,
        joint_window=joint_window,
        joint_peak_iters=joint_peak_iters,
    )
    out_shape = [jax.ShapeDtypeStruct((h, w), jnp.float32)] * 6
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gray.astype(jnp.float32))
    return tuple(outs)


def _dshift(x: jnp.ndarray, dy, dx, fill: float = 0.0) -> jnp.ndarray:
    """Shift a 2D float array by *traced* integer offsets, filling vacated
    cells with ``fill`` (the in-kernel counterpart of morphology.shift2d).

    Positive dy shifts content down, positive dx right.  Uses the dynamic
    form of pltpu.roll (tpu.DynamicRotate) plus an iota wrap mask.
    """
    h, w = x.shape
    dy = jnp.asarray(dy, jnp.int32)
    dx = jnp.asarray(dx, jnp.int32)
    sy = jax.lax.rem(dy, h)
    sy = sy + jnp.where(sy < 0, h, 0)
    sx = jax.lax.rem(dx, w)
    sx = sx + jnp.where(sx < 0, w, 0)
    y = pltpu.roll(pltpu.roll(x, sy, 0), sx, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # Valid range is [max(dy, 0), h + min(dy, 0)); since for dy >= 0 the
    # upper bound never binds and for dy < 0 the lower bound never binds,
    # one AND expresses both cases -- avoiding an i1-vector select, which
    # Mosaic cannot legalize.
    row_ok = (rows >= dy) & (rows < h + dy)
    col_ok = (cols >= dx) & (cols < w + dx)
    return jnp.where(row_ok & col_ok, y, jnp.asarray(fill, x.dtype))


def _bridge_kernel(
    par_ref,
    mask_ref,
    exp_ref,
    out_ref,
    *,
    probe_len: int,
    max_kernel: int,
):
    """One bridge-morphology pass for one mask (grid program = one mask).

    VMEM-resident equivalent of the XLA traced-shift chain in
    models/detector._bridge (ref expands_line_roi utils/util_cylinder.py:
    137-237): directional endpoint probes -> oriented log-doubling line
    dilation of the endpoints -> 3x3 dilation -> 3x3 erosion combine.  The
    XLA version costs ~8 ms/frame in HBM round-trips; here every shift stays
    on-chip.

    Per-mask scalars (angle, kernel length) arrive in a per-program VMEM
    params tile rather than SMEM: SMEM block specs do not survive jax.vmap's
    pallas batching rule, and detect_grid is always vmapped over frames.
    """
    angle = par_ref[0, 0, 0]
    klen = par_ref[0, 0, 1]
    m = mask_ref[0]
    expf = exp_ref[0]
    ca = jnp.cos(angle)
    sa = jnp.sin(angle)

    # Endpoint detection: pixels whose forward or backward ray is empty
    # (<= 1 hit = just themselves at i=0 excluded; matches
    # morphology.directional_count + the <=1 gate in detector._bridge).
    # Hillis-Steele doubling over the ray, offset-for-offset identical to
    # morphology.directional_count (see the re-rasterization note there).
    def _ray_count(sgn):
        def d(k):
            dy = jnp.round(sa * k * sgn).astype(jnp.int32)
            dx = jnp.round(ca * k * sgn).astype(jnp.int32)
            return dy, dx

        dy1, dx1 = d(1)
        pows = {1: _dshift(m, -dy1, -dx1)}
        mm = 1
        while mm * 2 <= probe_len:
            dy, dx = d(mm)
            pows[2 * mm] = pows[mm] + _dshift(pows[mm], -dy, -dx)
            mm *= 2
        cnt = None
        off = 0
        size = probe_len
        while size:
            p = 1 << (size.bit_length() - 1)
            if off == 0:
                part = pows[p]
            else:
                dy, dx = d(off)
                part = _dshift(pows[p], -dy, -dx)
            cnt = part if cnt is None else cnt + part
            off += p
            size -= p
        return cnt

    fwd = _ray_count(1.0)
    bwd = _ray_count(-1.0)
    is_end = jnp.where((fwd <= 1.0) | (bwd <= 1.0), 1.0, 0.0)
    out = m * expf * is_end

    # Oriented line dilation, logarithmic doubling with a traced effective
    # length (mirrors morphology.dilate_line exactly).
    half = max(max_kernel // 2, 1)
    dyn_half = jnp.clip(klen / 2.0, 0.0, float(half))
    stride, covered = 1, 0
    dyn_covered = jnp.asarray(0.0, jnp.float32)
    while covered < half:
        step = min(stride, half - covered)
        eff = jnp.clip(dyn_half - dyn_covered, 0.0, float(step))
        dy = jnp.round(sa * eff).astype(jnp.int32)
        dx = jnp.round(ca * eff).astype(jnp.int32)
        out = jnp.maximum(
            out, jnp.maximum(_dshift(out, dy, dx), _dshift(out, -dy, -dx))
        )
        covered += step
        dyn_covered = dyn_covered + eff
        stride *= 2

    # grown = dilate_rect(out, 3, 3) (separable 3-tap max; border fill 0
    # matches reduce_window's -inf init on 0/1 masks).
    g1 = jnp.maximum(out, jnp.maximum(_dshift(out, 0, 1), _dshift(out, 0, -1)))
    grown = jnp.maximum(g1, jnp.maximum(_dshift(g1, 1, 0), _dshift(g1, -1, 0)))

    # out | (erode_rect(out | grown, 3, 3) & grown): erosion border fill 1.0
    # matches reduce_window's +inf init (out-of-image ignored).
    u = jnp.maximum(m, grown)
    e1 = jnp.minimum(
        u, jnp.minimum(_dshift(u, 0, 1, 1.0), _dshift(u, 0, -1, 1.0))
    )
    er = jnp.minimum(
        e1, jnp.minimum(_dshift(e1, 1, 0, 1.0), _dshift(e1, -1, 0, 1.0))
    )
    out_ref[0] = jnp.maximum(m, er * grown)


@functools.partial(
    jax.jit, static_argnames=("probe_len", "max_kernel", "interpret")
)
def bridge_morphology(
    masks: jnp.ndarray,
    exp_imgs: jnp.ndarray,
    angles: jnp.ndarray,
    kernel_len: jnp.ndarray,
    probe_len: int,
    max_kernel: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused bridge morphology over a batch of masks (one grid program each).

    masks, exp_imgs: (B, H, W) float 0/1; angles: (B,) radians; kernel_len:
    () traced effective line-kernel length (<= max_kernel).  Returns the
    bridged (B, H, W) float masks.  The h/v mask pair of one image runs as a
    B=2 call: one kernel launch instead of ~40 HBM-bound XLA ops per mask.
    """
    b, h, w = masks.shape
    # Pack per-mask scalars into an (b, 8, 128) VMEM tile (see kernel doc).
    par = (
        jnp.zeros((b, 8, 128), jnp.float32)
        .at[:, 0, 0].set(angles.astype(jnp.float32))
        .at[:, 0, 1].set(jnp.broadcast_to(kernel_len, (b,)).astype(jnp.float32))
    )
    out = pl.pallas_call(
        functools.partial(
            _bridge_kernel, probe_len=probe_len, max_kernel=max_kernel
        ),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        par,
        masks.astype(jnp.float32),
        exp_imgs.astype(jnp.float32),
    )
    return out


def _seg_min_scan_roll(lab, maskf, axis, n, cap: int = 0):
    """Segmented min-scan along ``axis`` via Hillis-Steele doubling.

    lab: int32 labels (BIG outside mask); maskf: float 0/1.  After the
    forward+backward pair, every pixel holds the min label of its contiguous
    in-mask run along the axis.  clear_k[p] tracks "window (p-2^k, p] fully
    in-mask"; out-of-run sources hold BIG so propagation stays run-local.
    Wrap-around is blocked by the mask's border margin.

    ``cap`` > 0 bounds the propagation distance (runs longer than cap still
    converge across rounds): line masks have cross-axis contiguous runs of
    only line-thickness px, so the perpendicular scan does not need the
    full log2(axis) doubling depth.
    """
    if cap > 0:
        n = min(n, cap)
    out = lab
    for direction in (1, -1):
        v = lab
        clear = maskf
        d = 1
        while d < n:
            vs = _roll(v, direction * d, axis)
            cs = _roll(clear, direction * d, axis)
            v = jnp.where(clear > 0.5, jnp.minimum(v, vs), v)
            clear = clear * cs
            d *= 2
        out = jnp.minimum(out, v)
    return out


def _cc_kernel(mask_ref, *rest, rounds: int, pools_per_round: int,
               cap_axis: int = -1, cap: int = 0, warm: bool = False):
    if warm:
        init_ref, labels_ref = rest
    else:
        (labels_ref,) = rest
        init_ref = None
    h, w = mask_ref.shape[-2:]
    maskf = mask_ref[0] if mask_ref.ndim == 3 else mask_ref[:]
    # Zero a 1-px border ring: rolls wrap circularly, and bridged masks
    # (dilate_line can grow endpoints ~100+ px, past the preprocess margin)
    # must never merge labels across opposite image edges.  One border row or
    # column of background fully blocks both the 3x3 pools and the segmented
    # scans (their in-mask window product hits the zero ring).
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ring = (
        jnp.where(rows >= 1, 1.0, 0.0)
        * jnp.where(rows < h - 1, 1.0, 0.0)
        * jnp.where(cols >= 1, 1.0, 0.0)
        * jnp.where(cols < w - 1, 1.0, 0.0)
    )
    maskf = maskf * ring
    mask = maskf > 0.5
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    big = jnp.asarray(h * w, jnp.int32)
    if init_ref is not None:
        # Warm start from a partially-converged label image (e.g. the
        # bridge's pre-bridge fragment labels): min-propagation's fixpoint
        # is the unique per-component min linear index, and any state where
        # every in-mask pixel holds the index OF SOME PIXEL IN ITS OWN
        # COMPONENT (own index for fresh pixels) converges to it.  Pixels
        # the warm labels never saw (values >= big, or mask pixels added
        # after the warm labeling) fall back to their own index.
        init = init_ref[0] if init_ref.ndim == 3 else init_ref[:]
        lab0 = jnp.where(mask, jnp.minimum(init, idx), big)
    else:
        lab0 = jnp.where(mask, idx, big)

    def pool(lab):
        m = lab
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1)):
            m = jnp.minimum(m, _roll(_roll(lab, dy, 0), dx, 1))
        return jnp.where(mask, m, big)

    def body(_, lab):
        for _ in range(pools_per_round):
            lab = pool(lab)
        # Full-run propagation along rows then columns: one round crosses an
        # entire straight segment, so convergence needs O(#bends) rounds
        # instead of O(diameter) pools.  A caller who knows the mask's
        # dominant orientation caps the PERPENDICULAR scan (cap_axis):
        # cross-axis contiguous runs of a line mask are line-thickness px,
        # so full doubling depth there is wasted passes.
        lab = jnp.where(
            mask,
            _seg_min_scan_roll(lab, maskf, 1, w, cap if cap_axis == 1 else 0),
            big,
        )
        lab = jnp.where(
            mask,
            _seg_min_scan_roll(lab, maskf, 0, h, cap if cap_axis == 0 else 0),
            big,
        )
        return lab

    lab = jax.lax.fori_loop(0, rounds, body, lab0)
    if labels_ref.ndim == 3:
        labels_ref[0] = lab
    else:
        labels_ref[:] = lab


def _seg_max_scan_roll(lab, maskf, axis, n):
    """_seg_min_scan_roll's max-semiring mirror: after the forward+backward
    pair every pixel holds the MAX value of its contiguous in-mask run along
    the axis (out-of-mask sources hold -1, the identity for non-negative
    linear indices)."""
    out = lab
    for direction in (1, -1):
        v = lab
        clear = maskf
        d = 1
        while d < n:
            vs = _roll(v, direction * d, axis)
            cs = _roll(clear, direction * d, axis)
            v = jnp.where(clear > 0.5, jnp.maximum(v, vs), v)
            clear = clear * cs
            d *= 2
        out = jnp.maximum(out, v)
    return out


def _cc_payload_minmax_kernel(mask_ref, payload_ref, pmin_ref, pmax_ref, *,
                              rounds: int, pools_per_round: int):
    """Per-component min/max of an arbitrary int32 PAYLOAD image, by the same
    pool + segmented-scan propagation as _cc_kernel.

    The bridge feeds a per-orientation scan order as payload (column-major
    for near-horizontal masks, row-major for near-vertical), so the min/max
    pixels are each fragment's true endpoints even for curved segments
    (row-major extremes of a curved row sit at its apex, not its ends).
    From the endpoint pair the bridge derives per-component angle/extent
    with NO (H*W, K) one-hot reductions (models/detector.
    _bridge_angle_exp_endpoint_pair); the payload-min pixel doubles as a
    unique component root.  Background pixels return BIG / -1."""
    h, w = mask_ref.shape[-2:]
    maskf = mask_ref[0] if mask_ref.ndim == 3 else mask_ref[:]
    pay = payload_ref[0] if payload_ref.ndim == 3 else payload_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # Same 1-px anti-wrap border ring as _cc_kernel.
    ring = (
        jnp.where(rows >= 1, 1.0, 0.0)
        * jnp.where(rows < h - 1, 1.0, 0.0)
        * jnp.where(cols >= 1, 1.0, 0.0)
        * jnp.where(cols < w - 1, 1.0, 0.0)
    )
    maskf = maskf * ring
    mask = maskf > 0.5
    big = jnp.asarray(h * w, jnp.int32)
    lo0 = jnp.where(mask, pay, big)
    hi0 = jnp.where(mask, pay, -1)

    def pool(lo, hi):
        mn, mx = lo, hi
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1)):
            mn = jnp.minimum(mn, _roll(_roll(lo, dy, 0), dx, 1))
            mx = jnp.maximum(mx, _roll(_roll(hi, dy, 0), dx, 1))
        return jnp.where(mask, mn, big), jnp.where(mask, mx, -1)

    def body(_, lohi):
        lo, hi = lohi
        for _ in range(pools_per_round):
            lo, hi = pool(lo, hi)
        lo = jnp.where(mask, _seg_min_scan_roll(lo, maskf, 1, w), big)
        lo = jnp.where(mask, _seg_min_scan_roll(lo, maskf, 0, h), big)
        hi = jnp.where(mask, _seg_max_scan_roll(hi, maskf, 1, w), -1)
        hi = jnp.where(mask, _seg_max_scan_roll(hi, maskf, 0, h), -1)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo0, hi0))
    if pmin_ref.ndim == 3:
        pmin_ref[0] = lo
        pmax_ref[0] = hi
    else:
        pmin_ref[:] = lo
        pmax_ref[:] = hi


@functools.partial(
    jax.jit, static_argnames=("rounds", "pools_per_round", "interpret")
)
def component_payload_minmax(
    mask: jnp.ndarray,
    payload: jnp.ndarray,
    rounds: int = 10,
    pools_per_round: int = 4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel min and max of ``payload`` over the pixel's 8-connected
    component (same convergence schedule as connected_components; both
    channels ride one kernel).  Returns (pmin, pmax); background pixels hold
    (H*W, -1).  payload must be non-negative int32 < H*W."""
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
        payload = payload[None]
    b, h, w = mask.shape
    lo, hi = pl.pallas_call(
        functools.partial(
            _cc_payload_minmax_kernel, rounds=rounds,
            pools_per_round=pools_per_round,
        ),
        grid=(b,),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mask.astype(jnp.float32), payload.astype(jnp.int32))
    if squeeze:
        return lo[0], hi[0]
    return lo, hi


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "rounds", "pools_per_round", "cap_axis", "cap", "interpret",
    ),
)
def connected_components(
    mask: jnp.ndarray,
    iters: int | None = None,
    rounds: int = 10,
    pools_per_round: int = 4,
    cap_axis: int = -1,
    cap: int = 0,
    interpret: bool = False,
    init_labels: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """VMEM-resident 8-connected labeling: pools + segmented doubling scans.

    Each round runs ``pools_per_round`` 3x3 min-pools (local/diagonal hops)
    followed by full row and column segmented min-scans (log-doubling, so a
    whole straight run propagates per round).  Convergence therefore needs
    O(direction changes) rounds -- ~10 covers the laser-grid geometry.

    ``iters`` (legacy pool-count budget) maps to rounds = iters / 48, at
    least 6.  A 1-px background ring is forced inside the kernel so circular
    rolls can never merge labels across opposite image edges.

    ``cap_axis``/``cap``: bound the scan distance along ``cap_axis`` to
    ``cap`` px per round -- for masks with a known dominant orientation
    (line masks), where cross-axis contiguous runs are line-thickness px.
    Components with thicker cross-axis runs still converge, just needing
    more rounds (each round advances cap + pools_per_round px cross-axis).

    mask may be (H, W) or (B, H, W); the batched form labels each image in
    its own grid program (labels are per-image linear indices), one kernel
    launch for e.g. the h/v line-mask pair.

    ``init_labels`` (same shape as mask, int32): warm-start label image --
    e.g. fragment labels computed BEFORE a morphology pass that only ADDS
    mask pixels.  Every in-mask value must be the linear index of a pixel
    in the same component (background / unseen pixels may hold anything
    >= H*W; fresh mask pixels fall back to their own index).  The fixpoint
    is identical to a cold start (per-component min index), but convergence
    only has to cross the newly added pixels, so far fewer rounds suffice.
    """
    if iters is not None:
        rounds = max(6, iters // 48)
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
        if init_labels is not None:
            init_labels = init_labels[None]
    b, h, w = mask.shape
    blk = lambda i: (i, 0, 0)  # noqa: E731
    spec = pl.BlockSpec((1, h, w), blk, memory_space=pltpu.VMEM)
    args = [mask.astype(jnp.float32)]
    in_specs = [spec]
    if init_labels is not None:
        args.append(init_labels.astype(jnp.int32))
        in_specs.append(spec)
    out = pl.pallas_call(
        functools.partial(
            _cc_kernel, rounds=rounds, pools_per_round=pools_per_round,
            cap_axis=cap_axis, cap=cap, warm=init_labels is not None,
        ),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        in_specs=in_specs,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[0] if squeeze else out
