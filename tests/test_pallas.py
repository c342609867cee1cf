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

    b, hm, vm, j, jcnt, jp = preprocess_binarize(g, interpret=True)
    b = np.asarray(b) > 0.5
    hm = np.asarray(hm) > 0.5
    vm = np.asarray(vm) > 0.5
    m = 24
    assert (b[m:-m, m:-m] == bin_ref[m:-m, m:-m]).mean() == 1.0
    assert (hm[m:-m, m:-m] == h_ref[m:-m, m:-m]).mean() > 0.995
    assert (vm[m:-m, m:-m] == v_ref[m:-m, m:-m]).mean() > 0.995
    # joints exist at the 4 crossings
    assert (np.asarray(j) > 0.5).sum() >= 4
    # Shared MXU statistic images: no saturation in this image; brightness
    # images track the local mean (lines brighter than background); the
    # in-kernel joint count/peak + MXU box centroids reproduce the XLA
    # _joint_centroids fallback exactly (integer arithmetic on every path).
    from cylinder_pose_estimation_tpu.config import CylinderDetectConfig
    from cylinder_pose_estimation_tpu.models.detector import (
        _joint_centroids,
        _joint_peaks,
        _stats_images,
    )
    from cylinder_pose_estimation_tpu.ops.image import box_filter

    from dataclasses import replace as _replace

    # bright_at_points=False: this block checks the full-image statistic
    # form (the per-point form is pinned against it in test_mxu_conv).
    cfg = _replace(CylinderDetectConfig(), bright_at_points=False)
    joints = jnp.asarray(np.asarray(j) > 0.5)
    sat, bc, bi, jcx, jcy = _stats_images(
        g, joints.astype(jnp.float32), jcnt, cfg
    )
    assert np.asarray(sat).sum() == 0
    bc = np.asarray(bc)
    assert bc[37, 100] > bc[20, 50] + 30.0
    bi = np.asarray(bi)
    assert bi[37, 100] > bi[20, 50] + 20.0
    # Kernel joint_cnt == XLA box_filter count (exact integers).
    cnt_ref = np.asarray(
        box_filter(joints.astype(jnp.float32), 11, mode="constant",
                   normalize=False)
    )
    assert np.array_equal(np.asarray(jcnt), cnt_ref)
    # Kernel peak == XLA peak propagation.
    pk_ref = np.asarray(_joint_peaks(joints, jnp.asarray(cnt_ref)))
    assert np.array_equal(np.asarray(jp) > 0.5, pk_ref)
    c_x, v_x = _joint_centroids(joints, cfg)
    c_p, v_p = _joint_centroids(joints, cfg, precomputed=(jp, jcx, jcy))
    assert np.array_equal(np.asarray(v_x), np.asarray(v_p))
    assert np.array_equal(np.asarray(c_x), np.asarray(c_p))


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


def test_connected_components_cross_cap_converges():
    """Orientation-aware scan caps (cap_axis/cap) slow convergence but must
    reach the same fixed point: wavy lines and a blob THICKER than the cap
    label identically to the XLA ground truth given enough rounds.  (The
    config default keeps the cap OFF: at the shipped rounds=3 a TPU-measured
    tilted scene re-labels -- see config.pallas_cc_cross_cap.)"""
    m = np.zeros((96, 256), bool)
    xs = np.arange(10, 246)
    for yc in (24, 44):
        ys = (yc + 6 * np.sin(xs / 45.0)).astype(int)
        for x, y in zip(xs, ys):
            m[y, x] = True
            m[y + 1, x] = True
    m[60:84, 200:230] = True  # 24-px-thick isolated blob > cap 16
    mask = jnp.asarray(m)
    gt = np.asarray(labeling.connected_components(mask, iters=32))
    lab = np.asarray(
        connected_components(
            mask, rounds=24, pools_per_round=2, cap_axis=0, cap=16,
            interpret=True,
        )
    )
    assert _canon(lab, m) == _canon(gt, m)


def test_lowres_roi_blob_converges_at_default_rounds():
    """The quarter-res ROI blob of a TILTED sparse grid converges at the
    shipped lowres_cc_rounds default, measured on the artifact the detector
    actually consumes (largest component + orthoconvex fill).

    Round-2 regression: lowres_cc_rounds=1 was tuned on the 16 mild bench
    scenes and silently under-converged on tilted/sparse scenes (a 64-scene
    randomized TPU sweep showed 21 scenes with fragmented ROI labels ->
    shrunken ROI -> dropped centroids -> ok=False).  Each pool+scan round
    crosses one straight segment, so the comb-shaped blob a tilted grid
    leaves after the 9x9 seed dilation needs 2 rounds."""
    from cylinder_pose_estimation_tpu.config import CylinderDetectConfig

    m = np.zeros((64, 128), bool)
    tilt = 0.2
    for k in range(6):  # tilted "horizontal" grid lines at quarter-res pitch
        for x in range(10, 110):
            y = int(14 + k * 7 + tilt * (x - 60))
            if 1 <= y < 63:
                m[y, x] = True
    for k in range(8):  # tilted "vertical" lines, sparse (comb teeth)
        for y in range(10, 55):
            x = int(16 + k * 12 - tilt * (y - 32))
            if 1 <= x < 127:
                m[y, x] = True
    seed = np.asarray(morphology.dilate_rect(jnp.asarray(m), 9, 9))
    ring = np.zeros_like(seed)
    ring[1:-1, 1:-1] = True  # detector zeroes the 1-px ring on both paths
    seed = seed & ring

    def roi_blob(lab):
        return np.asarray(
            labeling.fill_orthoconvex(
                labeling.largest_component_mask(lab, k=128) & jnp.asarray(seed)
            )
        )

    ref = roi_blob(labeling.connected_components(jnp.asarray(seed), iters=16))
    rounds = CylinderDetectConfig().lowres_cc_rounds
    got = roi_blob(
        connected_components(jnp.asarray(seed), rounds=rounds, interpret=True)
    )
    assert (got == ref).all()
    # The comb genuinely needs >1 round: rounds=1 must NOT converge (if a
    # future pools_per_round bump makes it converge, sparsen the comb
    # rather than deleting this guard -- it documents why the default is 2).
    frag = roi_blob(
        connected_components(jnp.asarray(seed), rounds=1, interpret=True)
    )
    assert frag.sum() < 0.5 * ref.sum()


def test_connected_components_empty_mask():
    mask = jnp.zeros((96, 128), bool)
    lab = np.asarray(connected_components(mask, rounds=6, interpret=True))
    assert (lab == 96 * 128).all()


def test_connected_components_batched():
    """(B, H, W) masks label in one grid launch, per-image linear labels."""
    m = np.zeros((2, 96, 128), bool)
    m[0, 30:33, 20:110] = True
    m[0, 25:70, 40:42] = True
    m[1, 60:62, 10:80] = True
    m[1, 20:24, 100:104] = True
    lab = np.asarray(
        connected_components(jnp.asarray(m), rounds=8, interpret=True)
    )
    for b in range(2):
        ref = np.asarray(
            labeling.connected_components(jnp.asarray(m[b]), iters=16)
        )
        assert _canon(lab[b], m[b]) == _canon(ref, m[b])


def test_connected_components_warm_start():
    """init_labels from a SUBSET mask (pre-bridge fragments) must converge to
    the identical fixpoint as a cold start -- the contract behind
    cfg.cc_warm_start (bridging only ADDS pixels, see detector._bridge_pair)."""
    rng = np.random.default_rng(3)
    m = np.zeros((96, 128), bool)
    for _ in range(14):
        y, x = rng.integers(4, 88), rng.integers(4, 120)
        ln = int(rng.integers(5, 25))
        if rng.random() < 0.5:
            m[y : y + 2, x : min(x + ln, 126)] = True
        else:
            m[y : min(y + ln, 94), x : x + 2] = True
    sub = m.copy()
    sub[::4, :] = False  # punch gaps: the "pre-bridge" fragment mask
    # Partially-converged warm labels (1 round), as the bridge stage provides.
    warm = connected_components(jnp.asarray(sub), rounds=1, interpret=True)
    cold = np.asarray(
        connected_components(jnp.asarray(m), rounds=10, interpret=True)
    )
    got = np.asarray(
        connected_components(
            jnp.asarray(m), rounds=10, interpret=True, init_labels=warm
        )
    )
    assert (got == cold).all()
    # Warm-starting from the converged labels of the SAME mask is idempotent
    # at a single round.
    again = np.asarray(
        connected_components(
            jnp.asarray(m), rounds=1, interpret=True,
            init_labels=jnp.asarray(cold),
        )
    )
    assert (again == cold).all()


def test_warm_start_converges_at_shipped_defaults():
    """Regression gate for the SHIPPED warm-start round counts: the detector
    runs prebridge CC at pallas_cc_rounds_prebridge=2 and the final labels CC
    at pallas_cc_rounds_warm=2, pools=2 (config.py defaults).  On bridged
    near-axis line masks the warm rounds must reach the cold fixpoint.
    (Round 4 raised warm 1 -> 2: a bridged join that jogs a row/column needs
    a second scan direction to carry the label through -- warm1 left a
    reconnected vertical line split in two labels on the rendered line-gap
    scene; this synthetic mask converges even at warm1, which is exactly why
    it alone was an insufficient gate.)  Steep-diagonal staircases do NOT
    converge at these counts -- that is the documented instability (NEXT.md
    job 019) handled by the labels_converged flag, not by this gate."""
    from cylinder_pose_estimation_tpu.config import CylinderDetectConfig

    cfg = CylinderDetectConfig()
    assert cfg.pallas_cc_rounds_prebridge == 2
    assert cfg.pallas_cc_rounds_warm == 2
    assert cfg.pallas_cc_pools == 2

    rng = np.random.default_rng(7)
    # Near-axis h/v line fragments with gaps (pre-bridge mask) ...
    frag = np.zeros((2, 96, 128), bool)
    for r, y in enumerate((18, 40, 62, 84)):
        tilt = (r % 2)  # 1-px stair over the run: near-axis, not staircase
        for x0 in range(8, 120, 18):
            x1 = min(x0 + 12, 126)
            frag[0, y + (x0 // 64) * tilt : y + 2 + (x0 // 64) * tilt,
                 x0:x1] = True
    for c, x in enumerate((20, 55, 90, 112)):
        for y0 in range(6, 88, 16):
            y1 = min(y0 + 11, 94)
            frag[1, y0:y1, x : x + 2] = True
    # ... and the bridged mask: short along-line joins ONLY (bridging is
    # monotone -- it only ADDS pixels, detector._bridge_pair contract).
    bridged = frag.copy()
    for r, y in enumerate((18, 40, 62, 84)):
        bridged[0, y : y + 2, 8:126] = True
    for c, x in enumerate((20, 55, 90, 112)):
        bridged[1, 6:94, x : x + 2] = True
    assert (bridged | frag == bridged).all()

    warm = connected_components(
        jnp.asarray(frag),
        rounds=cfg.pallas_cc_rounds_prebridge,
        pools_per_round=cfg.pallas_cc_pools,
        interpret=True,
    )
    got = np.asarray(
        connected_components(
            jnp.asarray(bridged),
            rounds=cfg.pallas_cc_rounds_warm,
            pools_per_round=cfg.pallas_cc_pools,
            interpret=True,
            init_labels=warm,
        )
    )
    cold = np.asarray(
        connected_components(jnp.asarray(bridged), rounds=10, interpret=True)
    )
    assert (got == cold).all()


def test_bridge_morphology_matches_xla_chain():
    """The fused VMEM bridge kernel must reproduce the XLA traced-shift chain
    (directional_count -> dilate_line -> dilate_rect -> erode combine) that
    models/detector._bridge runs, for both grid programs of an h/v pair."""
    from cylinder_pose_estimation_tpu.ops.pallas.frontend import (
        bridge_morphology,
    )

    rng = np.random.default_rng(1)
    mask = np.zeros((96, 128), bool)
    mask[40:42, 10:50] = True
    mask[40:42, 70:110] = True
    mask[15:17, 20:100] = True
    maskv = np.zeros((96, 128), bool)
    maskv[20:60, 30:32] = True
    maskv[65:90, 30:32] = True
    exp = np.ones((96, 128), bool)
    angles = jnp.asarray([0.07, np.pi / 2 - 0.03], jnp.float32)
    klen = jnp.asarray(57.0, jnp.float32)

    out_p = np.asarray(
        bridge_morphology(
            jnp.asarray(np.stack([mask, maskv]), jnp.float32),
            jnp.asarray(np.stack([exp, exp]), jnp.float32),
            angles,
            klen,
            probe_len=9,
            max_kernel=100,
            interpret=True,
        )
    ) > 0.5

    for b, m in enumerate([mask, maskv]):
        mj = jnp.asarray(m)
        a = angles[b]
        fwd = morphology.directional_count(mj, a, 9, +1)
        bwd = morphology.directional_count(mj, a, 9, -1)
        endpoints = mj & ((fwd <= 1.0) | (bwd <= 1.0))
        grown = morphology.dilate_line(endpoints, a, 100, klen)
        grown = morphology.dilate_rect(grown, 3, 3)
        ref = np.asarray(mj | (morphology.erode_rect(mj | grown, 3, 3) & grown))
        assert (out_p[b] == ref).all(), f"mask {b} mismatch"
    # sanity: the horizontal gap actually got bridged
    assert out_p[0][40:43, 55:65].any()


def test_component_payload_minmax_endpoints():
    """Per-component payload extremes pick true endpoints for curved lines.

    A U-shaped (near-horizontal) fragment's row-major extreme sits at its
    apex; the column-major payload order used by the bridge's endpoint stats
    must return the left/rightmost pixels instead."""
    from cylinder_pose_estimation_tpu.ops.pallas.frontend import (
        component_payload_minmax,
    )

    h, w = 96, 128
    m = np.zeros((h, w), bool)
    xs = np.arange(20, 100)
    # Shallow parabola (|slope| < 1 keeps one pixel per column 8-connected).
    ys = (60 - 0.008 * (xs - 60.0) ** 2).astype(int)  # opens downward
    m[ys, xs] = True
    m[ys + 1, xs] = True  # 2-px thick, like the real dilated line masks
    m[30:34, 110] = True  # a second, vertical fragment
    pay_cm = (
        np.arange(w, dtype=np.int32)[None, :] * h
        + np.arange(h, dtype=np.int32)[:, None]
    )
    pmin, pmax = component_payload_minmax(
        jnp.asarray(m), jnp.asarray(pay_cm), rounds=12, interpret=True
    )
    pmin, pmax = np.asarray(pmin), np.asarray(pmax)
    # Background: (H*W, -1) sentinels.
    assert (pmin[~m] == h * w).all() and (pmax[~m] == -1).all()
    # Curved fragment: endpoints are its leftmost/rightmost pixels.
    u = m.copy()
    u[:, 105:] = False
    uy, ux = np.nonzero(u)
    left = np.flatnonzero(ux == ux.min())
    right = np.flatnonzero(ux == ux.max())
    exp_min = (ux.min() * h + uy[left].min())
    exp_max = (ux.max() * h + uy[right].max())
    assert (pmin[u] == exp_min).all() and (pmax[u] == exp_max).all()


def test_endpoint_stats_matches_moment_stats():
    """Bridge gates/angles from endpoint payload-minmax agree with the
    moment-based component stats on straight and curved fragments."""
    from cylinder_pose_estimation_tpu.config import CylinderDetectConfig
    from cylinder_pose_estimation_tpu.models.detector import (
        _bridge_angle_exp_endpoint_pair,
        _bridge_angle_exp_pair,
    )
    from cylinder_pose_estimation_tpu.ops.pallas.frontend import (
        component_payload_minmax,
        connected_components,
    )

    cfg = CylinderDetectConfig(
        use_pallas=True, pallas_interpret=True, bridge_stats_quarter=False
    )
    h, w = 64, 128
    m = np.zeros((2, h, w), np.float32)
    m[0, 10, 10:100] = 1           # long horizontal
    m[0, 30, 20:45] = 1            # short
    xs = np.arange(50, 80)
    m[0, (40 + 0.01 * (xs - 65.0) ** 2).astype(int), xs] = 1  # curved short
    m[1, 5:60, 20] = 1             # long vertical
    m[1, 10:30, 60] = 1
    m[1, 35:55, 61] = 1
    small = jnp.asarray(m) > 0.5

    labels = connected_components(small, rounds=8, interpret=True)
    (ah, av), (eh, ev) = _bridge_angle_exp_pair(small, labels, cfg, scale=2)

    pay = jnp.stack(
        [
            jnp.arange(w, dtype=jnp.int32)[None, :] * h
            + jnp.arange(h, dtype=jnp.int32)[:, None],
            jnp.arange(h, dtype=jnp.int32)[:, None] * w
            + jnp.arange(w, dtype=jnp.int32)[None, :],
        ]
    )
    pmin, pmax = component_payload_minmax(small, pay, rounds=8, interpret=True)
    (ah2, av2), (eh2, ev2) = _bridge_angle_exp_endpoint_pair(
        jnp.asarray(m), pmin, pmax, cfg, scale=2
    )
    assert abs(float(ah) - float(ah2)) < 0.05
    assert abs(float(av) - float(av2)) < 0.05
    assert np.array_equal(np.asarray(eh), np.asarray(eh2))
    assert np.array_equal(np.asarray(ev), np.asarray(ev2))


def test_pallas_detect_small_scene_point_count():
    """Pin the Pallas-path detection count on a 240x320 scene.

    Guards perf knobs against small-image regressions: pre-bridge CC at
    1 round kept exact 480x640 bench parity yet silently lost 7/28 points
    here (under-converged labels flip the bridge's long-skip gate), which is
    why pallas_cc_rounds_prebridge defaults to 2."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from test_detector import _cylinder_image
    from cylinder_pose_estimation_tpu.config import CylinderDetectConfig
    from _util import run_detect

    scene, img = _cylinder_image()
    cfg = CylinderDetectConfig(use_pallas=True, pallas_interpret=True)
    res = run_detect(img, cfg)
    assert bool(res.ok)
    assert int(np.asarray(res.grid.valid).sum()) >= 28
