"""Detection hardening: label-capacity overflow, short-column merge, clutter
ROI, low-contrast equalization, and patch consensus across missing rows.

These are the real-image failure modes VERDICT round 1 flagged: each test
renders a scene that breaks the naive behavior and asserts the hardened path
survives (ref anchors cited per test).
"""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.config import (
    CylinderDetectConfig,
    PlaneDetectConfig,
)
from cylinder_pose_estimation_tpu.models.detector import (
    _assign_labels,
    _merge_short_column_leaders,
)
from tests._util import run_detect as detect_grid
from cylinder_pose_estimation_tpu.utils.synthetic import (
    cylinder_grid_points,
    default_stereo,
    plane_grid_points,
    render_grid_image,
)

H, W = 240, 320


def _small_stereo():
    return default_stereo(cx=W / 2.0, cy=H / 2.0)


# ---------------------------------------------------------------------------
# _assign_labels: slot retention must be by member count, not scan order
# ---------------------------------------------------------------------------


def test_assign_labels_overflow_keeps_largest():
    """With more components than capacity, the slots must keep the components
    with the most centroids (true grid lines), not the first in scan order
    (which would favor top-left clutter specks)."""
    h, w = 32, 64
    n_strips = 10
    label_img = np.full((h, w), h * w, np.int32)
    cents, big_strip = [], set()
    for i in range(n_strips):
        x0 = i * 6
        root = 0 * w + x0  # root = linear index of the strip's first pixel
        label_img[:, x0 : x0 + 4] = root
        n_c = 6 if i >= 8 else 1  # strips 8, 9 carry 6 centroids; others 1
        if n_c > 1:
            big_strip.add(i)
        for j in range(n_c):
            cents.append((x0 + 1, 3 + 2 * j, i))
    xy = jnp.asarray([[c[0], c[1]] for c in cents], jnp.float32)
    valid = jnp.ones((len(cents),), bool)

    slot_of, ok, slot_valid = _assign_labels(
        jnp.asarray(label_img), xy, valid, capacity=4
    )
    ok = np.asarray(ok)
    slot_of = np.asarray(slot_of)
    # Every centroid of the two 6-member strips must keep a slot.
    for k, (_, _, strip) in enumerate(cents):
        if strip in big_strip:
            assert ok[k], f"centroid of large strip {strip} was evicted"
    # The two big strips occupy exactly two distinct slots.
    big_slots = {slot_of[k] for k, c in enumerate(cents) if c[2] in big_strip}
    assert len(big_slots) == 2
    assert int(np.asarray(slot_valid).sum()) == 4


# ---------------------------------------------------------------------------
# short-column merge (ref utils/util_plane.py:449-557)
# ---------------------------------------------------------------------------


def _greedy_reference(span, mean_x, valid):
    """Literal port of the reference's greedy grouping (ref :449-557):
    walk columns in x order; consecutive abnormal columns merge while the
    cumulative span stays <= the max span; normal columns close the group."""
    order = [i for i in np.argsort(np.where(valid, mean_x, np.inf)) if valid[i]]
    thr = max((span[i] for i in order), default=0.0)
    leader = list(range(len(span)))
    cur, cum = None, 0.0
    for i in order:
        if span[i] <= 0.9 * thr:
            if cur is not None and cum + span[i] <= thr:
                leader[i] = cur
                cum += span[i]
            else:
                cur, cum = i, span[i]
        else:
            cur, cum = None, 0.0
    return leader


def test_merge_short_column_leaders_matches_greedy():
    rng = np.random.default_rng(0)
    for trial in range(20):
        cap = 12
        valid = rng.random(cap) > 0.3
        span = np.where(valid, rng.uniform(20.0, 200.0, cap), 0.0)
        mean_x = rng.uniform(0.0, 300.0, cap)
        got = np.asarray(
            _merge_short_column_leaders(
                jnp.asarray(span, jnp.float32),
                jnp.asarray(mean_x, jnp.float32),
                jnp.asarray(valid),
                cap,
            )
        )
        want = _greedy_reference(span, mean_x, valid)
        for i in range(cap):
            if valid[i]:
                assert got[i] == want[i], (
                    f"trial {trial} slot {i}: got {got[i]} want {want[i]}\n"
                    f"span={span}\nmean_x={mean_x}\nvalid={valid}"
                )


def _plane_scene_and_image(n_rows=7, n_cols=7):
    stereo = _small_stereo()
    scene = plane_grid_points(
        stereo, origin=(0.0, 0.0, 700.0), n_rows=n_rows, n_cols=n_cols,
        spacing=23.5, capacity=128,
    )
    img = render_grid_image(
        scene.gp1.xy, scene.gp1.valid, n_rows, n_cols, H, W
    ).astype(jnp.float32)
    return scene, img


def test_plane_fragmented_column_merges_to_single_index():
    """A column broken into two fragments (bridging disabled) must yield the
    same single column index as the unbroken image via the short-column merge
    (ref utils/util_plane.py:449-557, on the main plane path via :2828)."""
    n_rows = n_cols = 7
    scene, img = _plane_scene_and_image(n_rows, n_cols)
    # Erase a band across column j between rows r and r+1 (only the column
    # curve passes there), splitting its line mask into two components.
    j, r = 2, 3
    pts = np.asarray(scene.gp1.xy)[: n_rows * n_cols].reshape(n_rows, n_cols, 2)
    mid = 0.5 * (pts[r, j] + pts[r + 1, j])
    x0, y0 = int(mid[0]), int(mid[1])
    broken = np.asarray(img).copy()
    # The vertical opening's dilation re-grows the line ~6 px into the erased
    # band from each side, and half-res labeling (label_downsample=2) fuses
    # residual gaps <= 2 px; a 20 px band leaves an ~8 px gap that stays a
    # genuine fragmentation at every labeling resolution.
    broken[y0 - 10 : y0 + 10, x0 - 5 : x0 + 5] = 18.0
    broken = jnp.asarray(broken)

    base = PlaneDetectConfig(
        height=H, width=W, roi_threshold=30.0, bridge_repeats=0
    )
    gt = {
        tuple(np.asarray(scene.gp1.idx)[i]): np.asarray(scene.gp1.xy)[i]
        for i in range(n_rows * n_cols)
    }

    def detect_ids(image, cfg):
        res = detect_grid(image, cfg)
        v = np.asarray(res.grid.valid)
        ids = np.asarray(res.grid.idx)[v]
        return {tuple(i) for i in ids}, res

    ids_merge, res_merge = detect_ids(broken, base)
    assert bool(res_merge.ok)
    # All ids must be ground-truth grid ids: the fragments were re-merged so
    # no spurious extra column shifted the integer indices.
    assert ids_merge <= set(gt.keys()), sorted(ids_merge - set(gt.keys()))
    assert len(ids_merge) >= 30

    # Sanity: without the merge the fragments create an extra column whose
    # rank shifts every index to its right -- ids leave the ground truth set.
    no_merge = dataclasses.replace(base, merge_short_cols=False)
    ids_plain, _ = detect_ids(broken, no_merge)
    assert not (ids_plain <= set(gt.keys())), (
        "test is vacuous: fragmentation did not corrupt indices"
    )


# ---------------------------------------------------------------------------
# clutter ROI (redesigned stand-in for ref utils/util_cylinder.py:1830-1899)
# ---------------------------------------------------------------------------


def test_cylinder_roi_rejects_background_clutter():
    """Background laser-like clutter far from the cylinder must not hijack
    the line-density ROI: detection still recovers only true grid ids."""
    stereo = _small_stereo()
    n = 9
    scene = cylinder_grid_points(
        stereo, capacity=128, n_rows=n, n_cols=n,
        origin=(10.0, -15.0, 560.0), radius=52.0, row_spacing=12.0,
        theta_span=2.2,
    )
    img = render_grid_image(
        scene.gp1.xy, scene.gp1.valid, n, n, H, W
    ).astype(jnp.float32)
    # Clutter: a small bright 2x2 mini-grid in the top-left corner (crossing
    # segments => it even produces joints), well outside the grid region.
    corner = jnp.asarray(
        [[8.0, 8.0], [50.0, 10.0], [10.0, 36.0], [52.0, 38.0]], jnp.float32
    )
    clutter = render_grid_image(
        corner, jnp.ones((4,), bool), 2, 2, H, W, background=0.0,
        center_gain=0.0,
    ).astype(jnp.float32)
    noisy = jnp.maximum(img, clutter)

    cfg = CylinderDetectConfig(height=H, width=W)
    res = detect_grid(noisy, cfg)
    assert bool(res.ok)
    v = np.asarray(res.grid.valid)
    ids = np.asarray(res.grid.idx)[v]
    xy = np.asarray(res.grid.xy)[v]
    gt = {
        tuple(np.asarray(scene.gp1.idx)[i]): np.asarray(scene.gp1.xy)[i]
        for i in range(n * n)
    }
    assert len(ids) >= 20
    errs = []
    for i in range(len(ids)):
        key = tuple(ids[i])
        assert key in gt, f"clutter produced spurious grid id {key}"
        errs.append(np.linalg.norm(xy[i] - gt[key]))
    assert np.median(errs) < 2.0


# ---------------------------------------------------------------------------
# CLAHE wiring (ref utils/preProcessing.m:17-18 adapthisteq)
# ---------------------------------------------------------------------------


def test_low_contrast_needs_equalization():
    """Low-contrast imagery (intensities squashed into [10, 60]) breaks the
    plane ROI threshold without equalization; the wired preprocess_stereo
    (undistort + adapthisteq) recovers it (ref utils/preProcessing.m:4-21)."""
    from cylinder_pose_estimation_tpu.ops.clahe import preprocess_stereo

    stereo = _small_stereo()
    n = 7
    scene = plane_grid_points(
        stereo, origin=(0.0, 0.0, 700.0), n_rows=n, n_cols=n,
        spacing=23.5, capacity=128,
    )

    def squash(xy):
        img = render_grid_image(xy, scene.gp1.valid, n, n, H, W).astype(
            jnp.float32
        )
        return 10.0 + img * (50.0 / 255.0)  # [10, 60]

    img1 = squash(scene.gp1.xy)
    img2 = squash(scene.gp2.xy)
    cfg = PlaneDetectConfig(height=H, width=W)  # default threshold 127

    res_raw = detect_grid(img1, cfg)
    assert not bool(res_raw.ok), "low-contrast image unexpectedly detected"

    # clip_limit 0.5 = strong equalization for severely under-exposed imagery
    # (MATLAB's default 0.01 redistributes so much clipped mass that the LUT
    # is nearly identity -- it cannot lift [10, 60] pixels past the ROI's
    # absolute 127 threshold; the clip limit is a config knob).
    eq1, eq2 = preprocess_stereo(
        img1, img2, stereo.cam1, stereo.cam2, clip_limit=0.5
    )
    res_eq = detect_grid(eq1, cfg)
    assert bool(res_eq.ok)
    assert int(np.asarray(res_eq.grid.valid).sum()) >= 25


# ---------------------------------------------------------------------------
# choose_idx across a wholly-missing grid row (ref utils/chooseIdx.m:23-35)
# ---------------------------------------------------------------------------


def test_choose_idx_bridges_missing_row():
    """The reference slides patches over unique *present* index values, so a
    fully missing grid row must not break patch consensus.  With 4 rows and
    row y=1 removed, contiguous rasters have no complete 3x3 window (fallback
    fires); the compacted raster keeps consensus alive."""
    from cylinder_pose_estimation_tpu.geometry.correspond import choose_idx

    stereo = _small_stereo()
    scene = cylinder_grid_points(
        stereo, capacity=64, n_rows=4, n_cols=5,
        origin=(0.0, -20.0, 560.0), radius=52.0, row_spacing=13.0,
        theta_span=1.8,
    )

    # Drop the second-smallest row index so the remaining three rows are
    # non-contiguous ({min, min+2, min+3}): no contiguous 3x3 raster window
    # exists, only the compacted one.
    rows_present = sorted(
        set(np.asarray(scene.gp1.idx)[np.asarray(scene.gp1.valid)][:, 1].tolist())
    )
    gap_row = rows_present[1]

    def drop_row(gp, row):
        keep = ~(gp.valid & (gp.idx[:, 1] == row))
        return gp._replace(valid=gp.valid & keep)

    gp1 = drop_row(scene.gp1, gap_row)
    gp2 = drop_row(scene.gp2, gap_row)
    corr = choose_idx(gp1, gp2, stereo, patch_size=3, error_threshold=0.5,
                      extent=16)
    assert not bool(corr.used_fallback), (
        "patch consensus fell back: missing row was not bridged"
    )
    sel_rows = set(np.asarray(corr.idx)[np.asarray(corr.valid)][:, 1].tolist())
    assert sel_rows == set(rows_present) - {gap_row}


# ---------------------------------------------------------------------------
# Quarter-res bridge stats must still FIND components (regression: the
# min-pooled label values are half-res linear indices, so the plain
# root-by-position test silently matched nothing and bridging no-op'd)
# ---------------------------------------------------------------------------


def test_component_stats_value_shape_finds_pooled_roots():
    import jax

    from cylinder_pose_estimation_tpu.ops import labeling

    rng = np.random.default_rng(3)
    m = np.zeros((64, 128), bool)
    m[10, 8:60] = True          # horizontal segment
    m[30:55, 40] = True         # vertical segment
    m[50, 90:120] = True
    labels = labeling.connected_components(jnp.asarray(m), iters=16)
    pooled = -jax.lax.reduce_window(
        -labels, -jnp.int32(64 * 128), jax.lax.max, (2, 2), (2, 2), "VALID"
    )
    stats = labeling.component_stats_first_k(
        pooled, k=8, min_area=1, compute_bbox=False, value_shape=(64, 128)
    )
    # all three components found, roots = the half-res root values
    roots_true = sorted(
        int(v) for v in np.unique(np.asarray(labels)[m])
    )
    roots_got = sorted(
        int(r) for r, v in zip(np.asarray(stats.root), np.asarray(stats.valid)) if v
    )
    assert roots_got == roots_true
    # counts approximate area / 4 (pooled blocks)
    cnt = np.asarray(stats.count)[np.asarray(stats.valid)]
    assert (cnt >= 1).all()


def test_bridge_closes_gap_with_default_config():
    """A broken grid line must be bridged under the SHIPPED defaults
    (bridge_stats_quarter=True) on the XLA path -- regression for the
    quarter-res root bug that made bridging a silent no-op
    (ref expands_line_roi utils/util_cylinder.py:137-237)."""
    from cylinder_pose_estimation_tpu.models.detector import _bridge

    from cylinder_pose_estimation_tpu.models.detector import _bridge_pair

    cfg = CylinderDetectConfig(height=H, width=W)
    assert cfg.bridge_stats_quarter  # the shipped default under test
    m = np.zeros((H, W), bool)
    m[60, 40:280] = True     # long unbroken line (sets max extent)
    m[61, 40:280] = True
    m[120, 40:140] = True    # broken line: two short fragments, 20 px gap
    m[121, 40:140] = True
    m[120, 160:280] = True
    m[121, 160:280] = True
    # full-res variant (bridge_half_res off)
    out, _angle, _npre = _bridge(jnp.asarray(m), 0.0, jnp.float32(60.0), 120, cfg)
    out = np.asarray(out)
    assert out[118:124, 140:160].any(), "gap must be bridged (full res)"
    # the long line must NOT have been erased
    assert out[60, 40:280].all()
    # shipped path: shared half-res bridge via _bridge_pair (masks come back
    # on the half-res padded canvas; full-res row 120 -> 60, cols -> //2)
    assert cfg.bridge_half_res
    mh, _, _, _angles, _npre, _preconv = _bridge_pair(
        jnp.asarray(m), jnp.zeros((H, W), bool), jnp.float32(60.0), 120, cfg
    )
    mh = np.asarray(mh)
    assert mh[59:62, 70:80].any(), "gap must be bridged (half res)"


def test_joint_peaks_unique_on_large_images():
    """One peak per blob even when H*W > 2^19 (regression: a fixed 19-bit
    key shift aliased linear indices into box counts at 768x1024, yielding
    duplicate or wrong peaks in the bottom of the image)."""
    from cylinder_pose_estimation_tpu.models.detector import _joint_peaks
    from cylinder_pose_estimation_tpu.ops.image import box_filter
    from cylinder_pose_estimation_tpu.ops import labeling

    assert labeling.peak_key_shift(768, 1024, 11) == 20
    h, w = 768, 1024
    m = np.zeros((h, w), bool)
    # blobs in the lin > 2^19 region (row 600+) with differing sizes
    m[600:603, 100:103] = True
    m[700:705, 900:905] = True
    m[760:762, 1000:1002] = True
    joints = jnp.asarray(m)
    cnt = box_filter(joints.astype(jnp.float32), 11, mode="constant",
                     normalize=False)
    peak = np.asarray(_joint_peaks(joints, cnt, peak_iters=5, window=11))
    # exactly one peak per connected blob
    assert peak.sum() == 3
    assert peak[600:603, 100:103].sum() == 1
    assert peak[700:705, 900:905].sum() == 1
    assert peak[760:762, 1000:1002].sum() == 1


# ---------------------------------------------------------------------------
# End-to-end line-gap bridging on a RENDERED scene (round-4 stress corpus:
# the mask-level bridge tests above can't see whether the full chain --
# ridge -> binarize -> carve -> bridge -> label -> polyfit -> intersect --
# actually recovers a grid whose laser line has a dropout)
# ---------------------------------------------------------------------------


def _gapped_scene(gap=None, seed=3):
    """Rendered cylinder-grid image with an optional laser dropout band
    (rows y0:y1, cols x0:x1 damped to background).  Returns (img, scene)."""
    stereo = _small_stereo()
    scene = cylinder_grid_points(
        stereo, origin=(0.0, -10.0, 420.0), radius=55.0,
        row_spacing=12.0, theta_span=1.6, capacity=128, seed=seed,
    )
    img = np.asarray(
        render_grid_image(scene.gp1.xy, scene.gp1.valid, 9, 9, H, W),
        np.float32,
    )
    rng = np.random.default_rng(seed)
    img = img + rng.normal(0, 2.0, (H, W)).astype(np.float32)
    if gap is not None:
        # smooth attenuation (sigmoid taper over ~3 px): a hard-edged
        # rectangle would manufacture step-edge ridge responses the real
        # fading laser dropout does not have
        y0, y1, x0, x1 = gap
        yy = np.arange(H, dtype=np.float32)[:, None]
        xx = np.arange(W, dtype=np.float32)[None, :]
        def edge(v, lo, hi):
            return 1.0 / (1.0 + np.exp(-(v - lo) / 1.5)) * \
                   1.0 / (1.0 + np.exp((v - hi) / 1.5))
        atten = 1.0 - 0.97 * edge(yy, y0, y1) * edge(xx, x0, x1)
        img = img * atten
    return np.clip(img, 0, 255), scene


def _id_map(det):
    xy = np.asarray(det.grid.xy)
    idx = np.asarray(det.grid.idx)
    v = np.asarray(det.grid.valid)
    return {
        tuple(idx[i]): xy[i] for i in range(len(v)) if v[i]
    }


def test_rendered_line_gap_is_bridged_end_to_end():
    """A 18-px dropout across one horizontal laser line must not split the
    grid: detect_grid on the damaged image recovers the same ids as the
    intact control for every intersection outside the damaged band, at the
    same pixel positions (ref expands_line_roi utils/util_cylinder.py:137-237
    is the recipe this validates through the WHOLE chain)."""
    cfg = CylinderDetectConfig(height=H, width=W)
    img0, scene = _gapped_scene(gap=None)
    ctl = detect_grid(jnp.asarray(img0), cfg)
    assert bool(ctl.ok)
    ids0 = _id_map(ctl)

    # place the gap on the control's grid: between two detected columns of
    # the row one above the origin row
    ys = sorted({round(float(xy[1])) for xy in ids0.values()})
    y_mid = ys[len(ys) // 2]
    img1, _ = _gapped_scene(gap=(y_mid - 9, y_mid + 9, 150, 168))
    det = detect_grid(jnp.asarray(img1), cfg)
    assert bool(det.ok), "gap must not kill detection"
    ids1 = _id_map(det)

    # every control intersection outside the dropout must reappear with the
    # same id; points ON the damaged row get a looser position tolerance
    # (their row polynomial is fit across an 18-px hole -- a ~2 px local
    # pull from the straight bridged segment is legitimate), everything
    # else must sit within 1.5 px
    kept = checked = 0
    for key, xy in ids0.items():
        if abs(xy[1] - y_mid) < 12 and 138 <= xy[0] <= 180:
            continue  # inside / adjacent to the dropout
        on_damaged_row = abs(xy[1] - y_mid) < 12
        tol = 3.0 if on_damaged_row else 1.5
        checked += 1
        if key in ids1 and np.linalg.norm(ids1[key] - xy) < tol:
            kept += 1
    assert checked >= 20, f"degenerate control scene ({checked})"
    assert kept == checked, (
        f"only {kept}/{checked} intersections survived the line gap "
        f"with consistent ids"
    )


def test_rendered_line_gap_bridged_on_pallas_interpret():
    """The same end-to-end dropout scene through the Pallas kernels
    (interpret mode, CPU-runnable): the fused bridge kernel must reconnect
    the damaged line exactly like the XLA chain."""
    cfg_x = CylinderDetectConfig(height=H, width=W)
    cfg_p = CylinderDetectConfig(
        height=H, width=W, use_pallas=True, pallas_interpret=True
    )
    img0, _ = _gapped_scene(gap=None)
    ctl = detect_grid(jnp.asarray(img0), cfg_x)
    ids0 = _id_map(ctl)
    ys = sorted({round(float(xy[1])) for xy in ids0.values()})
    y_mid = ys[len(ys) // 2]
    img1, _ = _gapped_scene(gap=(y_mid - 9, y_mid + 9, 150, 168))

    det_x = detect_grid(jnp.asarray(img1), cfg_x)
    det_p = detect_grid(jnp.asarray(img1), cfg_p)
    ids_x = _id_map(det_x)
    ids_p = _id_map(det_p)
    assert set(ids_p) == set(ids_x)
    for key in ids_x:
        assert np.linalg.norm(ids_p[key] - ids_x[key]) < 0.75, (
            key, ids_p[key], ids_x[key]
        )


def test_rendered_double_gap_both_paths_agree():
    """Two dropout bands (one crossing a horizontal line, one crossing a
    vertical line elsewhere) -- the stress shape that caught the warm-start
    under-convergence (config.pallas_cc_rounds_warm history): both backends
    must still agree exactly after bridging both joins."""
    cfg_x = CylinderDetectConfig(height=H, width=W)
    cfg_p = CylinderDetectConfig(
        height=H, width=W, use_pallas=True, pallas_interpret=True
    )
    img0, _ = _gapped_scene(gap=None, seed=8)
    ctl = detect_grid(jnp.asarray(img0), cfg_x)
    assert bool(ctl.ok)
    ids0 = _id_map(ctl)
    ys = sorted({round(float(xy[1])) for xy in ids0.values()})
    xs = sorted({round(float(xy[0])) for xy in ids0.values()})
    y_a = ys[len(ys) // 3]
    x_b = xs[2 * len(xs) // 3]

    img1, _ = _gapped_scene(gap=(y_a - 8, y_a + 8, 95, 112), seed=8)
    # apply the second dropout on top (vertical-line cut away from the first)
    rng = np.random.default_rng(99)
    yy = np.arange(H, dtype=np.float32)[:, None]
    xx = np.arange(W, dtype=np.float32)[None, :]

    def edge(v, lo, hi):
        return 1.0 / (1.0 + np.exp(-(v - lo) / 1.5)) * \
               1.0 / (1.0 + np.exp((v - hi) / 1.5))

    atten = 1.0 - 0.97 * edge(yy, ys[-2] - 8, ys[-2] + 8) * \
        edge(xx, x_b - 9, x_b + 9)
    img1 = np.clip(img1 * atten, 0, 255)

    det_x = detect_grid(jnp.asarray(img1), cfg_x)
    det_p = detect_grid(jnp.asarray(img1), cfg_p)
    assert bool(det_x.ok) and bool(det_p.ok)
    ids_x = _id_map(det_x)
    ids_p = _id_map(det_p)
    assert len(ids_x) >= 15, f"double gap shredded the grid ({len(ids_x)})"
    assert set(ids_p) == set(ids_x)
    for key in ids_x:
        assert np.linalg.norm(ids_p[key] - ids_x[key]) < 0.75


def test_rendered_gap_on_tilted_grid_both_paths_agree():
    """Line gap on a ~10 deg tilted grid (inside the stable band): bridging
    along a genuinely oblique line direction must stay backend-exact --
    oblique joins jog rows AND columns, the worst case for the warm-start
    propagation depth."""
    from cylinder_pose_estimation_tpu.utils.synthetic import render_grid_image

    t = np.radians(10.0)
    r = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    ij = np.mgrid[0:9, 0:9].astype(np.float64) - 4.0
    local = np.stack([ij[1], ij[0]], axis=-1).reshape(-1, 2) * 22.0
    xy = jnp.asarray(local @ r.T + np.array([W / 2.0, H / 2.0]), jnp.float32)
    img = np.asarray(
        render_grid_image(xy, jnp.ones(81, bool), 9, 9, H, W), np.float32
    )
    rng = np.random.default_rng(5)
    img = img + rng.normal(0, 2.0, (H, W)).astype(np.float32)
    # dropout across the central area (cuts a tilted line)
    yy = np.arange(H, dtype=np.float32)[:, None]
    xx = np.arange(W, dtype=np.float32)[None, :]

    def edge(v, lo, hi):
        return 1.0 / (1.0 + np.exp(-(v - lo) / 1.5)) * \
               1.0 / (1.0 + np.exp((v - hi) / 1.5))

    atten = 1.0 - 0.97 * edge(yy, 88, 104) * edge(xx, 190, 208)
    img = np.clip(img * atten, 0, 255)

    cfg_x = CylinderDetectConfig(height=H, width=W)
    cfg_p = CylinderDetectConfig(
        height=H, width=W, use_pallas=True, pallas_interpret=True
    )
    det_x = detect_grid(jnp.asarray(img), cfg_x)
    det_p = detect_grid(jnp.asarray(img), cfg_p)
    assert bool(det_x.ok) and bool(det_x.stable)
    ids_x = _id_map(det_x)
    ids_p = _id_map(det_p)
    assert len(ids_x) >= 30
    assert set(ids_p) == set(ids_x)
    # Oblique joins rasterize a pixel differently between the backends
    # (dynamic-roll vs pad-shift rounding along a 10 deg line), and the
    # whole polynomial of the line crossing the gap refits over those
    # differing bridged pixels -- so points along that one line move up to
    # ~2 px while the rest of the grid stays sub-pixel identical.  The
    # invariant: exact id agreement, sub-pixel bulk, bounded worst case.
    deltas = np.array([
        np.linalg.norm(ids_p[key] - ids_x[key]) for key in ids_x
    ])
    assert np.median(deltas) < 0.3, np.median(deltas)
    assert deltas.max() < 3.0, deltas.max()


def test_randomized_backend_agreement_sweep():
    """Randomized tame scenes (|tilt| <= 10 deg, grid >= 40 px inside the
    frame, half with an off-center smooth dropout): the XLA and
    Pallas-interpret backend-agreement CONTRACT, two tiers:

    1. bridged_components == 0  ->  id SETS equal (the grid topology never
       depends on the backend when no fragments were merged);
    2. additionally max_line_tilt <= ~2 deg (axis-aligned)  ->  positions
       exact to 0.25 px as well.

    Tier 2 is tilt-gated because at non-axis angles the two bridge
    implementations' ORIENTED morphology footprints (XLA rotated-line
    dilate vs the fused Pallas kernel) legitimately differ by a pixel of
    discretization, which can flip one borderline centroid's label and
    perturb an outer column's polynomial extrapolation by ~1 px (seed 10
    here: ids equal, position deltas 0.3-1.4 px growing along the
    extrapolated outer col).  Under r4's conservative pre-bridge count this
    scene read bridged > 0 (shallow-CC overcount) and was silently excused;
    the r5 EXACT recount exposed it, so the contract now states what is
    actually true instead of hiding behind the overcount.  The excluded
    regime from r4 stands: grids whose outer row enters the border margin
    band re-rank legitimately (seed-9-style, Pallas stable=False)."""
    cfg_x = CylinderDetectConfig(height=H, width=W)
    cfg_p = CylinderDetectConfig(
        height=H, width=W, use_pallas=True, pallas_interpret=True
    )
    checked = 0
    diverged_unbridged = []
    for seed in range(12):
        rng = np.random.default_rng(1000 + seed)
        tilt = rng.uniform(-10, 10)
        n = int(rng.integers(7, 9))
        # size the spacing so the rotated grid keeps a 45-px border margin
        # in y (the binding axis at 240x320); at |tilt| <= 10 deg the
        # rotated half-extent is <= 1.18x the unrotated one
        max_half_y = H / 2.0 - 45.0
        spacing = min(rng.uniform(17, 24), max_half_y / ((n - 1) / 2.0 * 1.18))
        t = np.radians(tilt)
        r = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        ij = np.mgrid[0:n, 0:n].astype(np.float64) - (n - 1) / 2.0
        local = np.stack([ij[1], ij[0]], axis=-1).reshape(-1, 2) * spacing
        xy = local @ r.T + np.array([W / 2.0, H / 2.0])
        assert xy.min() > 40 and xy[:, 0].max() < W - 40 \
            and xy[:, 1].max() < H - 40
        img = np.asarray(
            render_grid_image(
                jnp.asarray(xy, jnp.float32), jnp.ones(n * n, bool), n, n,
                H, W,
            ),
            np.float32,
        )
        img = img + rng.normal(0, 2.0, (H, W)).astype(np.float32)
        if seed % 2 == 1:
            y0 = rng.uniform(70, 170)
            x0 = rng.uniform(80, 240)
            yy = np.arange(H, dtype=np.float32)[:, None]
            xx = np.arange(W, dtype=np.float32)[None, :]

            def e(v, lo, hi):
                return 1.0 / (1.0 + np.exp(-(v - lo) / 1.5)) * \
                       1.0 / (1.0 + np.exp((v - hi) / 1.5))

            img = img * (1.0 - 0.97 * e(yy, y0 - 8, y0 + 8)
                         * e(xx, x0 - 9, x0 + 9))
        img = np.clip(img, 0, 255)

        rx = detect_grid(jnp.asarray(img), cfg_x)
        rp = detect_grid(jnp.asarray(img), cfg_p)
        mx = _id_map(rx)
        mp = _id_map(rp)
        bridged = max(int(rx.bridged_components), int(rp.bridged_components))
        axis_aligned = (
            max(float(rx.max_line_tilt), float(rp.max_line_tilt)) <= 0.035
        )
        ids_equal = set(mp) == set(mx)
        exact = ids_equal and all(
            np.linalg.norm(mp[k] - mx[k]) < 0.25 for k in mx
        )
        if bridged == 0:
            # tier 1: an unbridged id-set divergence is a backend bug
            # (this is how the warm-start CC under-convergence was caught)
            if not ids_equal:
                diverged_unbridged.append(("ids", seed))
            # tier 2: axis-aligned scenes must also be positionally exact
            # (oriented-morphology discretization cannot differ at 0/90 deg)
            elif axis_aligned and not exact:
                diverged_unbridged.append(("pos", seed))
        if len(mx) >= 15 and exact:
            checked += 1
    assert not diverged_unbridged, diverged_unbridged
    # observed: 9/12 exact (incl. two scenes where bridging merged a
    # fragment and the backends STILL matched); the 3 inexact scenes all
    # report bridged_components >= 1 on both backends
    assert checked >= 8, f"too few substantive exact scenes ({checked})"


def test_bridged_components_diagnostic():
    """DetectResult.bridged_components: 0 on an intact scene (bridging's
    end-of-line extensions do not merge fragments), > 0 when a line gap
    forced a merge -- on BOTH backends (the observability contract the
    randomized sweep leans on)."""
    cfg_x = CylinderDetectConfig(height=H, width=W)
    cfg_p = CylinderDetectConfig(
        height=H, width=W, use_pallas=True, pallas_interpret=True
    )
    img0, _ = _gapped_scene(gap=None, seed=4)
    ctl = detect_grid(jnp.asarray(img0), cfg_x)
    ids0 = _id_map(ctl)
    ys = sorted({round(float(xy[1])) for xy in ids0.values()})
    y_mid = ys[len(ys) // 2]
    img1, _ = _gapped_scene(gap=(y_mid - 9, y_mid + 9, 150, 168), seed=4)

    for cfg in (cfg_x, cfg_p):
        clean = detect_grid(jnp.asarray(img0), cfg)
        gapped = detect_grid(jnp.asarray(img1), cfg)
        assert int(clean.bridged_components) == 0, int(clean.bridged_components)
        assert int(gapped.bridged_components) > 0, int(gapped.bridged_components)


@pytest.mark.slow
def test_cross_view_prune_mismatch_is_health_fenced():
    """KNOWN REFERENCE FRAGILITY, pinned as a fenced degraded mode: the
    reference's last-col prune picks the max-min-Y column (r5 oracle-exact,
    detector stage 6d), and on near-symmetric tilted scenes the two stereo
    views can drop DIFFERENT physical columns.  Index correspondence then
    pairs physically different columns, the patch-consensus gate rejects
    them, the ungated exact-index fallback produces large reprojection
    errors (the reference would feed exactly this garbage into
    fitCylinderWPts3sAngs, ref utils/chooseIdx.m:101-104 + :82-94) -- and
    pipeline.frame_health must mask those frames out of registration.

    Scenario: test_parallel's kinematic miniature frames, where frames 5-6
    exhibit the divergence (L keeps 7 columns, R keeps 5 on frame 5)."""
    import test_parallel as tp
    from cylinder_pose_estimation_tpu.config import (
        FitConfig,
        RegistrationConfig,
    )
    from cylinder_pose_estimation_tpu.models.pipeline import (
        estimate_poses_batch,
        frame_health,
    )

    stereo = tp.default_stereo(cx=tp.W / 2.0, cy=tp.H / 2.0, baseline=30.0)
    i1, i2 = tp._frames(stereo, 8)
    cfg = CylinderDetectConfig(
        height=tp.H, width=tp.W, cc_iters=8, min_ok_points=5
    )
    batch = jax.jit(
        lambda a, b: estimate_poses_batch(
            a, b, stereo, cfg, FitConfig(cyl_radius=55.0, lm_iters=40)
        )
    )(i1, i2)
    rcfg = RegistrationConfig(cyl_radius=55.0, min_frame_points=5)
    health = np.asarray(frame_health(batch, rcfg))
    rep = np.asarray(batch.fit.mean_reproj_error)

    # the poisoned frames exist in this scenario (if detection ever becomes
    # cross-view consistent here, this test should be RETIRED, not patched)
    poisoned = rep > rcfg.max_frame_reproj_px
    assert poisoned.any(), "scenario no longer reproduces the mismatch"
    # and the fence catches every one of them
    assert not (poisoned & health).any(), (rep, health)
    # healthy frames stay healthy (the fence is not trigger-happy)
    assert (health & ~poisoned).sum() >= 5
