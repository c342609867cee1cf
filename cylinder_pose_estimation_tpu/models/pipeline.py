"""End-to-end pipelines: stereo images in, cylinder pose out; batched frames.

The TPU equivalent of the reference's two drivers:
  * exp_gridDetection.m's per-frame loop (preprocess -> detect both views ->
    fitSingleCylinder; ref exp_gridDetection.m:55-81) becomes
    ``estimate_pose_stereo`` -- one jitted program per stereo pair -- and
    ``estimate_poses_batch`` -- the same vmapped over a frame axis, so
    thousands of frames run as one XLA computation instead of a serial
    Python/MATLAB loop (SURVEY.md §2 concurrency note).
  * the closing multi-frame AGV registration (ref exp_gridDetection.m:87)
    becomes ``register_sequence``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cylinder_pose_estimation_tpu.config import (
    DetectConfig,
    FitConfig,
    RegistrationConfig,
)
from cylinder_pose_estimation_tpu.geometry.registration import (
    fit_cylinders_with_angles,
)
from cylinder_pose_estimation_tpu.models.detector import detect_grid
from cylinder_pose_estimation_tpu.models.pose import fit_single_cylinder
from cylinder_pose_estimation_tpu.types import (
    CylinderFitResult,
    DetectResult,
    RegistrationResult,
    StereoParams,
)


class StereoPoseResult(NamedTuple):
    detect1: DetectResult
    detect2: DetectResult
    fit: CylinderFitResult


def preprocess_stereo_batch(
    images1: jnp.ndarray,
    images2: jnp.ndarray,
    stereo: StereoParams,
    tiles: int = 8,
    clip_limit: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched stereo preprocessing: undistort + adaptive histogram
    equalization for both views (ref utils/preProcessing.m:4-21, MATLAB
    adapthisteq defaults 8x8 tiles / 0.01 clip)."""
    from cylinder_pose_estimation_tpu.ops.clahe import preprocess_stereo

    return jax.vmap(
        lambda a, b: preprocess_stereo(
            a, b, stereo.cam1, stereo.cam2, tiles=tiles, clip_limit=clip_limit
        )
    )(images1, images2)


def estimate_pose_stereo(
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    stereo: StereoParams,
    detect_cfg: DetectConfig,
    fit_cfg: FitConfig = FitConfig(),
) -> StereoPoseResult:
    """detect both views -> correspond -> triangulate -> fit (one frame).

    Mirrors ref exp_gridDetection.m:58-81 / utils/fitSingleCylinder.m without
    the MATLAB<->Python bridge: one traced program, no host round-trips.
    """
    d1 = detect_grid(image1, detect_cfg)
    d2 = detect_grid(image2, detect_cfg)
    fit = fit_single_cylinder(d1.grid, d2.grid, stereo, fit_cfg)
    return StereoPoseResult(detect1=d1, detect2=d2, fit=fit)


def estimate_poses_batch(
    images1: jnp.ndarray,
    images2: jnp.ndarray,
    stereo: StereoParams,
    detect_cfg: DetectConfig,
    fit_cfg: FitConfig = FitConfig(),
) -> StereoPoseResult:
    """Batched estimate_pose_stereo over a leading frame axis.

    Both views are detected in ONE (2F,)-batch vmap rather than two (F,)
    calls: the detector is a chain of small launch-bound ops on TPU, so
    doubling the data per op halves the per-frame dispatch overhead
    (numerically identical -- vmap is elementwise over frames)."""
    f = images1.shape[0]
    both = jnp.concatenate([images1, images2], axis=0)
    det = jax.vmap(lambda im: detect_grid(im, detect_cfg))(both)
    d1 = jax.tree.map(lambda x: x[:f], det)
    d2 = jax.tree.map(lambda x: x[f:], det)
    fit = jax.vmap(lambda a, b: fit_single_cylinder(a, b, stereo, fit_cfg))(
        d1.grid, d2.grid
    )
    return StereoPoseResult(detect1=d1, detect2=d2, fit=fit)


def estimate_poses_stream(
    images1,
    images2,
    stereo: StereoParams,
    detect_cfg: DetectConfig,
    fit_cfg: FitConfig = FitConfig(),
    chunk: int = 64,
):
    """Bounded-device-memory estimate_poses_batch for long sequences.

    The 10k-frame end-to-end config (BASELINE.md) cannot hold all frames in
    HBM at once (10k x 480x640 f32 x 2 views = ~25 GB), so this streams
    fixed-size ``chunk`` slices through ONE compiled step: a host loop feeds
    each chunk (the tail is padded by repeating the last frame so shapes
    stay static -- no recompile), results are materialized to host numpy per
    chunk, and device memory stays O(chunk).  Numerically identical to one
    big estimate_poses_batch call (vmap is elementwise over frames).

    images1/images2: (N, H, W) arrays (numpy / memmap accepted).  Returns a
    StereoPoseResult of host numpy arrays with the padding dropped.
    """
    import numpy as np

    n = images1.shape[0]
    if n == 0:
        raise ValueError("estimate_poses_stream needs at least one frame")
    step = jax.jit(
        lambda a, b: estimate_poses_batch(a, b, stereo, detect_cfg, fit_cfg)
    )
    outs = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        a = np.asarray(images1[s:e])
        b = np.asarray(images2[s:e])
        pad = chunk - (e - s)
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
            b = np.concatenate([b, np.repeat(b[-1:], pad, axis=0)])
        r = step(jnp.asarray(a), jnp.asarray(b))
        outs.append(jax.tree.map(lambda x: np.asarray(x)[: e - s], r))
    return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)


def frame_health(
    batch: StereoPoseResult,
    reg_cfg: RegistrationConfig = RegistrationConfig(),
) -> jnp.ndarray:
    """(F,) mask of frames whose detection + fit are trustworthy.

    A frame is healthy when both views detected a usable grid, enough points
    triangulated, the fit stayed finite, and the surviving correspondences
    reproject well.  The reference has no notion of this -- a failed frame
    feeds garbage into fitCylinderWPts3sAngs' objective (ref :82-94); here
    failures are explicit masks that survive vmap (SURVEY.md §5)."""
    fit = batch.fit
    n_pts = jnp.sum(fit.points_valid, axis=-1)
    finite = jnp.all(jnp.isfinite(fit.params), axis=-1)
    return (
        batch.detect1.ok
        & batch.detect2.ok
        & batch.detect1.stable
        & batch.detect2.stable
        & (n_pts >= reg_cfg.min_frame_points)
        & finite
        & (fit.mean_reproj_error <= reg_cfg.max_frame_reproj_px)
    )


def register_sequence(
    batch: StereoPoseResult,
    angles: jnp.ndarray,
    reg_cfg: RegistrationConfig = RegistrationConfig(),
) -> RegistrationResult:
    """Multi-frame camera<->AGV registration from a batched pose result
    (ref exp_gridDetection.m:87 fitCylinderWPts3sAngs), with unhealthy
    frames masked out of the objective (degraded-mode handling beyond the
    reference; falls back to all frames if < 2 are healthy)."""
    return fit_cylinders_with_angles(
        batch.fit.points3,
        batch.fit.points_valid,
        angles,
        reg_cfg,
        frame_valid=frame_health(batch, reg_cfg),
    )


def full_experiment(
    images1: jnp.ndarray,
    images2: jnp.ndarray,
    angles: jnp.ndarray,
    stereo: StereoParams,
    detect_cfg: DetectConfig,
    fit_cfg: FitConfig = FitConfig(),
    reg_cfg: RegistrationConfig = RegistrationConfig(),
    preprocess: bool = False,
) -> Tuple[StereoPoseResult, RegistrationResult]:
    """The whole exp_gridDetection.m equivalent as one jittable function:
    F stereo pairs + pan/tilt angles -> per-frame poses + T_Cam_AGV.

    ``preprocess=True`` runs the reference's stereo preprocessing first
    (undistort + adapthisteq, ref utils/preProcessing.m:4-21); pass False for
    images that are already undistorted/equalized.
    """
    if preprocess:
        images1, images2 = preprocess_stereo_batch(images1, images2, stereo)
    batch = estimate_poses_batch(images1, images2, stereo, detect_cfg, fit_cfg)
    reg = register_sequence(batch, angles, reg_cfg)
    return batch, reg
