"""Triangulation property tests (replacing MATLAB built-in triangulate)."""

import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.geometry import transforms as tf
from cylinder_pose_estimation_tpu.geometry.triangulate import (
    triangulate,
    triangulate_with_threshold,
)
from cylinder_pose_estimation_tpu.utils.synthetic import cylinder_grid_points, default_stereo


def test_triangulate_recovers_points():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    res = triangulate(scene.gp1.xy, scene.gp2.xy, stereo, valid=scene.valid)
    v = np.asarray(scene.valid)
    err3d = np.linalg.norm(np.asarray(res.points3 - scene.pts3), axis=-1)[v]
    assert err3d.max() < 0.05  # mm, noise-free
    assert np.asarray(res.reproj_error)[v].max() < 1e-2  # px


def test_reprojection_error_reflects_noise():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128, noise_px=0.5, seed=5)
    res = triangulate(scene.gp1.xy, scene.gp2.xy, stereo, valid=scene.valid)
    v = np.asarray(scene.valid)
    errs = np.asarray(res.reproj_error)[v]
    assert 0.05 < errs.mean() < 1.5


def test_threshold_filters_outliers():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    # Corrupt one match across the epipolar line (y: baseline is along x, so
    # an x shift would be absorbed as a depth change with ~zero residual).
    xy2 = scene.gp2.xy.at[3, 1].add(25.0)
    res = triangulate_with_threshold(scene.gp1.xy, xy2, stereo, 0.5, valid=scene.valid)
    v = np.asarray(res.valid)
    assert not v[3]
    assert v[np.asarray(scene.valid)].sum() == np.asarray(scene.valid).sum() - 1


def test_threshold_fallback_when_all_filtered():
    """If nothing passes, return unfiltered (ref utils/triangulateWithThreshold.m:40-43)."""
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128, noise_px=3.0, seed=2)
    res = triangulate_with_threshold(
        scene.gp1.xy, scene.gp2.xy, stereo, 1e-9, valid=scene.valid
    )
    assert np.asarray(res.valid).sum() == np.asarray(scene.valid).sum()


def test_triangulate_masked_entries_do_not_nan():
    stereo = default_stereo()
    scene = cylinder_grid_points(stereo, capacity=128)
    res = triangulate(scene.gp1.xy, scene.gp2.xy, stereo, valid=scene.valid)
    assert np.all(np.isfinite(np.asarray(res.points3)))


def test_f32_reprojection_rmse_parity_vs_f64():
    """BASELINE.md budget: reprojection RMSE delta vs a float64 CPU reference
    must be <= 1e-3 px.  Measured delta is ~3e-7 px (K-normalized DLT)."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
        from cylinder_pose_estimation_tpu.utils.synthetic import (
            default_stereo, cylinder_grid_points)
        from cylinder_pose_estimation_tpu.geometry.triangulate import triangulate

        stereo64 = default_stereo(dtype=jnp.float64)
        scene = cylinder_grid_points(
            stereo64, capacity=128, origin=(0.0, -40.0, 560.0), radius=70.0,
            row_spacing=18.0, theta_span=2.0, noise_px=0.3, seed=3,
            dtype=jnp.float64)
        v = np.asarray(scene.valid)

        def rmse(tri):
            e = np.asarray(tri.reproj_error, np.float64)[v]
            return float(np.sqrt(np.mean(e * e)))

        jtri = jax.jit(lambda a, b, s: triangulate(a, b, s, valid=scene.valid))
        r64 = rmse(jtri(scene.gp1.xy, scene.gp2.xy, stereo64))
        to32 = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
        r32 = rmse(jtri(to32(scene.gp1).xy, to32(scene.gp2).xy,
                        to32(stereo64)))
        delta = abs(r64 - r32)
        assert delta <= 1e-3, delta
        print("OK", delta)
        """
    )
    # x64 mode is process-global; run isolated.
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": ""},
    )
    assert "OK" in out.stdout, out.stdout + out.stderr
