"""10k-frame streaming benchmark (BASELINE.md config 5; VERDICT r2 missing #3).

Drives models.pipeline.estimate_poses_stream over 10,000 synthetic 480x640
stereo frames on one chip with bounded device memory (chunk-sized slices
through one compiled step), and writes BENCH_STREAM.json:

  {"metric": "stream_frames_per_sec_10k", "value": ..., "unit": "frames/s",
   "n_frames": 10000, "chunk": 64, "hbm_peak_bytes": ...}

Honesty protocol: frames are a 64-scene unique pool tiled to N with a
per-frame brightness perturbation, so no (executable, input) execution cache
can short-circuit a chunk; transfers ship uint8 (the camera wire format) and
the wall clock covers the FULL host loop -- H2D, compute, D2H readback --
i.e. steady-state streaming serving, not a device-only kernel time.

Usage: python bench_stream.py [--frames 10000] [--chunk 64]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


class _TiledFrames:
    """Virtual (N, H, W) uint8 array: a unique-scene pool tiled to N frames
    with a deterministic per-frame brightness offset (breaks input-identity
    caching; detection is insensitive to a +0..6 gray offset)."""

    def __init__(self, pool: np.ndarray, n: int):
        self.pool = pool
        self.n = n

    @property
    def shape(self):
        return (self.n,) + self.pool.shape[1:]

    def __getitem__(self, sl):
        idx = np.arange(*sl.indices(self.n))
        out = self.pool[idx % len(self.pool)].astype(np.int16)
        # saturating add: the renderer clips the center blob at exactly 255,
        # so a uint8 add would wrap saturated pixels to 0..5 and corrupt the
        # brightest-joint origin (round-3 advisor finding)
        return np.clip(out + idx[:, None, None] % 7, 0, 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10000)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--pool", type=int, default=64)
    ap.add_argument("--out", default="BENCH_STREAM.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cylinder_pose_estimation_tpu.config import CylinderDetectConfig, FitConfig
    from cylinder_pose_estimation_tpu.models.pipeline import estimate_poses_stream

    from __graft_entry__ import _example_pair

    height, width = 480, 640
    # Cycle pans over the in-frame range 0..12 (the cylinder exits the
    # 640-px frame above pan ~12); frames stay unique via per-frame grid
    # seeds + noise draws.  A linear pan sweep made 51/64 pool scenes
    # undetectable by construction (round-4 stream320 run: 65/320 ok).
    pans = [i % 13 for i in range(args.pool)]
    stereo, (i1, i2) = _example_pair(height, width, n_frames=args.pool, pans=pans)
    pool1 = np.clip(i1, 0, 255).astype(np.uint8)
    pool2 = np.clip(i2, 0, 255).astype(np.uint8)

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    cfg = CylinderDetectConfig(height=height, width=width, use_pallas=on_tpu)
    fit_cfg = FitConfig()

    imgs1 = _TiledFrames(pool1, args.frames)
    imgs2 = _TiledFrames(pool2, args.frames)

    # Warm the compile on one chunk-shaped call (not counted).
    warm1 = _TiledFrames(pool1, args.chunk)
    warm2 = _TiledFrames(pool2, args.chunk)
    estimate_poses_stream(
        warm1, warm2, stereo, cfg, fit_cfg, chunk=args.chunk, compact=True
    )

    t0 = time.perf_counter()
    res = estimate_poses_stream(
        imgs1, imgs2, stereo, cfg, fit_cfg, chunk=args.chunk, compact=True
    )
    dt = time.perf_counter() - t0

    fps = args.frames / dt
    ok = np.asarray(res.ok)
    n_ok = int(ok.sum())
    errs = np.asarray(res.mean_reproj_error)
    reproj = float(np.median(errs[ok])) if n_ok else float("nan")
    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            mem = int(stats.get("peak_bytes_in_use", 0)) or None
    except Exception:
        pass

    out = {
        "metric": "stream_frames_per_sec_10k",
        "value": round(fps, 2),
        "unit": "frames/s",
        "n_frames": args.frames,
        "chunk": args.chunk,
        "wall_s": round(dt, 2),
        "ok_frames": n_ok,
        "median_reproj_px": round(reproj, 4),
        "hbm_peak_bytes": mem,
        "note": (
            "full host loop wall clock: uint8 H2D + batched detect->fit "
            "compute + host readback per chunk; double-buffered (overlap="
            "True) with on-device compact pose summaries (~200 B/frame "
            "D2H); device memory O(chunk)"
        ),
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
