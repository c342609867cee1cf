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
import math
import time

import numpy as np


class _TiledFrames:
    """Virtual (N, H, W) uint8 array: a unique-scene pool tiled to N frames
    with a deterministic per-frame brightness offset (breaks input-identity
    caching; detection is insensitive to a +0..6 gray offset).

    Frame i is pool[i % P] + (i % 7), which is periodic with period
    lcm(7, P) -- so ONE (period, H, W) arrangement is precomputed
    (saturating add in int16: the renderer clips the center blob at exactly
    255, so a uint8 add would wrap saturated pixels to 0..5 and corrupt the
    brightest-joint origin -- round-3 advisor finding) and __getitem__
    serves chunks as zero-copy contiguous views (a two-piece
    concatenate only when a chunk straddles the period boundary).  The earlier
    per-chunk widen+clip cost ~3 s of host time per chunk on this VM
    (dwarfing the 0.08 s of TPU compute it fed), and even the fancy-index
    variant gather became a co-bottleneck once the host link sped up."""

    N_OFFSETS = 7

    def __init__(self, pool: np.ndarray, n: int):
        self.n = n
        p = len(pool)
        period = p * self.N_OFFSETS // math.gcd(p, self.N_OFFSETS)
        idx = np.arange(period)
        wide = pool[idx % p].astype(np.int16) + (idx % self.N_OFFSETS)[
            :, None, None
        ].astype(np.int16)
        self.arrangement = np.clip(wide, 0, 255).astype(np.uint8)

    @property
    def shape(self):
        return (self.n,) + self.arrangement.shape[1:]

    def __getitem__(self, sl):
        start, stop, _ = sl.indices(self.n)
        ln = stop - start
        per = len(self.arrangement)
        s0 = start % per
        if s0 + ln <= per:
            return self.arrangement[s0 : s0 + ln]  # zero-copy view
        # Wrapped chunk (possibly spanning multiple periods when ln > per,
        # e.g. small --pool with the default chunk): modular take is exact
        # for any ln; the straight-slice fast path above keeps the common
        # case zero-copy.
        out = np.take(self.arrangement, np.arange(s0, s0 + ln) % per, axis=0)
        assert len(out) == ln
        return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10000)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--pool", type=int, default=64)
    ap.add_argument("--runs", type=int, default=3,
                    help="spaced repetitions; the artifact reports "
                         "min/median/max so one drifting-link sample cannot "
                         "flatter or sandbag the number (VERDICT r4 #9)")
    ap.add_argument("--gap", type=float, default=60.0,
                    help="seconds between runs (lets the tunnel bandwidth "
                         "drift between samples)")
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

    # Warm the compile on one chunk-shaped call (not counted).  Slice the
    # pool first: _TiledFrames precomputes brightness variants of its WHOLE
    # pool, and the warm call only ever reads frames [0, chunk).
    warm1 = _TiledFrames(pool1[: args.chunk], args.chunk)
    warm2 = _TiledFrames(pool2[: args.chunk], args.chunk)
    estimate_poses_stream(
        warm1, warm2, stereo, cfg, fit_cfg, chunk=args.chunk, compact=True
    )

    bytes_per_frame = 2 * height * width  # stereo uint8, the camera wire format

    def one_run():
        # In-run host-link H2D bandwidth (BLOCKED transfer: async dispatch
        # alone reads ~30 ms for any size and is meaningless).  The axon
        # tunnel is a WAN link whose bandwidth drifts 6-16 MB/s by time of
        # day; a real TPU host feeds its chips over PCIe/DMA at GB/s, so the
        # end-to-end number below is a property of this dev link, not of the
        # framework.
        probe = imgs1[slice(0, args.chunk)]
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe))
        bw = probe.nbytes / (time.perf_counter() - t0) / 1e6

        t0 = time.perf_counter()
        res = estimate_poses_stream(
            imgs1, imgs2, stereo, cfg, fit_cfg, chunk=args.chunk, compact=True
        )
        dt = time.perf_counter() - t0

        fps = args.frames / dt
        ok = np.asarray(res.ok)
        n_ok = int(ok.sum())
        errs = np.asarray(res.mean_reproj_error)
        # None (JSON null), not NaN: json.dump would emit the non-standard
        # token `NaN` and break strict consumers of the benchmark artifact
        reproj = round(float(np.median(errs[ok])), 4) if n_ok else None
        link_bound_fps = bw * 1e6 / bytes_per_frame
        return {
            "fps": round(fps, 2),
            "wall_s": round(dt, 2),
            "ok_frames": n_ok,
            "median_reproj_px": reproj,
            "link_h2d_mb_s": round(bw, 2),
            "link_bound_fps": round(link_bound_fps, 2),
            "link_efficiency": round(fps / link_bound_fps, 3),
        }

    runs = []
    for r in range(max(1, args.runs)):
        if r:
            time.sleep(args.gap)
        runs.append(one_run())
        print(json.dumps({"run": r, **runs[-1]}))

    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            mem = int(stats.get("peak_bytes_in_use", 0)) or None
    except Exception:
        pass

    fpss = sorted(x["fps"] for x in runs)
    med = fpss[len(fpss) // 2] if len(fpss) % 2 else round(
        0.5 * (fpss[len(fpss) // 2 - 1] + fpss[len(fpss) // 2]), 2
    )
    out = {
        "metric": "stream_frames_per_sec_10k",
        "value": med,
        "unit": "frames/s",
        "fps_min": fpss[0],
        "fps_max": fpss[-1],
        "n_frames": args.frames,
        "chunk": args.chunk,
        "runs": runs,
        "ok_frames": runs[-1]["ok_frames"],
        "median_reproj_px": runs[-1]["median_reproj_px"],
        "hbm_peak_bytes": mem,
        "note": (
            "full host loop wall clock: uint8 H2D + batched detect->fit "
            "compute + host readback per chunk; three-deep pipeline "
            "(uploader thread || compute+async D2H || materialize); device "
            "memory O(chunk).  The axon tunnel's H2D bandwidth (measured "
            "in-run, blocked transfer) is the physical ceiling: "
            "link_bound_fps = bandwidth / (2*H*W bytes per stereo frame); "
            "link_efficiency is how close the loop runs to that ceiling.  "
            "value = MEDIAN fps over the spaced runs[]; fps_min/fps_max "
            "carry the link-drift spread (VERDICT r4 #9).  TPU compute "
            "sustains ~1280 fps on resident frames (BENCH_rNN)."
        ),
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
