"""Benchmark: end-to-end grid-detect -> cylinder-pose throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "stages"}.
Baseline target: 1000 frames/s (BASELINE.md north star, TPU v5e single chip);
the reference itself publishes no numbers (its per-stage comment "time 17.4"
suggests tens of ms per stage on CPU, i.e. low-double-digit frames/s at best).

The measured unit of work is the reference's full per-frame pipeline
(ref exp_gridDetection.m:55-81): TWO 480x640 grid detections (left+right view,
each: Gaussian -> Hessian ridge -> Sauvola -> morphology -> connected
components -> bridging -> polyfit -> intersections -> indexing), stereo
patch-consensus correspondence, batched DLT triangulation, curvature-seeded
LM cylinder fit with priors.

Measurement protocol (honest under the axon tunnel):
  * 16 UNIQUE rendered scenes (distinct cylinder poses), not tiled copies;
  * inputs are staged on-device once (input pipelines are not the metric and
    the tunnel's host->device path is an environment artifact);
  * every repetition perturbs the images with a fresh scalar so no
    execution/caching shortcut can fire (identical-buffer re-execution was
    observed to short-circuit);
  * repetitions run INSIDE one jit via lax.scan with a carry data dependency:
    per-call host<->device round trips (measured drifting between ~5 and
    ~30 ms/call on the tunnel) amortize over K*batch frames instead of
    polluting the per-frame number;
  * timing is synced by materializing outputs on the host;
  * the "stages" dict reports the detect-only ms/frame (both views) via an
    IN-SITU truncate-the-tail probe: estimate_poses_batch(probe="detect")
    returns from the SAME source path right after the shared (2F,) detect
    vmap, so the detect subgraph of both timed programs is byte-identical
    and fit = end_to_end - detect isolates exactly the correspond ->
    triangulate -> fit tail.  Both programs force their complete output
    pytree into the carry (every leaf) -- earlier probes forced only
    grid.xy / fit params, so XLA dead-code-eliminated the indexing tail out
    of the detect program and over-attributed it to "fit" (NEXT.md job 013);
    r5 additionally replaced the separately-reconstructed detect program
    with the in-situ truncation (VERDICT r4 #4).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from cylinder_pose_estimation_tpu.config import CylinderDetectConfig, FitConfig
    from cylinder_pose_estimation_tpu.models.pipeline import estimate_poses_batch

    from __graft_entry__ import _example_pair

    height, width = 480, 640
    batch = 16
    stereo, (i1, i2) = _example_pair(height, width, n_frames=batch)
    d1 = jax.device_put(jnp.asarray(i1))
    d2 = jax.device_put(jnp.asarray(i2))
    jax.block_until_ready((d1, d2))

    detect_cfg = CylinderDetectConfig(height=height, width=width, use_pallas=True)
    fit_cfg = FitConfig()

    def _force(tree):
        """Reduce EVERY leaf to a scalar so nothing in the program is DCE'd."""
        return sum(
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(tree)
        )

    def step(a, b, k):
        res = estimate_poses_batch(a + k, b + k, stereo, detect_cfg, fit_cfg)
        return _force(res)

    def step_detect(a, b, k):
        # IN-SITU truncation (VERDICT r4 #4): the SAME estimate_poses_batch
        # source path, cut right after the shared (2F,) detect vmap via the
        # static probe -- not a separately reconstructed detect program.  The
        # detect subgraph is byte-identical between the two timed programs,
        # so e2e - detect isolates exactly the correspond->triangulate->fit
        # tail (plus the forcing of the fit leaves).
        det = estimate_poses_batch(
            a + k, b + k, stereo, detect_cfg, fit_cfg, probe="detect"
        )
        return _force(det)

    # 32 in-jit repetitions: the tunnel's per-call dispatch+readback floor
    # (measured drifting 5-30 ms/call) amortizes to < 0.06 ms/frame at B=16,
    # approximating steady-state pipelined serving; every rep still sees a
    # fresh scalar perturbation so no execution cache can fire.
    reps = 64

    def timed(body, n_calls=3):
        @jax.jit
        def run(k0):
            def rep(carry, i):
                v = body(d1, d2, k0 + 1e-6 * i.astype(jnp.float32) + 1e-9 * carry)
                return carry + v, ()
            out, _ = jax.lax.scan(rep, jnp.float32(0.0), jnp.arange(reps))
            return out

        np.asarray(run(jnp.float32(1e-7)))  # warmup / compile
        ks = [jax.device_put(jnp.float32(1e-4 * (i + 1))) for i in range(n_calls)]
        jax.block_until_ready(ks)
        t0 = time.perf_counter()
        outs = [run(k) for k in ks]
        for o in outs:
            np.asarray(o)
        dt = time.perf_counter() - t0
        return dt / (batch * reps * n_calls)  # seconds per frame

    spf = timed(step)
    spf_detect = timed(step_detect)
    fps = 1.0 / spf
    print(
        json.dumps(
            {
                "metric": "frames_per_sec_detect_to_pose_480x640",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 1000.0, 4),
                "stages": {
                    "detect_ms_per_frame_2views": round(spf_detect * 1e3, 3),
                    "fit_ms_per_frame": round((spf - spf_detect) * 1e3, 3),
                    "end_to_end_ms_per_frame": round(spf * 1e3, 3),
                    "method": (
                        "in-situ: the detect probe is the e2e program "
                        "truncated after the shared (2F,) detect vmap "
                        "(estimate_poses_batch(probe='detect')); both "
                        "programs force their FULL output pytree, so "
                        "fit = e2e - detect isolates the correspond->"
                        "triangulate->fit tail over a byte-identical "
                        "detect subgraph"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
