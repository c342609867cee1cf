"""Per-stage in-situ split of detect_grid on TPU (submit via tools/tpu_worker).

Times cfg.stage_probe-truncated programs in the bench.py lax.scan repeat
harness (REPS in-jit repetitions, fresh perturbation per step, B=16 frames x
2 views) and prints consecutive deltas.  The first row includes the harness
floor (see floor_probes.py); deltas between rows are floor-free.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from cylinder_pose_estimation_tpu.config import CylinderDetectConfig
from cylinder_pose_estimation_tpu.models.detector import detect_grid
from __graft_entry__ import _example_pair

H, W = 480, 640
B = 16
REPS = 16
stereo, (i1, i2) = _example_pair(H, W, n_frames=B)
imgs = jnp.asarray(np.concatenate([i1, i2]), jnp.float32)  # (2B, H, W)


def timed(fn, n_calls=3):
    fn_j = jax.jit(fn)
    out = fn_j(imgs, 0.0)
    jax.block_until_ready(out)
    best = 1e9
    for c in range(1, n_calls + 1):
        t0 = time.perf_counter()
        out = fn_j(imgs, float(c))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / REPS / B  # per frame (2 views)


stages = ["preprocess", "centroids", "roi_seed", "roi_cc", "roi_mask", "roi",
          "seed", "carve", "bridge", "labels", "assign", "polyfit", "newton",
          ""]


def make(probe):
    cfg = CylinderDetectConfig(height=H, width=W, use_pallas=True,
                               stage_probe=probe)

    def body(a, k):
        def f(carry, _):
            def one(im):
                r = detect_grid(im + carry, cfg)
                if probe:
                    return r
                return sum(
                    jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(r)
                )
            s = jnp.sum(jax.vmap(one)(a))
            return carry + s * 1e-20, None
        c, _ = jax.lax.scan(f, k, None, length=REPS)
        return c
    return body


if __name__ == "__main__" or __name__ == "__tpuq__":
    prev = 0.0
    for st in stages:
        t = timed(make(st))
        name = st or "FULL(all leaves)"
        print("%-16s %8.4f ms/frame   delta %8.4f"
              % (name, t * 1e3, (t - prev) * 1e3))
        prev = t
