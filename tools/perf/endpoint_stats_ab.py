"""A/B: default bridge stats (moment CC + warm start) vs
cfg.bridge_endpoint_stats=True (payload-minmax endpoints, no warm start).

Result (2026-08-20, v5e, see PERF_FLOOR.md): the endpoint-stats path is
SLOWER end-to-end (1.05 vs 0.73 ms/frame -- it forfeits the final-CC warm
start) and changes detection on 20/32 bench images (dropped points, xy
deltas up to 1.3 px).  It stays off by default; the capability is retained
behind the config flag for large-K scenes where the (HW, K) one-hot stats
would not fit.
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
imgs = jnp.asarray(np.concatenate([i1, i2]), jnp.float32)


def timed(cfg, n_calls=3):
    def body(a, k):
        def f(carry, _):
            def one(im):
                r = detect_grid(im + carry, cfg)
                return sum(
                    jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(r)
                )
            s = jnp.sum(jax.vmap(one)(a))
            return carry + s * 1e-20, None
        c, _ = jax.lax.scan(f, k, None, length=REPS)
        return c
    fn = jax.jit(body)
    out = fn(imgs, 0.0); jax.block_until_ready(out)
    best = 1e9
    for c in range(1, n_calls + 1):
        t0 = time.perf_counter()
        out = fn(imgs, float(c)); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / REPS / B * 1e3


if __name__ == "__main__" or __name__ == "__tpuq__":
    cfg_def = CylinderDetectConfig(height=H, width=W, use_pallas=True)
    cfg_eps = CylinderDetectConfig(height=H, width=W, use_pallas=True,
                                   bridge_endpoint_stats=True)
    print("detect default:        %.4f ms/frame" % timed(cfg_def))
    print("detect endpoint_stats: %.4f ms/frame" % timed(cfg_eps))

    det_def = jax.jit(jax.vmap(lambda im: detect_grid(im, cfg_def)))(imgs)
    det_eps = jax.jit(jax.vmap(lambda im: detect_grid(im, cfg_eps)))(imgs)
    xy_d = np.asarray(det_def.grid.xy); v_d = np.asarray(det_def.grid.valid)
    xy_e = np.asarray(det_eps.grid.xy); v_e = np.asarray(det_eps.grid.valid)
    id_d = np.asarray(det_def.grid.idx); id_e = np.asarray(det_eps.grid.idx)
    bad = 0
    for i in range(xy_d.shape[0]):
        sd = {tuple(id_d[i, j]): tuple(np.round(xy_d[i, j], 4))
              for j in range(xy_d.shape[1]) if v_d[i, j]}
        se = {tuple(id_e[i, j]): tuple(np.round(xy_e[i, j], 4))
              for j in range(xy_e.shape[1]) if v_e[i, j]}
        if sd != se:
            bad += 1
            k1 = set(sd) - set(se); k2 = set(se) - set(sd)
            mx = max((abs(sd[k][0] - se[k][0]) + abs(sd[k][1] - se[k][1])
                      for k in set(sd) & set(se)), default=0)
            print("scene %d DIFF: missing %d extra %d max_xy_delta %.4f"
                  % (i, len(k1), len(k2), mx))
    print("scenes differing: %d / %d" % (bad, xy_d.shape[0]))
