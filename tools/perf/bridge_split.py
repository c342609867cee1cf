"""Bridge-stage internal split (prebridge CC / angle+exp stats / morphology
kernel) on TPU, B=16 frames x 2 views at the half-res canvas.

Result (2026-08-20, v5e, see PERF_FLOOR.md): the dynamic-rotate morphology
kernel is ~0.023 ms/frame; the stage's cost is the CC min-propagation
(0.078) and the stats reductions (0.049) -- which kernel fusion cannot
remove.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from cylinder_pose_estimation_tpu.config import CylinderDetectConfig
from cylinder_pose_estimation_tpu.ops.pallas.frontend import (
    preprocess_binarize, connected_components as cc_pallas, bridge_morphology,
)
from cylinder_pose_estimation_tpu.models import detector as det
from __graft_entry__ import _example_pair

H, W = 480, 640
B = 16
REPS = 16
stereo, (i1, i2) = _example_pair(H, W, n_frames=B)
imgs = jnp.asarray(np.concatenate([i1, i2]), jnp.float32)

cfg = CylinderDetectConfig(height=H, width=W, use_pallas=True)


def masks_of(im):
    outs = preprocess_binarize(im)
    return jnp.stack(
        [det._pool2_pad(outs[1] > 0.5), det._pool2_pad(outs[2] > 0.5)]
    ).astype(jnp.float32)


def timed(fn, *args, n_calls=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args, 0.0); jax.block_until_ready(out)
    best = 1e9
    for c in range(1, n_calls + 1):
        t0 = time.perf_counter()
        out = fn_j(*args, float(c)); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / REPS / B * 1e3


def scanned(body):
    def outer(m, k):
        def f(carry, _):
            s = body(m * (1.0 + carry * 1e-20))
            return carry + s * 1e-20, None
        c, _ = jax.lax.scan(f, k, None, length=REPS)
        return c
    return outer


if __name__ == "__main__" or __name__ == "__tpuq__":
    masks = jax.jit(jax.vmap(masks_of))(imgs)  # (2B, 2, Hs, Ws) f32
    print("mask canvas:", masks.shape)
    rounds = max(1, int(cfg.pallas_cc_rounds_prebridge))

    print("floor(sum masks):   %.4f ms/frame" % timed(
        scanned(lambda mm: jnp.sum(mm)), masks))

    def cc_only(m):
        lbl = cc_pallas(m > 0.5, rounds=rounds,
                        pools_per_round=cfg.pallas_cc_pools)
        return jnp.sum(lbl.astype(jnp.float32))
    print("prebridge CC:       %.4f ms/frame" % timed(
        scanned(lambda mm: jnp.sum(jax.vmap(cc_only)(mm))), masks))

    def cc_exp(m):
        mb = m > 0.5
        lbl = cc_pallas(mb, rounds=rounds,
                        pools_per_round=cfg.pallas_cc_pools)
        (ah, av), (eh, ev) = det._bridge_angle_exp_pair(
            mb, lbl, cfg, scale=cfg.label_downsample)
        return jnp.sum(eh) + jnp.sum(ev) + ah + av
    print("CC+angle/exp:       %.4f ms/frame" % timed(
        scanned(lambda mm: jnp.sum(jax.vmap(cc_exp)(mm))), masks))

    mk = max((cfg.bridge_kernel_base + 160) // 2, 1)
    pr = max(2, (cfg.endpoint_probe_len + 1) // 2)

    def full_bridge(m):
        mb = m > 0.5
        lbl = cc_pallas(mb, rounds=rounds,
                        pools_per_round=cfg.pallas_cc_pools)
        (ah, av), (eh, ev) = det._bridge_angle_exp_pair(
            mb, lbl, cfg, scale=cfg.label_downsample)
        br = bridge_morphology(
            m, jnp.stack([eh, ev]).astype(jnp.float32),
            jnp.stack([ah, av]), jnp.asarray(50.0, jnp.float32),
            probe_len=pr, max_kernel=mk)
        return jnp.sum(br)
    print("CC+exp+morph:       %.4f ms/frame" % timed(
        scanned(lambda mm: jnp.sum(jax.vmap(full_bridge)(mm))), masks))

    def morph_only(m):
        br = bridge_morphology(
            m, m, jnp.asarray([0.0, np.pi / 2], jnp.float32),
            jnp.asarray(50.0, jnp.float32), probe_len=pr, max_kernel=mk)
        return jnp.sum(br)
    print("morph alone:        %.4f ms/frame" % timed(
        scanned(lambda mm: jnp.sum(jax.vmap(morph_only)(mm))), masks))
