"""Shared test helpers: jit-once wrappers keyed by (hashable) config.

detect_grid traced eagerly dispatches thousands of ops (~20 s/call on CPU);
jitted it runs in ~2 s but costs ~60 s to compile.  Caching one jitted
callable per config makes every test after the first reuse the executable
(and the persistent compilation cache set in conftest.py makes repeat suite
runs skip the compile entirely).
"""

import functools

import jax

from cylinder_pose_estimation_tpu.models.detector import detect_grid


@functools.lru_cache(maxsize=None)
def _jit_detect(cfg):
    return jax.jit(lambda im: detect_grid(im, cfg))


def run_detect(img, cfg):
    """Jitted detect_grid, one compile per distinct config."""
    return _jit_detect(cfg)(img)
