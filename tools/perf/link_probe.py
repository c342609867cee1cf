"""Measure the REAL host<->device link speed (submit via tools/tpu_worker).

jax.device_put / jnp.asarray return before the transfer completes, so timing
them without block_until_ready measures dispatch (~30 ms flat at any size) --
the round-3 "H2D 1.4 GB/s" record was this artifact.  This probe blocks.

Measured 2026-08-20 on the axon v5e tunnel (drifts by hour):
  H2D 6-24 MB/s, D2H 12-50 MB/s, per-call floor 8-30 ms
  => raw 480x640 stereo uint8 (614 KB/frame) cannot reliably stream at
     30 fps (needs 18.4 MB/s); BENCH_STREAM.json carries the in-run value.
"""
import time

import numpy as np
import jax


def main() -> None:
    d = jax.devices()[0]
    print("device:", d)
    for mb in (1, 8, 39):
        x = np.random.randint(0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
        best = 1e9
        for i in range(3):
            x[i] = i  # vary content so no transfer cache can fire
            t0 = time.perf_counter()
            y = jax.device_put(x, d)
            y.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print("H2D %2d MB: %7.1f ms  (%6.1f MB/s)" % (mb, best * 1e3, mb / best))
    for mb in (1, 8):
        y = jax.device_put(
            np.random.randint(0, 255, (mb * 1024 * 1024,), dtype=np.uint8), d
        )
        y.block_until_ready()
        best = 1e9
        for i in range(3):
            # fresh DEVICE-computed array each try: np.asarray of an array
            # whose host buffer already exists is served from the host side
            # and reads 0 ms
            z = (y + np.uint8(i + 1)).block_until_ready()
            t0 = time.perf_counter()
            np.asarray(z)
            best = min(best, time.perf_counter() - t0)
        print("D2H %2d MB: %7.1f ms  (%6.1f MB/s)" % (mb, best * 1e3, mb / best))
    # per-call floor: tiny round trip
    z = jax.device_put(np.zeros(8, np.float32), d)
    z.block_until_ready()
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(z + 1.0)
        best = min(best, time.perf_counter() - t0)
    print("per-call floor: %.1f ms" % (best * 1e3))


if __name__ == "__main__" or __name__ == "__tpuq__":
    main()
