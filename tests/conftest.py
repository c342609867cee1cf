"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax backend initialization.  The axon sitecustomize pins
JAX_PLATFORMS=axon (real TPU); tests run on the host CPU with 8 virtual
devices so sharding tests exercise real multi-device code paths.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# The suite is compile-bound (detect_grid jit ~60 s on CPU, execution ~2 s):
# persist compiled executables so repeat runs and repeat configs are fast.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def stereo():
    from cylinder_pose_estimation_tpu.utils.synthetic import default_stereo

    return default_stereo()
