"""Test environment: force an 8-device virtual CPU mesh before jax loads.

Multi-chip hardware is not available in CI; sharding tests run against
8 virtual CPU devices (xla_force_host_platform_device_count), matching
how the driver dry-runs the multi-chip path.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize registers a TPU PJRT plugin and pins
# JAX_PLATFORMS before we run; the config update below wins regardless.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles many small programs;
# repeated runs (CI, driver checks) hit the cache instead.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_idccrn_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
