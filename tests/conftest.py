"""Test configuration: run the suite on a virtual 8-device CPU mesh with
float64 enabled, standing in for a TPU pod slice (SURVEY.md §4 carry-over:
multi-device tests via xla_force_host_platform_device_count)."""

import os

# must be set before the first jax backend initialization
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on a 1-CPU host,
# so cache XLA executables across runs (first run pays, reruns are fast).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
