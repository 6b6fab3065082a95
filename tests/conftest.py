import os

# Run all tests on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (multi-chip HW is not available here).
#
# NOTE: this environment's sitecustomize imports jax and registers the `axon`
# TPU platform before conftest runs, so setting JAX_PLATFORMS via os.environ
# is not enough -- we must update the jax config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Cache XLA compilations across test runs (compile dominates suite time).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
