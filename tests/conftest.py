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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The default tier is XLA:CPU compile-bound and asserts BYTE-EXACTNESS, not
# speed: backend optimization level 0 cuts cold compiles ~3.5x (heaviest
# test 151 -> 42 s) without changing semantics.  The production compile
# path (O2, TPU) is separately covered by the hardware golden battery
# (tools/tpu_check.py).  Set REVERIE_TEST_FULL_OPT=1 to restore O2 here.
if ("xla_backend_optimization_level" not in flags
        and not os.environ.get("REVERIE_TEST_FULL_OPT")):
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Cache XLA compilations across test runs (compile dominates suite time).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
