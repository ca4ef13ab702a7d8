"""Test env: force REAL CPU (the axon sitecustomize force-registers the
TPU backend otherwise) with 8 virtual devices for sharding tests, plus a
persistent compilation cache. Must run before any jax import."""
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""   # disarm axon TPU auto-registration
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["FHE_SI_TPU_JAX_CACHE"] = ""   # see cache note below
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize runs register() at interpreter start and pins
# jax_platforms to "axon,cpu" — env vars alone cannot undo that here.
jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache for the CPU suite (the env opt-out
# above reaches device._enable_persistent_compile_cache, which otherwise
# force-enables the shared dir at import).  Two independent hard crashes
# ruled it out on this runtime: (a) XLA:CPU AOT executables bake in the
# compile host's feature set, and loading a previous round's entries on
# a migrated VM is a documented SIGILL risk (XLA warns exactly that);
# (b) jaxlib 0.9.0 segfaults inside
# compilation_cache.put_executable_and_time when SERIALIZING a
# multi-device shard_map executable (reproduced twice, faulthandler
# pinned the frame).  CPU test compiles are cheap; correctness wins.


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: large-scale (phim >= 4096) runs")


# Drop compiled-executable and tracing caches at every module boundary.
# The full suite compiles hundreds of multi-device executables into one
# long-lived process; on this runtime that state eventually segfaults
# XLA:CPU's backend_compile (reproduced 3/3 full-suite runs inside
# test_sharding's shard_map compiles; every module subset passes).
# Bounding the live compiler state is the mitigation — recompiles within
# a fresh module are cheap on CPU.
_last_module = [None]


def pytest_runtest_setup(item):
    mod = getattr(item, "module", None)
    name = getattr(mod, "__name__", None)
    if name != _last_module[0]:
        _last_module[0] = name
        import gc
        jax.clear_caches()
        gc.collect()
