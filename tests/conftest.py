"""Test env: force REAL CPU (the axon sitecustomize force-registers the
TPU backend otherwise) with 8 virtual devices for sharding tests, plus a
persistent compilation cache. Must run before any jax import."""
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""   # disarm axon TPU auto-registration
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize runs register() at interpreter start and pins
# jax_platforms to "axon,cpu" — env vars alone cannot undo that here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_si_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: large-scale (phim >= 4096) runs")
