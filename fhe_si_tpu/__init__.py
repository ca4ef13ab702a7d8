"""fhe_si_tpu — TPU-native scale-invariant somewhat-homomorphic encryption.

A from-scratch JAX/XLA implementation with the capabilities of the
reference FHE-SI library (Brakerski 2012/078, dwu4/fhe-si): DoubleCRT
residue arithmetic, exact MXU-matmul NTTs, limb-domain big-int rounding,
key switching, slot packing, and the encrypted regression / statistics
workloads — designed for TPU hardware (int32 lanes, static shapes,
SPMD sharding) rather than translated from the reference's NTL/C++.
"""
from . import sampling  # noqa: F401
from .context import FheContext  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # lazy heavy imports (jax) so host-only uses stay light
    if name in ("scheme", "serialization", "doublecrt", "device", "profiling",
                "indexmap", "apps", "parallel"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
