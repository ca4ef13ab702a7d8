"""Structured phase timing + device tracing (SURVEY §5: tracing/profiling).

The reference prints ad-hoc clock() deltas per phase (Test_Regression.cpp:
24-64, Test_Statistics.cpp:112-173).  This module keeps the same phase
names for comparability, collects them structurally, and can wrap a region
in a jax.profiler trace for TPU timeline capture.

Usage:
    prof = PhaseProfiler()
    with prof.phase("encryption"):
        ...
    print(prof.report())          # human-readable, reference-style
    prof.as_dict()                # structured {phase: seconds}

    with device_trace("/tmp/trace"):   # XLA/TPU profiler capture
        ...
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import OrderedDict


class PhaseProfiler:
    REFERENCE_PHASES = ("setup", "batch", "encryption", "computation",
                        "decryption", "total")

    def __init__(self):
        self.times: "OrderedDict[str, float]" = OrderedDict()
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - start)

    def total(self) -> float:
        return time.perf_counter() - self._t0

    def report(self) -> str:
        lines = [f"{name.capitalize()} time: {secs:.2f}"
                 for name, secs in self.times.items()]
        lines.append(f"Total time: {self.total():.2f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        d = dict(self.times)
        d["total"] = self.total()
        return d

    def as_json(self) -> str:
        return json.dumps(self.as_dict())


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a device trace (jax.profiler.TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
