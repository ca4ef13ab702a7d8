"""Driver entry points and profiling utilities."""
import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 2 and out.dtype == np.int32


def test_dryrun_multichip_small():
    import __graft_entry__ as g
    g.dryrun_multichip(4)


def test_phase_profiler():
    from fhe_si_tpu.profiling import PhaseProfiler
    prof = PhaseProfiler()
    with prof.phase("setup"):
        sum(range(1000))
    with prof.phase("encryption"):
        pass
    d = prof.as_dict()
    assert set(d) == {"setup", "encryption", "total"}
    assert "Setup time:" in prof.report()
    assert prof.as_json().startswith("{")
