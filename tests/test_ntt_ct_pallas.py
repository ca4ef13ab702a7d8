"""Fused Pallas CT kernels (ops/ntt_ct_pallas.py) vs the XLA path —
bit-identical on every variant (forward residues, forward digits,
inverse, both t2i tables), run in interpreter mode on CPU; the same
parity is asserted on the real TPU by the bench/profiling flows."""
import numpy as np
import pytest

import jax.numpy as jnp

from fhe_si_tpu.hostmath import numbth
from fhe_si_tpu.ops import ntt_ct, ntt_ct_pallas as ctp


def _tables(m, L):
    primes = []
    t = (1 << 20) // m
    while len(primes) < L:
        q = t * m + 1
        if q < (1 << 20) and numbth.is_prime(q):
            primes.append(q)
        t -= 1
    roots = [numbth.find_element_of_order(q, m) for q in primes]
    return ntt_ct.CtNttTables(m, primes, roots)


def test_pallas_matches_xla_all_variants():
    tab = _tables(256, 3)
    T = tab.pack()
    rng = np.random.default_rng(0)
    N = tab.N
    # digits (with a non-multiple-of-BM row count: exercises padding)
    digs = jnp.asarray(rng.integers(0, 1 << 24, (70, N)), jnp.int32)
    want = np.asarray(ntt_ct.ct_fwd_digits(T, digs, tab.meta, 24))
    got = np.asarray(ctp.ct_fwd_digits(T, digs, tab.meta, 24,
                                       interpret=True))
    assert np.array_equal(got, want)
    # residues forward + inverse roundtrip
    primes = np.asarray(tab.q)[:, 0]
    res = jnp.asarray(np.stack([rng.integers(0, int(q), (5, N))
                                for q in primes], 1), jnp.int32)
    ev_want = np.asarray(ntt_ct.ct_fwd(T, res, tab.meta))
    ev = np.asarray(ctp.ct_fwd(T, res, tab.meta, interpret=True))
    assert np.array_equal(ev, ev_want)
    back = np.asarray(ctp.ct_inv(T, jnp.asarray(ev), tab.meta,
                                 interpret=True))
    assert np.array_equal(back, np.asarray(res))


def test_pallas_supported_predicate():
    tab = _tables(256, 2)
    assert ctp.supported(tab.meta, wide=False)
    assert not ctp.supported(tab.meta, wide=True)
    mixed = ntt_ct.CtMeta(8, 8, 64, 5)            # q_odd != 1
    assert not ctp.supported(mixed, wide=False)
    tiny = ntt_ct.CtMeta(4, 4, 16, 1)             # stage factor < 8
    assert not ctp.supported(tiny, wide=False)


def test_device_context_pallas_flag_off_on_cpu():
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context
    ctx = FheContext(m=256, log_q=80, p=257, generator=3)
    dev = device_context(ctx)
    assert dev.use_ct and not dev.ct_pallas       # CPU suite: XLA path
