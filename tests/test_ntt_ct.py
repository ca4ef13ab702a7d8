"""Cooley-Tukey large-m NTT (ops/ntt_ct.py) vs the slow direct DFT and
the dense-table path — the O(L*m)-memory scaling family (m = 2^a*q^b),
semantics of Cmodulus::FFT/iFFT (CModulus.cpp:89-132) /
bluestein.cpp:92-144 restricted to prime-power-odd-part m."""
import numpy as np
import pytest

import jax.numpy as jnp

from fhe_si_tpu.hostmath import numbth
from fhe_si_tpu.ops import ntt_ct


def _primes_for(m: int, count: int) -> list[int]:
    out = []
    t = (1 << 20) // m
    while len(out) < count and t > 0:
        q = t * m + 1
        if q < (1 << 20) and numbth.is_prime(q):
            out.append(q)
        t -= 1
    assert len(out) == count, f"not enough 20-bit primes = 1 mod {m}"
    return out


def _tables(m: int, L: int) -> ntt_ct.CtNttTables:
    primes = _primes_for(m, L)
    roots = [numbth.find_element_of_order(q, m) for q in primes]
    return ntt_ct.CtNttTables(m, primes, roots)


def _zms(m: int) -> np.ndarray:
    import math
    return np.array([t for t in range(m) if math.gcd(t, m) == 1])


def _slow_dft(t: ntt_ct.CtNttTables, res: np.ndarray) -> np.ndarray:
    """Direct evaluation at the primitive m-th roots, Python ints:
    ev[b, l, j] = sum_c res[b, l, c] * w_l^(zms[j] * c)."""
    m = t.m
    zms = _zms(m)
    primes = np.asarray(t.q)[:, 0]
    B, L, phim = res.shape
    out = np.zeros((B, L, len(zms)), dtype=np.int64)
    for l, q in enumerate(primes):
        q = int(q)
        w = int(t.roots[l])
        pw = np.empty(m, dtype=np.int64)
        acc = 1
        for i in range(m):
            pw[i] = acc
            acc = acc * w % q
        F = pw[(zms[:, None] * np.arange(phim)[None, :]) % m]
        for b in range(B):
            out[b, l] = F @ res[b, l] % q
    return out


@pytest.mark.parametrize("m", [64, 40, 96, 160, 18, 54])
def test_ct_matches_slow_dft_small(m):
    """Small rings of every family shape (2^k, 2^a*5, 2^a*3, 2*3^3):
    every output against the O(N^2) direct DFT, and exact roundtrip."""
    L = 3
    t = _tables(m, L)
    phim = t.phim
    assert phim == numbth.euler_phi(m)
    rng = np.random.default_rng(0)
    primes = np.asarray(t.q)[:, 0]
    res = np.stack([rng.integers(0, int(q), (2, phim)) for q in primes],
                   axis=1)
    x = jnp.asarray(res, jnp.int32)
    T = t.pack()
    ev = np.asarray(ntt_ct.ct_fwd(T, x, t.meta))
    assert np.array_equal(ev, _slow_dft(t, res))
    back = np.asarray(ntt_ct.ct_inv(T, jnp.asarray(ev, jnp.int32), t.meta))
    assert np.array_equal(back, res)


def test_ct_fwd_digits_matches_residue_path():
    """The prime-independent digit fast path == barrett(digits) broadcast
    through the standard forward, for 24-bit digit values (the keyswitch
    ByteDecomp radix, Ciphertext.cpp:82-121)."""
    for m in (64, 160):
        L = 3
        t = _tables(m, L)
        T = t.pack()
        rng = np.random.default_rng(1)
        digs = rng.integers(0, 1 << 24, (5, t.phim))
        d = jnp.asarray(digs, jnp.int32)
        fast = np.asarray(ntt_ct.ct_fwd_digits(T, d, t.meta, 24))
        primes = np.asarray(t.q)[:, 0]
        res = jnp.asarray(digs[:, None, :] % primes[None, :, None],
                          jnp.int32)
        want = np.asarray(ntt_ct.ct_fwd(T, res, t.meta))
        assert np.array_equal(fast, want)


def test_ct_matches_dense_context_tables():
    """m=32: CT transform == the dense evaluation matrix (the same
    closed form context.ntt_tables materializes; (Z/32)* is not cyclic
    so no slot generator/context exists — compare at the table level)."""
    m, L = 32, 4
    t = _tables(m, L)
    primes = [int(q) for q in np.asarray(t.q)[:, 0]]
    roots = [int(r) for r in t.roots]
    N = m // 2
    zms = np.arange(1, m, 2, dtype=np.int64)
    rng = np.random.default_rng(1)
    res = np.stack([rng.integers(0, q, (3, N)) for q in primes], axis=1)
    x = jnp.asarray(res, jnp.int32)
    T = t.pack()
    ev = np.asarray(ntt_ct.ct_fwd(T, x, t.meta))
    for l, (q, w) in enumerate(zip(primes, roots)):
        pw = np.empty(m, dtype=np.int64)
        acc = 1
        for i in range(m):
            pw[i] = acc
            acc = acc * w % q
        c = np.arange(N, dtype=np.int64)
        F = pw[(zms[:, None] * c[None, :]) % m]
        want = (F @ res[:, l].T % q).T
        assert np.array_equal(ev[:, l], want)


@pytest.mark.parametrize("m", [1 << 14, 20480])
def test_ct_large_phim_roundtrip_and_sparse_oracle(m):
    """phim >= 2^13 (power-of-two and mixed-radix 2^12*5): table memory
    is O(L*m) (the dense path would need ~400 MB/prime), the roundtrip
    is exact, and forward values match the closed-form DFT of sparse
    inputs."""
    L = 2
    t = _tables(m, L)
    phim = t.phim
    assert t.t1_chunks.nbytes + t.t2_chunks.nbytes < 2 * L * 6 * (
        t.N1 ** 2 + t.N2 ** 2) + 1024
    rng = np.random.default_rng(2)
    primes = np.asarray(t.q)[:, 0]
    res = np.stack([rng.integers(0, int(q), phim) for q in primes])[None]
    x = jnp.asarray(res, jnp.int32)
    T = t.pack()
    ev = ntt_ct.ct_fwd(T, x, t.meta)
    back = np.asarray(ntt_ct.ct_inv(T, ev, t.meta))
    assert np.array_equal(back, res)

    # sparse oracle: x = sum_k coeff_k X^(c_k); evals are closed-form
    nnz = 5
    zms = _zms(m)
    cs = rng.integers(0, phim, nnz)
    sparse = np.zeros((1, L, phim), dtype=np.int64)
    coeffs = rng.integers(1, 1 << 20, nnz)
    for l, q in enumerate(primes):
        for ck, vk in zip(cs, coeffs):
            sparse[0, l, ck] = (sparse[0, l, ck] + vk) % int(q)
    ev_s = np.asarray(ntt_ct.ct_fwd(T, jnp.asarray(sparse, jnp.int32),
                                    t.meta))
    for l, q in enumerate(primes):
        q = int(q)
        w = int(t.roots[l])
        pw = np.empty(m, dtype=np.int64)
        acc = 1
        for i in range(m):
            pw[i] = acc
            acc = acc * w % q
        want = np.zeros(phim, dtype=np.int64)
        for ck in set(int(c) for c in cs):
            xc = int(sparse[0, l, ck])
            want = (want + xc * pw[(zms * ck) % m]) % q
        assert np.array_equal(ev_s[0, l], want)


def test_ct_supported():
    assert ntt_ct.ct_supported(8)
    assert ntt_ct.ct_supported(8192)
    assert ntt_ct.ct_supported(40960)     # 2^13 * 5
    assert ntt_ct.ct_supported(96)        # 2^5 * 3
    assert ntt_ct.ct_supported(54)        # 2 * 27
    assert ntt_ct.ct_supported(22)        # 2 * 11
    assert not ntt_ct.ct_supported(4)     # too small
    assert not ntt_ct.ct_supported(15)    # odd
    assert not ntt_ct.ct_supported(120)   # odd part 15 = 3*5
