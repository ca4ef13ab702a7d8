"""Kernel-level exactness tests: every device primitive against Python ints."""
import numpy as np
import pytest

import jax.numpy as jnp

from fhe_si_tpu.context import FheContext, int_to_limbs, limbs_to_int
from fhe_si_tpu.device import device_context
from fhe_si_tpu.hostmath.oracle import reduce_coeff
from fhe_si_tpu.ops import crt, limbs as lb, modular


@pytest.fixture(scope="module")
def ctx():
    return FheContext(m=22, log_q=80, p=23, generator=7)


@pytest.fixture(scope="module")
def dev(ctx):
    return device_context(ctx)


def test_barrett_and_modmul_randomized():
    rng = np.random.default_rng(0)
    for qv in (524309, 1048433, 23, 3, 999983):
        q = jnp.int32(qv)
        qinv = jnp.float32(1.0 / qv)
        # barrett over the full int32 t range (pos and neg)
        t = rng.integers(-2 ** 31 + 1, 2 ** 31 - 1, 4096, dtype=np.int64)
        # keep |t|/q below the f32 error budget used in production paths
        t = t[np.abs(t) < qv * (1 << 20)]
        got = np.asarray(modular.barrett(jnp.asarray(t, jnp.int32), q, qinv))
        assert np.array_equal(got, t % qv)
    # full-width modmul for 20-bit primes
    for qv in (1048433, 524309, 999983):
        q = jnp.int32(qv)
        qinv = jnp.float32(1.0 / qv)
        a = rng.integers(0, qv, 8192, dtype=np.int64)
        b = rng.integers(0, qv, 8192, dtype=np.int64)
        got = np.asarray(modular.mod_mul(jnp.asarray(a, jnp.int32),
                                         jnp.asarray(b, jnp.int32), q, qinv))
        assert np.array_equal(got, (a * b) % qv)


def test_mod_dot_randomized():
    """mod_dot (keyswitch dot, deferred reduction) vs Python ints, at the
    production term count (parts*ndigits = 24) and the 512-term bound."""
    rng = np.random.default_rng(1)
    for qv in (1048433, 524309, 23):
        q = jnp.int32(qv)
        qinv = jnp.float32(1.0 / qv)
        for K in (1, 24, 512):
            a = rng.integers(0, qv, (K, 257), dtype=np.int64)
            b = rng.integers(0, qv, (K, 257), dtype=np.int64)
            got = np.asarray(modular.mod_dot(
                jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32),
                q, qinv, axis=0))
            assert np.array_equal(got, (a * b).sum(axis=0) % qv)


def test_limb_add_mul_shift(ctx, dev):
    rng = np.random.default_rng(1)
    n = ctx.n_limbs
    mod = 1 << (16 * n)
    xs = [int(rng.integers(-2 ** 62, 2 ** 62)) * int(rng.integers(0, 2 ** 50))
          for _ in range(32)]
    ys = [int(rng.integers(-2 ** 62, 2 ** 62)) for _ in range(32)]
    xl = jnp.asarray(np.stack([int_to_limbs(v, n) for v in xs]))
    yl = jnp.asarray(np.stack([int_to_limbs(v, n) for v in ys]))

    s = np.asarray(lb.add(xl, yl))
    for i in range(32):
        assert limbs_to_int(s[i], signed=False) == (xs[i] + ys[i]) % mod

    d = np.asarray(lb.sub(xl, yl))
    for i in range(32):
        assert limbs_to_int(d[i], signed=False) == (xs[i] - ys[i]) % mod

    c = 37813  # < 2^20
    m = np.asarray(lb.mul_small(xl, c))
    for i in range(32):
        assert limbs_to_int(m[i], signed=False) == (xs[i] * c) % mod

    for shift in (1, 16, 33, ctx.log_q + 1):
        sh = np.asarray(lb.arith_shift_right(xl, shift))
        for i in range(32):
            assert limbs_to_int(sh[i]) == limbs_to_int(int_to_limbs(xs[i], n)) >> shift
        sl = np.asarray(lb.shift_left(xl, shift))
        for i in range(32):
            assert limbs_to_int(sl[i], signed=False) == (xs[i] << shift) % mod


def test_reduce_mod_q(ctx, dev):
    rng = np.random.default_rng(2)
    xs = [int(rng.integers(-2 ** 63, 2 ** 63)) for _ in range(64)]
    xl = jnp.asarray(np.stack([int_to_limbs(v, ctx.n_limbs) for v in xs]))
    s = np.asarray(lb.reduce_mod_q(xl, ctx.log_q, False, dev.q_limbs))
    p = np.asarray(lb.reduce_mod_q(xl, ctx.log_q, True, dev.q_limbs))
    for i, v in enumerate(xs):
        assert limbs_to_int(s[i]) == reduce_coeff(v, ctx.log_q)
        assert limbs_to_int(p[i], signed=False) == reduce_coeff(v, ctx.log_q, True)


def test_byte_decomp(ctx, dev):
    rng = np.random.default_rng(3)
    xs = [int(rng.integers(-2 ** 63, 2 ** 63)) for _ in range(32)]
    xl = jnp.asarray(np.stack([int_to_limbs(v, ctx.n_limbs) for v in xs]))
    digs = np.asarray(lb.byte_decomp(xl, ctx.log_q, ctx.digit_bits,
                                     ctx.ndigits, dev.q_limbs))
    for i, v in enumerate(xs):
        pos = reduce_coeff(v, ctx.log_q, True)
        for j in range(ctx.ndigits):
            want = (pos >> (ctx.digit_bits * j)) & ((1 << ctx.digit_bits) - 1)
            assert digs[i, j] == want


def test_crt_roundtrip_and_residues(ctx, dev):
    rng = np.random.default_rng(4)
    P = ctx.prime_product
    vals = []
    for _ in range(ctx.phim):
        v = int(rng.integers(0, 2 ** 63)) * int(rng.integers(0, 2 ** 63)) % P
        vals.append(v - P if v > P // 2 else v)
    # include boundary-ish values
    vals[0], vals[1], vals[2] = 0, P // 2, -(P // 2)
    poly = jnp.asarray(np.stack([int_to_limbs(v, ctx.n_limbs) for v in vals]))[None]
    res = crt.limbs_to_residues(poly, dev.chunk_tbl, dev.wrap, dev.q, dev.qinv_f)
    want = np.array([[v % int(q) for v in vals] for q in ctx.primes])
    assert np.array_equal(np.asarray(res)[0], want)
    back = crt.residues_to_limbs(res, dev.garner, dev.q, dev.qinv_f, ctx.n_limbs)
    got = [limbs_to_int(np.asarray(back)[0, j]) for j in range(ctx.phim)]
    assert got == vals

    # mod-p path
    mp = np.asarray(crt.limbs_to_mod_small(poly, dev.p_chunk_tbl, dev.p_wrap,
                                           dev.p, dev.pinv_f))
    assert np.array_equal(mp[0], np.array([v % ctx.p for v in vals]))


def test_fast_crt_equals_garner(ctx, dev):
    """Single-pass redundant-modulus reconstruction must equal the Garner
    scan bit-for-bit on values within the CRT budget |E| < P/2."""
    rng = np.random.default_rng(7)
    P = ctx.crt_product
    vals = []
    for _ in range(ctx.phim):
        v = int(rng.integers(0, 2 ** 63)) * int(rng.integers(0, 2 ** 63)) % P
        vals.append(v - P if v > P // 2 else v)
    vals[0], vals[1], vals[2] = 0, P // 2 - 1, -(P // 2 - 1)
    res = np.array([[v % int(q) for v in vals] for q in ctx.primes])[None]
    res = jnp.asarray(res, jnp.int32)
    fast = crt.residues_to_limbs_fast(res, dev.fast_crt, dev.q, dev.qinv_f,
                                      ctx.n_limbs)
    garner = crt.residues_to_limbs(res, dev.garner, dev.q, dev.qinv_f,
                                   ctx.n_limbs)
    assert np.array_equal(np.asarray(fast), np.asarray(garner))
    got = [limbs_to_int(np.asarray(fast)[0, j]) for j in range(ctx.phim)]
    assert got == vals


def test_crt_partials_mxu_parity(ctx, dev):
    """The MXU digit-matmul CRT accumulation (crt_partials_mxu) must
    yield bit-identical reconstructions to the elementwise path for
    prescaled residues — across random inputs, both subset bases, and
    the full chain."""
    rng = np.random.default_rng(11)
    for T in (dev._full_as_subset(dev.C), dev.C['ksw'] or dev._full_as_subset(dev.C),
              dev.C['lin'] or dev._full_as_subset(dev.C)):
        fc = T['fast_crt']
        L = T['q'].shape[0]
        res = np.stack([rng.integers(0, int(q), (3, ctx.phim))
                        for q in np.asarray(T['q'])[:, 0]], axis=1)
        x = jnp.asarray(res, jnp.int32)
        a1, s1, e1 = crt.crt_partials(x, fc, T['q'], T['qinv_f'],
                                      prescaled=True)
        a2, s2, e2 = crt.crt_partials_mxu(x, fc, T['q'], T['qinv_f'])
        n = fc['B'].shape[-1]
        f1 = crt.crt_finish(a1, s1, e1, fc, n)
        f2 = crt.crt_finish(a2, s2, e2, fc, n)
        assert np.array_equal(np.asarray(f1), np.asarray(f2))
        assert np.array_equal(np.asarray(s1), np.asarray(s2))
        assert np.array_equal(np.asarray(e1), np.asarray(e2))


def test_ntt_roundtrip_and_dft_oracle(ctx, dev):
    """Matmul NTT against the slow direct DFT (the analog of the reference's
    debug tDFT oracle, bluestein.cpp:148-172)."""
    rng = np.random.default_rng(5)
    res = rng.integers(0, 1, (1, ctx.num_primes, ctx.phim), dtype=np.int64)
    for l in range(ctx.num_primes):
        res[0, l] = rng.integers(0, int(ctx.primes[l]), ctx.phim)
    x = jnp.asarray(res, jnp.int32)
    ev = np.asarray(dev.ntt_fwd(x))
    for l in (0, ctx.num_primes - 1):
        q, w = int(ctx.primes[l]), int(ctx.roots[l])
        for j, t in enumerate(ctx.zms):
            want = sum(int(res[0, l, c]) * pow(w, int(t) * c, q)
                       for c in range(ctx.phim)) % q
            assert ev[0, l, j] == want
    back = np.asarray(dev.ntt_inv(jnp.asarray(ev, jnp.int32)))
    assert np.array_equal(back, res)


@pytest.mark.parametrize("m,log_q,p,g,xi", [
    (22, 80, 23, 7, 1),
    # adversarial: odd logQ (ragged top digit), p within 3 of the 2^20
    # prime cap, xi > 1 — stresses every term of the derived bounds
    (38, 113, 1048573, 3, 7),
    # extension-field slots (ord_m(p) = d > 1) share the same bounds
    (31, 96, 2, 3, 1),
])
def test_ksw_subset_basis_equals_full(m, log_q, p, g, xi):
    """The keyswitch subset basis (context.ksw_value_primes, derived
    bound exact_bounds['ksw']) must produce bit-identical keyswitch
    outputs to the full chain: the dot product is exact in both bases."""
    from fhe_si_tpu import sampling, scheme

    def run(force_full: bool):
        c = FheContext(m=m, log_q=log_q, p=p, generator=g, xi=xi)
        if force_full:
            c.__dict__['ksw_value_primes'] = c.num_primes - 1
        src = sampling.RandomSource(31)
        sk, pk = scheme.keygen(c, src)
        ksw = scheme.KeySwitch.for_relinearization(sk, src)
        m1 = src.uniform_mod_p(c.phim, c.p)
        m2 = src.uniform_mod_p(c.phim, c.p)
        c1 = pk.encrypt(scheme.Plaintext(c, m1), src)
        c2 = pk.encrypt(scheme.Plaintext(c, m2), src)
        out = ksw.apply(c1 * c2)
        return np.asarray(out.parts), c

    full, cf = run(True)
    sub, cs = run(False)
    assert cf.ksw_value_primes == cf.num_primes - 1
    assert cs.ksw_value_primes < cs.num_primes - 1, \
        "subset did not engage at this config"
    assert np.array_equal(full, sub)


def test_lin_subset_basis_equals_full():
    """The linear-op subset basis (context.lin_value_primes, derived
    bounds exact_bounds['enc'/'dec'/'auto'/'mulc']) must produce
    bit-identical encrypt/decrypt/automorph/const-mul results to the
    full chain."""
    from fhe_si_tpu import sampling, scheme

    def run(force_full: bool):
        c = FheContext(m=22, log_q=80, p=23, generator=7)
        if force_full:
            c.__dict__['lin_value_primes'] = c.num_primes - 1
        src = sampling.RandomSource(77)
        sk, pk = scheme.keygen(c, src)
        m1 = src.uniform_mod_p(c.phim, c.p)
        cv = src.uniform_mod_p(c.phim, c.p)
        c1 = pk.encrypt(scheme.Plaintext(c, m1), src)
        rot = c1.automorph(c.generator)           # wide, full-chain route
        mc = c1 * scheme.Plaintext(c, cv)
        dec = sk.decrypt(rot)
        return (np.asarray(c1.parts), np.asarray(rot.parts),
                np.asarray(mc.parts), np.asarray(dec.message), c)

    f_ct, f_rot, f_mc, f_dec, cf = run(True)
    s_ct, s_rot, s_mc, s_dec, cs = run(False)
    assert cf.lin_value_primes == cf.num_primes - 1
    assert cs.lin_value_primes < cs.num_primes - 1
    assert np.array_equal(f_ct, s_ct)
    assert np.array_equal(f_mc, s_mc)
    assert np.array_equal(f_dec, s_dec)
    # the automorph output width differs by basis (it is the basis
    # reconstruction width) but the VALUES are the same exact integers
    from fhe_si_tpu.context import limbs_to_int as l2i
    vf = [[l2i(f_rot[i, j]) for j in range(f_rot.shape[1])] for i in range(2)]
    vs = [[l2i(s_rot[i, j]) for j in range(s_rot.shape[1])] for i in range(2)]
    assert vf == vs
