"""Wide residue lane (primes < 2^23, context.PRIME_MAX_BITS_WIDE):
kernel exactness vs numpy, and full scheme parity vs the oracle.

The wide lane exists because m >= 2^14 starves the sub-2^20 prime window
(only 9 primes q = 1 mod 2^14 exist below 2^20); these tests force it at
tiny m so the whole pipeline is exercised quickly on both lanes.
"""
import numpy as np
import pytest

from fhe_si_tpu import sampling, scheme
from fhe_si_tpu.context import FheContext
from fhe_si_tpu.hostmath import oracle


def wide_primes(n, m, top_bits=23):
    """n primes = 1 (mod m) just below 2^top_bits (test fixture chains)."""
    from fhe_si_tpu.hostmath import numbth
    step = m if m % 2 == 0 else 2 * m
    top = (1 << top_bits) - 1
    p = top - (top % step) + 1
    out = []
    while len(out) < n:
        while not numbth.is_prime(p):
            p -= step
        out.append(p)
        p -= step
    return out


def test_wide_modmatmul_exact():
    import jax.numpy as jnp
    from fhe_si_tpu.ops import ntt
    from fhe_si_tpu.ops.modular import mod_dot, mod_mul

    rng = np.random.default_rng(0)
    qs = np.array(wide_primes(3, 2), dtype=np.int64)
    L, n, k = 3, 7, 11
    mat = rng.integers(0, qs[:, None, None], size=(L, n, k)).astype(np.int64)
    x = rng.integers(0, qs[:, None], size=(4, L, k)).astype(np.int64)
    planes = ntt.chunk_matrix(mat, wide=True)
    assert planes.shape[0] == ntt.N_PLANES_W
    q = jnp.asarray(qs[:, None], jnp.int32)
    qinv = jnp.asarray((1.0 / qs[:, None]).astype(np.float32))
    out = np.asarray(ntt.modmatmul(jnp.asarray(planes),
                                   jnp.asarray(x, jnp.int32), q, qinv))
    ref = np.stack([(mat[None, l] @ x[:, l, :, None])[..., 0] % qs[l]
                    for l in range(L)], axis=1)
    assert np.array_equal(out, ref)

    a = jnp.asarray(rng.integers(0, qs[:, None], size=(5, L, 9)), jnp.int32)
    b = jnp.asarray(rng.integers(0, qs[:, None], size=(5, L, 9)), jnp.int32)
    mm = np.asarray(mod_mul(a, b, q, qinv, wide=True))
    refm = (np.asarray(a).astype(np.int64) * np.asarray(b)) % qs[None, :, None]
    assert np.array_equal(mm, refm)

    K = 48
    a = jnp.asarray(rng.integers(0, qs[None, :, None], size=(K, L, 6)), jnp.int32)
    b = jnp.asarray(rng.integers(0, qs[None, :, None], size=(K, L, 6)), jnp.int32)
    md = np.asarray(mod_dot(a, b, q, qinv, axis=0, wide=True))
    refd = (np.asarray(a).astype(np.int64) * np.asarray(b)).sum(0) % qs[:, None]
    assert np.array_equal(md, refd)


def run_scheme_parity(ctx: FheContext, seed: int = 77):
    """Standard encrypt/mul+relin/automorph/decrypt circuit, device vs
    oracle on identical randomness — reused by the lane/family suites."""
    src_d, src_o = sampling.RandomSource(seed), sampling.RandomSource(seed)
    kg_d = sampling.sample_keygen(src_d, ctx.phim, ctx.stdev, ctx.log_q)
    kg_o = sampling.sample_keygen(src_o, ctx.phim, ctx.stdev, ctx.log_q)
    sk_d, pk_d = scheme.keygen(ctx, kg_d)
    sk_o, pk_o = oracle.keygen(ctx, kg_o)

    def enc_pair():
        msg = src_d.uniform_mod_p(ctx.phim, ctx.p)
        src_o.uniform_mod_p(ctx.phim, ctx.p)
        e_d = sampling.sample_encrypt(src_d, ctx.phim, ctx.stdev)
        e_o = sampling.sample_encrypt(src_o, ctx.phim, ctx.stdev)
        return (msg, pk_d.encrypt(scheme.Plaintext(ctx, msg), e_d),
                oracle.encrypt(pk_o, msg, e_o))

    m1, c1_d, c1_o = enc_pair()
    m2, c2_d, c2_o = enc_pair()
    assert c1_d.to_python_parts() == c1_o.parts

    kr_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev, ctx.log_q,
                                     3, ctx.ndigits)
    kr_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev, ctx.log_q,
                                     3, ctx.ndigits)
    ksw_d = scheme.KeySwitch.for_relinearization(sk_d, kr_d)
    ksw_o = oracle.keyswitch_init_s2(sk_o, kr_o)
    cm_d = ksw_d.apply(c1_d * c2_d)
    cm_o = oracle.apply_keyswitch(ksw_o, oracle.mul(c1_o, c2_o))
    assert cm_d.to_python_parts() == cm_o.parts
    assert list(sk_d.decrypt(cm_d).message) == list(
        oracle.plaintext_mul(ctx, m1, m2))

    # automorph + keyswitch rotation by g
    g = ctx.generator
    ar_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev, ctx.log_q,
                                     2, ctx.ndigits)
    ar_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev, ctx.log_q,
                                     2, ctx.ndigits)
    ka_d = scheme.KeySwitch.for_automorph(sk_d, g, ar_d)
    ka_o = oracle.keyswitch_init_automorph(sk_o, g, ar_o)
    cr_d = ka_d.apply(c1_d >> g)
    cr_o = oracle.apply_keyswitch(ka_o, oracle.automorph(c1_o, g))
    assert cr_d.to_python_parts() == cr_o.parts
    assert list(sk_d.decrypt(cr_d).message) == list(
        oracle.plaintext_rotate(ctx, m1, 1))


def test_wide_lane_scheme_parity():
    ctx = FheContext(m=22, log_q=80, p=23, generator=7, prime_bits=23)
    assert ctx.wide and ctx.prime_bits == 23
    run_scheme_parity(ctx)


def test_decomp_size_4_parity():
    """decompSize=4 (32-bit digit radix, FHEContext.h:91-99): digits ride
    two 16-bit limb planes (ops/limbs.byte_decomp_planes) — narrow lane."""
    ctx = FheContext(m=22, log_q=80, p=23, generator=7, decomp_size=4)
    assert ctx.digit_bits == 32 and ctx.ndigits == 3
    run_scheme_parity(ctx)


def test_decomp_size_5_wide_parity():
    """decompSize=5 (40-bit radix, 3 planes) on the wide lane — the
    digit-plane Horner's 6+6+4 hop pattern."""
    ctx = FheContext(m=22, log_q=96, p=23, generator=7, decomp_size=5,
                     prime_bits=23)
    assert ctx.digit_bits == 40 and ctx.ndigits == 3 and ctx.wide
    run_scheme_parity(ctx)
