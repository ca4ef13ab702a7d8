"""Plaintext modulus beyond 2^20 (reference p is an arbitrary NTL ZZ,
FHEContext.h:91-99): full device-vs-oracle parity at p ~ 2^24 and
p ~ 2^30, exercising the quotient-estimate decrypt tail
(ops/limbs.mod_p_bounded), the 3-plane q/p message scaling, and the
blocked host embed/decode."""
import numpy as np
import pytest

import jax.numpy as jnp

from fhe_si_tpu import sampling, scheme
from fhe_si_tpu.context import FheContext
from fhe_si_tpu.hostmath import oracle
from fhe_si_tpu.ops import limbs as lb

def _find_p(m: int, near_bits: int) -> int:
    """Largest prime p with m | p-1 below 2^near_bits (d = 1 slots)."""
    from fhe_si_tpu.hostmath import numbth
    p = (1 << near_bits) - 1
    p -= (p - 1) % m
    while not numbth.is_prime(p):
        p -= m
    return p


@pytest.mark.parametrize("m,log_q,bits", [(22, 120, 24), (22, 140, 30)])
def test_scheme_parity_large_p(m, log_q, bits):
    p = _find_p(m, bits)
    assert p.bit_length() == bits and (p - 1) % m == 0
    ctx = FheContext(m=m, log_q=log_q, p=p, generator=7)
    assert ctx.slot_degree == 1

    src_d, src_o = sampling.RandomSource(17), sampling.RandomSource(17)
    kg_d = sampling.sample_keygen(src_d, ctx.phim, ctx.stdev, ctx.log_q)
    kg_o = sampling.sample_keygen(src_o, ctx.phim, ctx.stdev, ctx.log_q)
    sk_d, pk_d = scheme.keygen(ctx, kg_d)
    sk_o, pk_o = oracle.keygen(ctx, kg_o)

    m1 = src_d.uniform_mod_p(ctx.phim, ctx.p)
    src_o.uniform_mod_p(ctx.phim, ctx.p)
    m2 = src_d.uniform_mod_p(ctx.phim, ctx.p)
    src_o.uniform_mod_p(ctx.phim, ctx.p)

    def enc(msg):
        er_d = sampling.sample_encrypt(src_d, ctx.phim, ctx.stdev)
        er_o = sampling.sample_encrypt(src_o, ctx.phim, ctx.stdev)
        return (pk_d.encrypt(scheme.Plaintext(ctx, msg), er_d),
                oracle.encrypt(pk_o, msg, er_o))

    c1_d, c1_o = enc(m1)
    c2_d, c2_o = enc(m2)
    assert c1_d.to_python_parts() == c1_o.parts

    # fresh decrypt (large-p tail) and add
    assert list(sk_d.decrypt(c1_d).message) == oracle.decrypt(sk_o, c1_o)
    assert list(sk_d.decrypt(c1_d).message) == list(m1 % ctx.p)
    assert (c1_d + c2_d).to_python_parts() == oracle.add(c1_o, c2_o).parts

    # mul + relinearize
    kr_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev, ctx.log_q,
                                     3, ctx.ndigits)
    kr_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev, ctx.log_q,
                                     3, ctx.ndigits)
    ksw_d = scheme.KeySwitch.for_relinearization(sk_d, kr_d)
    ksw_o = oracle.keyswitch_init_s2(sk_o, kr_o)
    cm_d = ksw_d.apply(c1_d * c2_d)
    cm_o = oracle.apply_keyswitch(ksw_o, oracle.mul(c1_o, c2_o))
    assert cm_d.to_python_parts() == cm_o.parts
    assert list(sk_d.decrypt(cm_d).message) == oracle.decrypt(sk_o, cm_o)
    assert list(sk_d.decrypt(cm_d).message) == list(
        oracle.plaintext_mul(ctx, m1, m2))

    # rotate (automorph + keyswitch) and const ops
    k = ctx.generator
    ar_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev, ctx.log_q,
                                     2, ctx.ndigits)
    ar_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev, ctx.log_q,
                                     2, ctx.ndigits)
    ka_d = scheme.KeySwitch.for_automorph(sk_d, k, ar_d)
    ka_o = oracle.keyswitch_init_automorph(sk_o, k, ar_o)
    cr_d = ka_d.apply(c1_d >> k)
    cr_o = oracle.apply_keyswitch(ka_o, oracle.automorph(c1_o, k))
    assert cr_d.to_python_parts() == cr_o.parts
    assert list(sk_d.decrypt(cr_d).message) == list(
        oracle.plaintext_rotate(ctx, m1, 1))

    cv = src_d.uniform_mod_p(ctx.phim, ctx.p)
    src_o.uniform_mod_p(ctx.phim, ctx.p)
    pt = scheme.Plaintext(ctx, cv)
    assert (c1_d + pt).to_python_parts() == oracle.add_const(c1_o, cv).parts
    assert (c1_d * pt).to_python_parts() == oracle.mul_const(c1_o, cv).parts

    # slot embed/decode round trip (blocked host matmuls)
    vals = src_d.uniform_mod_p(ctx.usable_slots, ctx.p)
    pt2 = scheme.Plaintext.from_slots(ctx, vals)
    assert list(pt2.decode_slots()[:ctx.usable_slots]) == list(vals % ctx.p)


def test_mod_p_bounded_unit():
    """mod_p_bounded against Python ints over sign, magnitude, and p."""
    from fhe_si_tpu.context import ints_to_limbs
    rng = np.random.default_rng(0)
    for p in [(1 << 20) + 7, (1 << 24) + 43, (1 << 30) - 35, 999999937]:
        K = 2000
        vals = [int(v) for v in rng.integers(-K * p, K * p, 256)]
        vals += [0, 1, -1, p, -p, K * p - 1, -(K * p) + 1, p - 1, -(p - 1)]
        n = 8
        y = jnp.asarray(ints_to_limbs(vals, n))
        got = np.asarray(lb.mod_p_bounded(
            y, jnp.asarray(ints_to_limbs([p], 4)[0]), jnp.float32(p), 2048))
        want = [v % p for v in vals]
        assert got.tolist() == want


def test_mul_small_three_plane():
    """mul_small for multipliers up to 2^31 (covers 2p at the p cap)."""
    from fhe_si_tpu.context import ints_to_limbs, limbs_to_int
    rng = np.random.default_rng(1)
    vals = [(int(a) << 64) + int(b)
            for a, b in zip(rng.integers(-2**36, 2**36, 64),
                            rng.integers(0, 2**63, 64))]
    n = 9
    a = jnp.asarray(ints_to_limbs(vals, n))
    for c in [1, 1023, (1 << 20) - 1, (1 << 20), (1 << 29) + 12345,
              (1 << 31) - 1]:
        out = np.asarray(lb.mul_small(a, jnp.int32(c)))
        mask = (1 << (16 * n)) - 1
        for i, v in enumerate(vals):
            got = limbs_to_int(out[i], signed=False)
            assert got == (v * c) & mask, (c, i)
