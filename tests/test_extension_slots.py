"""Extension-field plaintext slots (ord_m(p) = d > 1).

The reference factors Phi_m mod p with SFCanZass into irreducible factors
of any degree and builds GF(p^d) slots from them
(PlaintextSpace.cpp:22-144); all its *shipped* configs use m | p-1 (d=1).
These tests cover the general case the shipped configs dodge: factor
identities, embed/decode over GF(p^d), the automorph-by-g = cyclic-shift
slot order, and full device-vs-oracle scheme parity at two m ∤ p-1
configs."""
import numpy as np
import pytest

from fhe_si_tpu import sampling, scheme
from fhe_si_tpu.context import FheContext
from fhe_si_tpu.hostmath import gf, numbth, oracle

# (m, p, g, expected d): ord_31(2)=5 -> 6 slots; ord_13(5)=4 -> 3 slots
CONFIGS = [(31, 2, 3, 5), (13, 5, 2, 4)]


@pytest.mark.parametrize("m,p,g,d", CONFIGS)
def test_slot_factor_identities(m, p, g, d):
    dd, exps, facs = gf.cyclotomic_slot_factors(m, p, g)
    assert dd == d
    phim = numbth.euler_phi(m)
    assert len(facs) == phim // d
    assert len(set(map(tuple, facs))) == len(facs)      # distinct
    prod = [1]
    for f in facs:
        assert len(f) == d + 1 and f[-1] == 1           # monic degree d
        prod = gf.pmul(prod, f, p)
    assert prod == gf.trim([c % p for c in numbth.cyclotomic(m)])


@pytest.mark.parametrize("m,p,g,d", CONFIGS)
def test_embed_decode_roundtrip(m, p, g, d):
    ctx = FheContext(m=m, log_q=80, p=p, generator=g)
    assert ctx.slot_degree == d
    S = ctx.total_slots
    assert S == ctx.phim // d
    assert ctx.usable_slots == 1 << (S.bit_length() - 1)
    rng = np.random.default_rng(7)

    # full GF(p^d) slot values round-trip
    vals = rng.integers(0, p, size=(S, d))
    dec = ctx.decode_slots(ctx.embed_in_slots(vals, only_usable=False))
    assert np.array_equal(dec, vals)

    # constants restricted to usable slots (EmbedInSlots onlyUsable)
    consts = rng.integers(0, p, size=S)
    dec = ctx.decode_slots(ctx.embed_in_slots(consts))
    u = ctx.usable_slots
    assert np.array_equal(dec[:u, 0], consts[:u])
    assert not dec[:u, 1:].any() and not dec[u:].any()

    # CRT orthogonality: the embed of a unit vector is 1 mod its own
    # factor and 0 mod every other (crtCoeffs, PlaintextSpace.cpp:44-51)
    e0 = np.zeros(S, dtype=np.int64)
    e0[1] = 1
    poly = [int(c) for c in ctx.embed_in_slots(e0, only_usable=False)]
    for j in range(S):
        r = gf.pmod(poly, list(ctx.slot_factors[j]), p)
        assert r == ([1] if j == 1 else [])


@pytest.mark.parametrize("m,p,g,d", CONFIGS)
def test_automorph_by_g_is_cyclic_slot_shift(m, p, g, d):
    """X -> X^g on an embedded constant vector shifts slots by one
    (new[j] = old[j+1]) — the property the reference's FindSlots/
    ReorderSlots establishes (PlaintextSpace.cpp:69-110), and the same
    shift Plaintext::operator>>= 1 performs (Plaintext.h:88-97)."""
    ctx = FheContext(m=m, log_q=80, p=p, generator=g)
    rng = np.random.default_rng(3)
    consts = rng.integers(0, p, size=ctx.total_slots)
    poly = ctx.embed_in_slots(consts, only_usable=False)

    ct = oracle.OracleCiphertext(ctx, parts=[[int(c) for c in poly]])
    rotated_poly = np.array(oracle.automorph(ct, g).parts[0]) % p
    dec = ctx.decode_slots(rotated_poly)
    assert np.array_equal(dec[:, 0], np.roll(consts, -1))
    assert not dec[:, 1:].any()
    # Plaintext-side rotation agrees on constants
    assert np.array_equal(oracle.plaintext_rotate(ctx, poly, 1), rotated_poly)


@pytest.mark.parametrize("m,p,g,d", CONFIGS)
def test_scheme_parity_extension_slots(m, p, g, d):
    """Device path vs oracle, bit-exact, at m ∤ p-1: encrypt/decrypt,
    mul+relin, rotate (automorph + keyswitch) on slot-constant messages."""
    ctx = FheContext(m=m, log_q=80, p=p, generator=g)
    sd, so = sampling.RandomSource(42), sampling.RandomSource(42)
    sk_d, pk_d = scheme.keygen(
        ctx, sampling.sample_keygen(sd, ctx.phim, ctx.stdev, ctx.log_q))
    sk_o, pk_o = oracle.keygen(
        ctx, sampling.sample_keygen(so, ctx.phim, ctx.stdev, ctx.log_q))

    consts1 = sd.uniform_mod_p(ctx.total_slots, p)
    so.uniform_mod_p(ctx.total_slots, p)
    consts2 = sd.uniform_mod_p(ctx.total_slots, p)
    so.uniform_mod_p(ctx.total_slots, p)
    m1 = ctx.embed_in_slots(consts1, only_usable=False)
    m2 = ctx.embed_in_slots(consts2, only_usable=False)

    def enc(msg):
        cd = pk_d.encrypt(scheme.Plaintext(ctx, msg),
                          sampling.sample_encrypt(sd, ctx.phim, ctx.stdev))
        co = oracle.encrypt(pk_o, msg,
                            sampling.sample_encrypt(so, ctx.phim, ctx.stdev))
        return cd, co

    c1d, c1o = enc(m1)
    c2d, c2o = enc(m2)
    assert c1d.to_python_parts() == c1o.parts
    assert list(sk_d.decrypt(c1d).message) == oracle.decrypt(sk_o, c1o) == list(m1)

    # mul + relinearize: slots multiply in GF(p^d) (constants stay constants)
    kr_d = sampling.sample_keyswitch(sd, ctx.phim, ctx.stdev, ctx.log_q, 3,
                                     ctx.ndigits)
    kr_o = sampling.sample_keyswitch(so, ctx.phim, ctx.stdev, ctx.log_q, 3,
                                     ctx.ndigits)
    ksw_d = scheme.KeySwitch.for_relinearization(sk_d, kr_d)
    ksw_o = oracle.keyswitch_init_s2(sk_o, kr_o)
    cm_d = ksw_d.apply(c1d * c2d)
    cm_o = oracle.apply_keyswitch(ksw_o, oracle.mul(c1o, c2o))
    assert cm_d.to_python_parts() == cm_o.parts
    got = ctx.decode_slots(np.asarray(sk_d.decrypt(cm_d).message))
    assert np.array_equal(got[:, 0], consts1 * consts2 % p)
    assert not got[:, 1:].any()

    # rotation: automorph by g + keyswitch == cyclic slot shift
    ar_d = sampling.sample_keyswitch(sd, ctx.phim, ctx.stdev, ctx.log_q, 2,
                                     ctx.ndigits)
    ar_o = sampling.sample_keyswitch(so, ctx.phim, ctx.stdev, ctx.log_q, 2,
                                     ctx.ndigits)
    ka_d = scheme.KeySwitch.for_automorph(sk_d, g, ar_d)
    ka_o = oracle.keyswitch_init_automorph(sk_o, g, ar_o)
    cr_d = ka_d.apply(c1d >> g)
    cr_o = oracle.apply_keyswitch(ka_o, oracle.automorph(c1o, g))
    assert cr_d.to_python_parts() == cr_o.parts
    dec = ctx.decode_slots(np.asarray(sk_d.decrypt(cr_d).message))
    assert np.array_equal(dec[:, 0], np.roll(consts1, -1))
    assert list(sk_d.decrypt(cr_d).message) == list(
        oracle.plaintext_rotate(ctx, m1, 1))


def test_general_cli_extension_config():
    """Test_General-style end-to-end run at m=31, p=2 (d=5)."""
    from fhe_si_tpu.cli import test_general
    assert test_general.main(
        ["prog", "2", "3", "80", "1234", "--m=31"]) == 0


def test_bad_generator_raises():
    """g whose coset cycle does not cover the slots must be rejected
    (reference asserts the same, PlaintextSpace.cpp:104)."""
    # m=31, p=2 (H = <2>, 6 cosets); g=2 is IN H: cycle length 1
    with pytest.raises(ValueError):
        FheContext(m=31, log_q=80, p=2, generator=2)


def test_p_m_not_coprime_raises():
    with pytest.raises(ValueError):
        FheContext(m=10, log_q=80, p=5, generator=3)
