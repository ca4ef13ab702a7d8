import numpy as np
import pytest

from fhe_si_tpu.context import FheContext, int_to_limbs, limbs_to_int


@pytest.fixture(scope="module")
def ctx():
    return FheContext(m=22, log_q=80, p=23, generator=7)


def test_palgebra(ctx):
    assert ctx.phim == 10
    assert list(ctx.zms) == [1, 3, 5, 7, 9, 13, 15, 17, 19, 21]
    assert ctx.zms_idx[3] == 1 and ctx.zms_idx[2] == -1


def test_prime_budget(ctx):
    import math
    budget = (2 * 80 * math.log(2) + math.log(23) + 2 * math.log(10)
              + math.log(2))
    assert math.log(ctx.prime_product) >= budget
    assert all(int(q) % ctx.m == 1 for q in ctx.primes)
    # roots have exact order m
    for q, w in zip(ctx.primes, ctx.roots):
        assert pow(int(w), ctx.m, int(q)) == 1
        assert pow(int(w), ctx.m // 2, int(q)) != 1
        assert pow(int(w), ctx.m // 11, int(q)) != 1


def test_limb_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        v = int(rng.integers(-2 ** 62, 2 ** 62)) * int(rng.integers(0, 2 ** 40))
        limbs = int_to_limbs(v, 10)
        assert limbs_to_int(limbs) == ((v + 2 ** 159) % 2 ** 160) - 2 ** 159


def test_slots_roundtrip(ctx):
    rng = np.random.default_rng(1)
    vals = rng.integers(0, ctx.p, ctx.total_slots)
    poly = ctx.embed_in_slots(vals, only_usable=False)
    assert np.array_equal(ctx.decode_slots(poly), vals % ctx.p)
    # usable-slot embedding zeroes the tail
    vals2 = rng.integers(0, ctx.p, ctx.usable_slots)
    poly2 = ctx.embed_in_slots(vals2, only_usable=True)
    dec = ctx.decode_slots(poly2)
    assert np.array_equal(dec[:ctx.usable_slots], vals2 % ctx.p)
    assert ctx.usable_slots == 8  # largest power of two <= 10


def test_automorph_is_slot_rotation(ctx):
    """X -> X^g must cyclically shift slots by one (PlaintextSpace.cpp:69-110
    Frobenius-order property, established here by the generator-cycle slot
    order)."""
    rng = np.random.default_rng(2)
    vals = rng.integers(0, ctx.p, ctx.total_slots)
    poly = ctx.embed_in_slots(vals, only_usable=False)
    # sigma_g in the coefficient domain via exponent folding
    m, g = ctx.m, ctx.generator
    up = np.zeros(m, dtype=object)
    for i, c in enumerate(poly):
        up[(i * g) % m] += int(c)
    from fhe_si_tpu.hostmath.oracle import poly_mod_phim, pad
    sig = pad(poly_mod_phim(list(up), ctx.phim_x), ctx.phim)
    dec = ctx.decode_slots(np.array([c % ctx.p for c in sig]))
    assert np.array_equal(dec, np.roll(vals % ctx.p, -1))


def test_ntt_inverse_consistency(ctx):
    fwd, inv = ctx.ntt_tables
    for l in (0, ctx.num_primes - 1):
        q = int(ctx.primes[l])
        # tables are int32; upcast so the tiny test matmul can't overflow
        prod = (inv[l].astype(np.int64) @ fwd[l].astype(np.int64)) % q
        assert np.array_equal(prod, np.eye(ctx.phim, dtype=np.int64) % q)


def test_rejects_bad_params():
    with pytest.raises(NotImplementedError):
        FheContext(m=22, log_q=80, p=2 ** 31 + 11, generator=7)  # p >= 2^30
    with pytest.raises(ValueError):
        FheContext(m=22, log_q=80, p=2 ** 21 + 3, generator=7)  # composite p
    with pytest.raises(ValueError):
        FheContext(m=22, log_q=20, p=2 ** 24 + 43, generator=7)  # q <= 2p
    with pytest.raises(ValueError):
        # (Z/22)* IS cyclic, so a non-generating g must still be rejected
        FheContext(m=22, log_q=80, p=23, generator=3)  # ord_22(3) = 5
    with pytest.raises(ValueError):
        FheContext(m=22, log_q=80, p=23, generator=7, decomp_size=9)


def test_noncyclic_group_slot_cycles():
    """(Z/36)* is NOT cyclic (Z/2 x Z/6): slots split into g-orbit cycles
    with automorph-by-g a per-cycle shift (the regime every power-of-two
    m lives in; the reference has no single-g answer here either)."""
    ctx = FheContext(m=36, log_q=80, p=37, generator=5)  # ord_36(5) = 6
    assert ctx.total_slots == 12 and ctx.slot_cycles == 2
    assert ctx.usable_slots == 4                         # 2^floor(log2(6))
    vals = np.arange(1, 13, dtype=np.int64)
    poly = ctx.embed_in_slots(vals, only_usable=False)
    assert np.array_equal(ctx.decode_slots(poly), vals % 37)
    rot = ctx.rotate_slots(vals, 1)
    assert np.array_equal(rot[:6], np.roll(vals[:6], -1))
    assert np.array_equal(rot[6:], np.roll(vals[6:], -1))


def test_reduction_growth_closed_form():
    """The mixed-radix closed form (G=3, H=1, RM=q-1 for m = 2^a*q^b,
    context.reduction_growth) must equal the exact generic row sweep.
    The sweep path is forced by phim <= 512; the closed form is computed
    here by the same formula the large-ring branch returns."""
    from fhe_si_tpu.hostmath import numbth

    for m in (40, 96, 160, 54, 250, 486):     # 2^3*5, 2^5*3, 2^5*5, 2*27,
        phim = numbth.euler_phi(m)            # 2*125, 2*243
        odd = m
        while odd % 2 == 0:
            odd //= 2
        q = min(set(numbth.factorize(odd)))
        # the generic sweep is exact; run it on a minimal stub (a full
        # context would take the closed-form branch only at phim > 512)
        import types
        stub = types.SimpleNamespace(m=m, phim=phim,
                                     phim_x=numbth.cyclotomic(m))
        sweep = FheContext.reduction_growth.func(stub)
        if (q - 2) * (m // (2 * q)) >= 2:
            assert sweep == dict(G=3, H=1, RM=q - 1), (m, sweep)
