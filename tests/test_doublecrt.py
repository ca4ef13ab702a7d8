"""DoubleCrt/SingleCrt/IndexSet object API vs exact Python-int math."""
import numpy as np
import pytest

from fhe_si_tpu.context import FheContext
from fhe_si_tpu.doublecrt import DoubleCrt, SingleCrt
from fhe_si_tpu.hostmath import oracle
from fhe_si_tpu.indexmap import IndexMap, IndexSet
from fhe_si_tpu.sampling import RandomSource


@pytest.fixture(scope="module")
def ctx():
    return FheContext(m=22, log_q=80, p=23, generator=7)


def test_index_set_algebra():
    a = IndexSet(0, 4)
    b = IndexSet.of([3, 4, 5, 6])
    assert (a | b).card() == 7
    assert sorted(a & b) == [3, 4]
    assert sorted(a / b) == [0, 1, 2]
    assert sorted(a ^ b) == [0, 1, 2, 5, 6]
    assert a.first() == 0 and a.last() == 4 and a.next(2) == 3
    assert a.next(4) == 5  # loop-termination protocol
    assert 3 in a and not a.contains(9)
    assert IndexSet(2, 4) <= a and a >= IndexSet(2, 4)

    im = IndexMap(init=lambda i: i * 10)
    im.insert(IndexSet.of([1, 3]))
    assert im[3] == 30
    assert sorted(im.get_index_set()) == [1, 3]


def test_roundtrip_and_arith(ctx):
    rng = np.random.default_rng(0)
    P = ctx.prime_product
    a = [int(v) for v in rng.integers(-2**60, 2**60, ctx.phim)]
    b = [int(v) for v in rng.integers(-2**60, 2**60, ctx.phim)]

    da = DoubleCrt.from_poly(ctx, a)
    db = DoubleCrt.from_poly(ctx, b)
    assert da.to_poly() == [oracle.centered_mod(v, P) for v in a]

    s = (da + db).to_poly()
    assert s == [oracle.centered_mod(x + y, P) for x, y in zip(a, b)]
    d = (da - db).to_poly()
    assert d == [oracle.centered_mod(x - y, P) for x, y in zip(a, b)]

    prod = (da * db).to_poly()
    want = oracle.poly_mod_phim(oracle.poly_mul(
        [oracle.centered_mod(v, P) for v in a],
        [oracle.centered_mod(v, P) for v in b]), ctx.phim_x)
    want = [oracle.centered_mod(v, P) for v in oracle.pad(want, ctx.phim)]
    assert prod == want

    c = (da * 12345).to_poly()
    assert c == [oracle.centered_mod(v * 12345, P) for v in a]
    back = (da * 12345).div_by_constant(12345).to_poly()
    assert back == da.to_poly()

    e = DoubleCrt.from_poly(ctx, [3] + [0] * (ctx.phim - 1)).exp(5)
    assert e.to_poly()[0] == 243

    const = DoubleCrt.constant(ctx, 7)
    assert const.to_poly()[0] == 7


def test_automorph_matches_oracle(ctx):
    rng = np.random.default_rng(1)
    a = [int(v) for v in rng.integers(0, 1000, ctx.phim)]
    k = ctx.generator
    got = DoubleCrt.from_poly(ctx, a).automorph(k).to_poly()
    ct = oracle.OracleCiphertext(ctx, parts=[a])
    want = oracle.automorph(ct, k).parts[0]
    assert got == want


def test_add_primes_and_subsets(ctx):
    rng = np.random.default_rng(2)
    a = [int(v) for v in rng.integers(-2**40, 2**40, ctx.phim)]
    sub = IndexSet(0, 3)
    da = DoubleCrt.from_poly(ctx, a, index_set=sub)
    # value is exact as long as it fits the subset product
    assert da.to_poly() == a
    da.add_primes(IndexSet(4, ctx.num_primes - 1))
    assert da.index_set.card() == ctx.num_primes
    assert da.to_poly() == a

    # ragged-set binop: mod-up happens automatically
    db = DoubleCrt.from_poly(ctx, a, index_set=IndexSet(0, 5))
    s = (da + db).to_poly()
    assert s == [2 * v for v in a]


def test_add_primes_and_scale(ctx):
    """After addPrimesAndScale, the value becomes v*factor with
    factor ≡ 1 mod p (DoubleCRT.cpp:162-208)."""
    a = [5, -3] + [0] * (ctx.phim - 2)
    sub = IndexSet(0, 4)
    da = DoubleCrt.from_poly(ctx, a, index_set=sub)
    da.add_primes_and_scale(IndexSet(5, ctx.num_primes - 1))
    poly = da.to_poly()
    assert [c % ctx.p for c in poly] == [c % ctx.p for c in a]
    # and every coefficient is divisible by the added-prime product
    f = 1
    for i in range(5, ctx.num_primes):
        f *= int(ctx.primes[i])
    assert all(c % f == 0 for c in poly)


def test_scale_down_to_set(ctx):
    """Mod-switching preserves the value mod p and divides magnitude by
    roughly the removed product (DoubleCRT.cpp:518-558)."""
    rng = np.random.default_rng(3)
    a = [int(v) for v in rng.integers(-2**60, 2**60, ctx.phim)]
    da = DoubleCrt.from_poly(ctx, a)
    keep = IndexSet(0, ctx.num_primes - 3)
    da.scale_down_to_set(keep)
    assert da.index_set == keep
    poly = da.to_poly()
    removed = 1
    for i in range(ctx.num_primes - 2, ctx.num_primes):
        removed *= int(ctx.primes[i])
    for orig, new in zip(a, poly):
        assert new % ctx.p == orig % ctx.p          # plaintext preserved
        # v' = (v*(removed mod p) + delta)/removed with |delta| <= removed*p/2
        assert abs(new) <= abs(orig) * ctx.p / removed + ctx.p


def test_single_crt(ctx):
    rng = np.random.default_rng(4)
    a = [int(v) for v in rng.integers(-2**40, 2**40, ctx.phim)]
    b = [int(v) for v in rng.integers(-2**40, 2**40, ctx.phim)]
    sa, sb = SingleCrt.from_poly(ctx, a), SingleCrt.from_poly(ctx, b)
    assert (sa + sb).to_poly() == [x + y for x, y in zip(a, b)]
    dc = sa.to_double_crt()
    assert dc.to_poly() == a
    back = dc.to_single_crt()
    for l in back.index_set:
        q = int(ctx.primes[l])
        assert list(back.map[l]) == [v % q for v in a]


def test_sampling_shapes(ctx):
    src = RandomSource(0)
    d = DoubleCrt(ctx)
    d.randomize(src)
    assert d.evals.shape == (ctx.num_primes, ctx.phim)
    d.sample_gaussian(src)
    p = d.to_poly()
    assert max(abs(v) for v in p) < 30
    d.sample_hwt(src, 8)
    p = d.to_poly()
    assert sum(1 for v in p if v != 0) == 8 and set(p) <= {-1, 0, 1}
    d.sample_small(src)
    assert set(d.to_poly()) <= {-1, 0, 1}
