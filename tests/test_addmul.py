"""Device-path mirror of the reference Test_AddMul harness
(Test_AddMul.cpp:11-113): random plaintexts, the same circuit
(sum, 7-fold add, product, square, 9*(prod^2)^2 + 8-fold add),
asserted against exact plaintext arithmetic."""
import numpy as np
import pytest

from fhe_si_tpu import sampling, scheme
from fhe_si_tpu.context import FheContext
from fhe_si_tpu.hostmath import oracle


@pytest.fixture(scope="module")
def ctx():
    return FheContext(m=22, log_q=80, p=23, generator=7)


@pytest.fixture(scope="module")
def keys(ctx):
    src = sampling.RandomSource(99)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    return sk, pk, ksw


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_addmul_circuit(ctx, keys, seed):
    sk, pk, ksw = keys
    src = sampling.RandomSource(1000 + seed)
    p = ctx.p

    m1 = src.uniform_mod_p(ctx.phim, p)
    m2 = src.uniform_mod_p(ctx.phim, p)
    pt1, pt2 = scheme.Plaintext(ctx, m1), scheme.Plaintext(ctx, m2)

    # plaintext ground truth (Test_AddMul.cpp:36-44)
    sum_ = (m1 + m2) % p
    sum_mult = (m2 * 7) % p
    prod = oracle.plaintext_mul(ctx, m1, m2)
    prod2 = oracle.plaintext_mul(ctx, prod, prod)
    sum_quad = (oracle.plaintext_mul(ctx, prod2, prod2) * 9) % p

    c1 = pk.encrypt(pt1, src)
    c2 = pk.encrypt(pt2, src)

    c_sum = c1 + c2
    c_sum_mult = c2
    for _ in range(6):
        c_sum_mult = c_sum_mult + c2

    c_prod = ksw.apply(c1 * c2)
    assert list(sk.decrypt(c_sum).message) == list(sum_)
    assert list(sk.decrypt(c_sum_mult).message) == list(sum_mult)
    assert list(sk.decrypt(c_prod).message) == list(prod)

    c_p2_t = c_prod * c_prod          # tensored
    c_prod2 = ksw.apply(c_p2_t)
    assert list(sk.decrypt(c_prod2).message) == list(prod2)

    # cSumQuad: 9 tensored copies summed, keyswitched, * prod2, keyswitched
    c_sq = c_p2_t
    for _ in range(8):
        c_sq = c_sq + c_p2_t
    c_sq = ksw.apply(c_sq)
    c_sq = ksw.apply(c_sq * c_prod2)
    assert list(sk.decrypt(c_sq).message) == list(sum_quad)
