import math

from fhe_si_tpu.hostmath import numbth


def test_cyclotomic_known():
    assert numbth.cyclotomic(1) == (-1, 1)
    assert numbth.cyclotomic(2) == (1, 1)
    assert numbth.cyclotomic(4) == (1, 0, 1)
    assert numbth.cyclotomic(6) == (1, -1, 1)
    # Phi_22(X) = X^10 - X^9 + X^8 - ... + 1
    assert numbth.cyclotomic(22) == tuple((-1) ** i for i in range(11))
    # degree phi(m) for assorted m
    for m in (22, 36, 46, 105, 2026):
        assert len(numbth.cyclotomic(m)) == numbth.euler_phi(m) + 1


def test_cyclotomic_divides_xm_minus_1():
    for m in (22, 46, 36):
        phi = list(numbth.cyclotomic(m))
        xm = [0] * (m + 1)
        xm[0], xm[m] = -1, 1
        numbth.poly_divmod_exact(xm, phi)  # raises if not exact


def test_prime_chain():
    chain = numbth.generate_prime_chain(22, 200 * math.log(2))
    assert all(numbth.is_prime(p) for p in chain)
    assert all(p % 22 == 1 for p in chain)
    assert all(p < 2 ** 20 for p in chain)
    assert len(set(chain)) == len(chain)
    assert math.prod(chain) > 2 ** 200


def test_element_of_order():
    for q in (1048433, 23, 4099):
        for e in (2, 11):
            if (q - 1) % e == 0:
                w = numbth.find_element_of_order(q, e)
                assert pow(w, e, q) == 1
                for f in numbth.factorize(e):
                    assert pow(w, e // f, q) != 1


def test_mobius_phi():
    assert [numbth.mobius(n) for n in range(1, 11)] == [1, -1, -1, 0, -1, 1, -1, 0, 0, 1]
    assert numbth.euler_phi(8190) == 1728
