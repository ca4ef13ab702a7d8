"""Reference-binary-format interop: codec roundtrips, native core parity,
and full key/ciphertext re-basing through a synthetic reference chain."""
import numpy as np
import pytest

from fhe_si_tpu import refcompat, refserial, sampling, scheme
from fhe_si_tpu.context import FheContext
from fhe_si_tpu.hostmath import numbth, oracle


@pytest.fixture(scope="module")
def ctx():
    return FheContext(m=22, log_q=80, p=23, generator=7)


@pytest.fixture(scope="module")
def ref_chain():
    """Synthetic reference-style chain: larger primes ≡ 1 mod 2m with
    2m-th roots, like AddPrimesBySize builds (FHEContext.cpp:88-115)."""
    m = 22
    primes = []
    p = (1 << 30) - 1
    p -= p % (2 * m)
    p += 2 * m + 1
    while len(primes) < 8:
        p -= 2 * m
        if numbth.is_prime(p):
            primes.append(p)
    return [(q, numbth.find_element_of_order(q, 2 * m)) for q in primes]


def test_zz_zzx_roundtrip_and_native():
    rng = np.random.default_rng(0)
    vals = ([int(v) for v in rng.integers(-2**62, 2**62, 64)]
            + [0, -1, 1, 2**200, -(2**200)])
    w = refserial.Writer()
    w.zzx(vals)
    buf = w.getvalue()
    got = refserial.Reader(buf).zzx()          # native path (if built)
    assert got == vals

    # force pure-python path and compare byte-for-byte behavior
    r = refserial.Reader(buf)
    n = r.i32() + 1
    py = [r.zz() for _ in range(n)]
    assert py == vals

    from fhe_si_tpu import native
    assert native.get_lib() is not None, "native codec core failed to build"


def test_context_stream_roundtrip(ctx, ref_chain):
    buf = refserial.write_context(refserial.RefContext(
        ctx.m, ctx.log_q, ctx.p, ctx.generator, ctx.decomp_size, ref_chain))
    ref = refserial.read_context(buf)
    assert (ref.m, ref.log_q, ref.p, ref.generator, ref.decomp_size) == \
        (22, 80, 23, 7, 3)
    assert ref.chain == ref_chain
    ctx2 = refcompat.context_from_reference(ref)
    assert ctx2.phim == ctx.phim and ctx2.p == ctx.p


def test_ciphertext_interop(ctx):
    src = sampling.RandomSource(3)
    sk, pk = scheme.keygen(ctx, src)
    msg = src.uniform_mod_p(ctx.phim, ctx.p)
    ct = pk.encrypt(scheme.Plaintext(ctx, msg), src)
    buf = refcompat.export_ciphertext(ct)
    back = refcompat.import_ciphertext(buf, ctx)
    assert back.to_python_parts() == ct.to_python_parts()
    assert list(sk.decrypt(back).message) == list(msg % ctx.p)


def test_dcrt_rebase_roundtrip(ctx, ref_chain):
    """poly -> reference-basis DoubleCRT -> poly must be exact."""
    ref = refserial.RefContext(ctx.m, ctx.log_q, ctx.p, ctx.generator,
                               ctx.decomp_size, ref_chain)
    rng = np.random.default_rng(1)
    poly = [int(v) for v in rng.integers(-2**60, 2**60, ctx.phim)]
    dcrt = refcompat.poly_to_dcrt(poly, ref, ctx)
    assert set(dcrt) == set(range(len(ref_chain)))
    back = refcompat.dcrt_to_poly(dcrt, ref, ctx)
    assert back == poly


def test_secret_key_interop(ctx, ref_chain):
    """Export our secret key in reference format, re-import, and decrypt a
    ciphertext produced under the original key."""
    ref = refserial.RefContext(ctx.m, ctx.log_q, ctx.p, ctx.generator,
                               ctx.decomp_size, ref_chain)
    src = sampling.RandomSource(9)
    sk, pk = scheme.keygen(ctx, src)
    msg = src.uniform_mod_p(ctx.phim, ctx.p)
    ct = pk.encrypt(scheme.Plaintext(ctx, msg), src)

    buf = refcompat.export_secret_key(sk, ref)
    sk2 = refcompat.import_secret_key(buf, ref, ctx)
    assert np.array_equal(np.asarray(sk2.sk_evals), np.asarray(sk.sk_evals))
    assert list(sk2.decrypt(ct).message) == list(msg % ctx.p)
