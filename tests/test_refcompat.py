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


def test_public_key_interop(ctx, ref_chain):
    """pk export -> import round trip (FHE-SI.cpp:72-78): identical limbs
    and evals, and encrypting under the re-imported pk with the same
    randomness yields the SAME ciphertext."""
    ref = refserial.RefContext(ctx.m, ctx.log_q, ctx.p, ctx.generator,
                               ctx.decomp_size, ref_chain)
    src = sampling.RandomSource(11)
    sk, pk = scheme.keygen(ctx, src)
    buf = refcompat.export_public_key(pk, ref)
    pk2 = refcompat.import_public_key(buf, ref, ctx)
    assert np.array_equal(np.asarray(pk2.pk_limbs), np.asarray(pk.pk_limbs))
    assert np.array_equal(np.asarray(pk2.pk_evals), np.asarray(pk.pk_evals))

    msg = src.uniform_mod_p(ctx.phim, ctx.p)
    er = sampling.sample_encrypt(src, ctx.phim, ctx.stdev)
    ct_a = pk.encrypt(scheme.Plaintext(ctx, msg), er)
    ct_b = pk2.encrypt(scheme.Plaintext(ctx, msg), er)
    assert ct_a.to_python_parts() == ct_b.to_python_parts()
    assert list(sk.decrypt(ct_b).message) == list(msg % ctx.p)


def test_matrix_framing_and_ciphertext_matrix(ctx):
    """Matrix<T> uses the templated framing (u32 rows | u32 cols |
    row-major, NO per-row prefixes — Serialization.h:58-81), and a
    Matrix<Ciphertext> app-state round trip stays usable."""
    import struct

    # framing: 2x3 matrix of ZZ(7) — one cols header only
    w = refserial.Writer()
    refserial.write_matrix(w, [[7] * 3, [7] * 3], w.zz)
    buf = w.getvalue()
    assert buf[:8] == struct.pack("<II", 2, 3)
    body = buf[8:]
    one = refserial.Writer(); one.zz(7)
    assert body == one.getvalue() * 6     # elements back-to-back, no prefixes

    # Matrix<Ciphertext> round trip
    from fhe_si_tpu.apps.matrix import Matrix
    src = sampling.RandomSource(23)
    sk, pk = scheme.keygen(ctx, src)
    msgs = [[src.uniform_mod_p(ctx.phim, ctx.p) for _ in range(3)]
            for _ in range(2)]
    mat = Matrix([[pk.encrypt(scheme.Plaintext(ctx, m), src) for m in row]
                  for row in msgs])
    buf = refcompat.export_ciphertext_matrix(mat)
    back = refcompat.import_ciphertext_matrix(buf, ctx)
    assert (back.num_rows(), back.num_cols()) == (2, 3)
    for i in range(2):
        for j in range(3):
            assert back.at(i, j).to_python_parts() == \
                mat.at(i, j).to_python_parts()
            assert list(sk.decrypt(back.at(i, j)).message) == \
                list(msgs[i][j] % ctx.p)


def test_keyswitch_interop(ctx, ref_chain):
    """keyswitch matrix export -> import -> USE round trip
    (FHE-SI.cpp:270-276): the re-imported matrix produces bit-identical
    relinearization outputs."""
    ref = refserial.RefContext(ctx.m, ctx.log_q, ctx.p, ctx.generator,
                               ctx.decomp_size, ref_chain)
    src = sampling.RandomSource(13)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    buf = refcompat.export_keyswitch(ksw, ref)
    ksw2 = refcompat.import_keyswitch(buf, ref, ctx)
    assert np.array_equal(np.asarray(ksw2.matrix_evals),
                          np.asarray(ksw.matrix_evals))

    m1 = src.uniform_mod_p(ctx.phim, ctx.p)
    m2 = src.uniform_mod_p(ctx.phim, ctx.p)
    c1 = pk.encrypt(scheme.Plaintext(ctx, m1), src)
    c2 = pk.encrypt(scheme.Plaintext(ctx, m2), src)
    tens = c1 * c2
    out_a = ksw.apply(tens)
    out_b = ksw2.apply(tens)
    assert out_a.to_python_parts() == out_b.to_python_parts()
    assert list(sk.decrypt(out_b).message) == list(
        oracle.plaintext_mul(ctx, m1, m2))
