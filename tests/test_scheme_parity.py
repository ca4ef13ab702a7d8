"""Device scheme vs pure-Python oracle: bit-exact on identical randomness."""
import numpy as np
import pytest

from fhe_si_tpu import sampling, scheme
from fhe_si_tpu.context import FheContext, limbs_to_int
from fhe_si_tpu.hostmath import oracle


@pytest.fixture(scope="module", params=[(22, 80, 23, 7), (46, 96, 47, 5)],
                ids=["m22_q80_p23", "m46_q96_p47"])
def setup(request):
    m, log_q, p, g = request.param
    ctx = FheContext(m=m, log_q=log_q, p=p, generator=g)
    src_d = sampling.RandomSource(1234)
    src_o = sampling.RandomSource(1234)
    kg = sampling.sample_keygen(src_d, ctx.phim, ctx.stdev, ctx.log_q)
    kg_o = sampling.sample_keygen(src_o, ctx.phim, ctx.stdev, ctx.log_q)
    sk_d, pk_d = scheme.keygen(ctx, kg)
    sk_o, pk_o = oracle.keygen(ctx, kg_o)
    return ctx, (src_d, src_o), (sk_d, pk_d), (sk_o, pk_o)


def _parts(ct):
    return ct.to_python_parts()


def _encrypt_pair(ctx, srcs, keys_d, keys_o, msg):
    (src_d, src_o) = srcs
    er_d = sampling.sample_encrypt(src_d, ctx.phim, ctx.stdev)
    er_o = sampling.sample_encrypt(src_o, ctx.phim, ctx.stdev)
    c_d = keys_d[1].encrypt(scheme.Plaintext(ctx, msg), er_d)
    c_o = oracle.encrypt(keys_o[1], msg, er_o)
    return c_d, c_o


def test_keygen_parity(setup):
    ctx, _, (sk_d, pk_d), (sk_o, pk_o) = setup
    pkl = np.asarray(pk_d.pk_limbs)
    dev_pk = [[limbs_to_int(pkl[i, j]) for j in range(ctx.phim)] for i in range(2)]
    assert dev_pk == pk_o.pk


def test_encrypt_decrypt_parity(setup):
    ctx, srcs, kd, ko = setup
    msg = srcs[0].uniform_mod_p(ctx.phim, ctx.p)
    srcs[1].uniform_mod_p(ctx.phim, ctx.p)
    c_d, c_o = _encrypt_pair(ctx, srcs, kd, ko, msg)
    assert _parts(c_d) == c_o.parts
    assert list(kd[0].decrypt(c_d).message) == oracle.decrypt(ko[0], c_o)
    assert list(kd[0].decrypt(c_d).message) == list(msg % ctx.p)


def test_homomorphic_ops_parity(setup):
    ctx, srcs, kd, ko = setup
    src_d, src_o = srcs
    m1 = src_d.uniform_mod_p(ctx.phim, ctx.p); src_o.uniform_mod_p(ctx.phim, ctx.p)
    m2 = src_d.uniform_mod_p(ctx.phim, ctx.p); src_o.uniform_mod_p(ctx.phim, ctx.p)
    c1_d, c1_o = _encrypt_pair(ctx, srcs, kd, ko, m1)
    c2_d, c2_o = _encrypt_pair(ctx, srcs, kd, ko, m2)

    # add
    assert _parts(c1_d + c2_d) == oracle.add(c1_o, c2_o).parts

    # mul + relinearize
    kr_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev, ctx.log_q, 3,
                                     ctx.ndigits)
    kr_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev, ctx.log_q, 3,
                                     ctx.ndigits)
    ksw_d = scheme.KeySwitch.for_relinearization(kd[0], kr_d)
    ksw_o = oracle.keyswitch_init_s2(ko[0], kr_o)
    cm_d = ksw_d.apply(c1_d * c2_d)
    cm_o = oracle.apply_keyswitch(ksw_o, oracle.mul(c1_o, c2_o))
    assert _parts(cm_d) == cm_o.parts
    assert list(kd[0].decrypt(cm_d).message) == list(oracle.plaintext_mul(ctx, m1, m2))

    # automorph + keyswitch rotation
    k = ctx.generator
    ar_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev, ctx.log_q, 2,
                                     ctx.ndigits)
    ar_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev, ctx.log_q, 2,
                                     ctx.ndigits)
    ka_d = scheme.KeySwitch.for_automorph(kd[0], k, ar_d)
    ka_o = oracle.keyswitch_init_automorph(ko[0], k, ar_o)
    cr_d = ka_d.apply(c1_d >> k)
    cr_o = oracle.apply_keyswitch(ka_o, oracle.automorph(c1_o, k))
    assert _parts(cr_d) == cr_o.parts
    assert list(kd[0].decrypt(cr_d).message) == list(
        oracle.plaintext_rotate(ctx, m1, 1))

    # constants and scalars
    cv = src_d.uniform_mod_p(ctx.phim, ctx.p); src_o.uniform_mod_p(ctx.phim, ctx.p)
    pt = scheme.Plaintext(ctx, cv)
    assert _parts(c1_d + pt) == oracle.add_const(c1_o, cv).parts
    assert _parts(c1_d * pt) == oracle.mul_const(c1_o, cv).parts
    assert _parts(c1_d * (-7)) == oracle.mul_scalar(c1_o, -7).parts

    # tensored-state ops: add, scalar, const-mul, then relinearize
    t_d = (c1_d * c2_d) + (c1_d * c1_d)
    t_o = oracle.add(oracle.mul(c1_o, c2_o), oracle.mul(c1_o, c1_o))
    t_d, t_o = t_d * 9, oracle.mul_scalar(t_o, 9)
    t_d, t_o = t_d * pt, oracle.mul_const(t_o, cv)
    t_d, t_o = t_d + pt, oracle.add_const(t_o, cv)
    r_d = ksw_d.apply(t_d)
    r_o = oracle.apply_keyswitch(ksw_o, t_o)
    assert _parts(r_d) == r_o.parts
    assert list(kd[0].decrypt(r_d).message) == oracle.decrypt(ko[0], r_o)


def test_decomp_size_2_parity():
    """Non-default digit radix (decompSize=2 -> 16-bit ByteDecomp digits,
    FHEContext.h:91-99 constructor parameter): the full mul+relin path
    must stay bit-exact vs the oracle with the different digit count."""
    ctx = FheContext(m=22, log_q=80, p=23, generator=7, decomp_size=2)
    assert ctx.digit_bits == 16 and ctx.ndigits == 5
    src_d, src_o = sampling.RandomSource(8), sampling.RandomSource(8)
    kg_d = sampling.sample_keygen(src_d, ctx.phim, ctx.stdev, ctx.log_q)
    kg_o = sampling.sample_keygen(src_o, ctx.phim, ctx.stdev, ctx.log_q)
    sk_d, pk_d = scheme.keygen(ctx, kg_d)
    sk_o, pk_o = oracle.keygen(ctx, kg_o)
    m1 = src_d.uniform_mod_p(ctx.phim, ctx.p)
    src_o.uniform_mod_p(ctx.phim, ctx.p)
    m2 = src_d.uniform_mod_p(ctx.phim, ctx.p)
    src_o.uniform_mod_p(ctx.phim, ctx.p)
    e1d = sampling.sample_encrypt(src_d, ctx.phim, ctx.stdev)
    e1o = sampling.sample_encrypt(src_o, ctx.phim, ctx.stdev)
    e2d = sampling.sample_encrypt(src_d, ctx.phim, ctx.stdev)
    e2o = sampling.sample_encrypt(src_o, ctx.phim, ctx.stdev)
    c1_d = pk_d.encrypt(scheme.Plaintext(ctx, m1), e1d)
    c1_o = oracle.encrypt(pk_o, m1, e1o)
    c2_d = pk_d.encrypt(scheme.Plaintext(ctx, m2), e2d)
    c2_o = oracle.encrypt(pk_o, m2, e2o)
    kr_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev, ctx.log_q,
                                     3, ctx.ndigits)
    kr_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev, ctx.log_q,
                                     3, ctx.ndigits)
    ksw_d = scheme.KeySwitch.for_relinearization(sk_d, kr_d)
    ksw_o = oracle.keyswitch_init_s2(sk_o, kr_o)
    cm_d = ksw_d.apply(c1_d * c2_d)
    cm_o = oracle.apply_keyswitch(ksw_o, oracle.mul(c1_o, c2_o))
    assert _parts(cm_d) == cm_o.parts
    assert list(sk_d.decrypt(cm_d).message) == list(
        oracle.plaintext_mul(ctx, m1, m2))


def test_part_limb_widths(setup):
    """Persistent ciphertext parts carry the narrow n_ct width; automorph
    outputs stay unreduced at the linear-basis reconstruction width
    (Ciphertext.cpp:54-59 semantics); width-ragged adds stay bit-exact
    against the oracle."""
    ctx, srcs, kd, ko = setup
    n_ct = ctx.n_limbs_ct
    msg = srcs[0].uniform_mod_p(ctx.phim, ctx.p)
    srcs[1].uniform_mod_p(ctx.phim, ctx.p)
    c_d, c_o = _encrypt_pair(ctx, srcs, kd, ko, msg)
    assert c_d.parts.shape[-1] == n_ct

    rot_d = c_d.automorph(ctx.generator)
    rot_o = oracle.automorph(c_o, ctx.generator)
    assert rot_d.parts.shape[-1] > n_ct          # exact, un-reduced
    assert _parts(rot_d) == rot_o.parts

    # width-ragged add: (rotated, wide) + (fresh, narrow)
    s_d = rot_d + c_d
    s_o = oracle.add(rot_o, c_o)
    assert s_d.parts.shape[-1] == n_ct           # add reduces mod 2^logQ
    assert _parts(s_d) == s_o.parts

    # width-ragged Plaintext add: unreduced automorph output + constant
    # (Ciphertext.cpp:147-161 AddConstant on unreduced parts is legal)
    cv = srcs[0].uniform_mod_p(ctx.phim, ctx.p)
    srcs[1].uniform_mod_p(ctx.phim, ctx.p)
    pa_d = rot_d + scheme.Plaintext(ctx, cv)
    pa_o = oracle.add_const(rot_o, cv)
    assert pa_d.parts.shape[-1] == rot_d.parts.shape[-1]  # tail stays wide
    assert _parts(pa_d) == pa_o.parts

    # width-ragged decrypt_batch: fresh (narrow) + rotated (wide) in one
    # fused dispatch must agree with per-ciphertext decrypts
    singles = [kd[0].decrypt(c_d).message, kd[0].decrypt(rot_d).message]
    batch = kd[0].decrypt_batch([c_d, rot_d])
    assert [list(b.message) for b in batch] == [list(s) for s in singles]


def test_decrypt_rejects_excess_parts(setup):
    """A 3-part ciphertext (ScaleDown'd unrelinearized product) against a
    2-power secret key must raise, not silently truncate: the reference
    dots EVERY part against the tensored key list (FHE-SI.cpp:96-103)."""
    ctx, srcs, kd, ko = setup
    m1 = srcs[0].uniform_mod_p(ctx.phim, ctx.p)
    srcs[1].uniform_mod_p(ctx.phim, ctx.p)
    c_d, _ = _encrypt_pair(ctx, srcs, kd, ko, m1)
    prod = (c_d * c_d).relinearized_view()       # 3 parts, no relin
    assert prod.parts.shape[0] == 3
    with pytest.raises(ValueError, match="relinearize first"):
        kd[0].decrypt(prod)
    with pytest.raises(ValueError, match="relinearize first"):
        kd[0].decrypt_batch([prod])
