import numpy as np

from fhe_si_tpu import sampling, scheme, serialization as ser
from fhe_si_tpu.context import FheContext
from fhe_si_tpu.hostmath import oracle


def test_full_roundtrip(tmp_path):
    ctx = FheContext(m=22, log_q=80, p=23, generator=7)
    src = sampling.RandomSource(55)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    msg = src.uniform_mod_p(ctx.phim, ctx.p)
    ct = pk.encrypt(scheme.Plaintext(ctx, msg), src)

    d = str(tmp_path)
    ser.export_context(ctx, f"{d}/ctx.npz")
    ser.export_secret_key(sk, f"{d}/sk.npz")
    ser.export_public_key(pk, f"{d}/pk.npz")
    ser.export_keyswitch(ksw, f"{d}/ksw.npz")
    ser.export_ciphertext(ct, f"{d}/ct.npz")
    ser.export_ciphertext(ct * ct, f"{d}/ct2.npz")  # tensored: ScaleDown on export

    ctx2 = ser.import_context(f"{d}/ctx.npz")
    assert np.array_equal(ctx2.primes, ctx.primes)
    assert np.array_equal(ctx2.roots, ctx.roots)
    assert (ctx2.m, ctx2.log_q, ctx2.p, ctx2.generator) == (22, 80, 23, 7)

    sk2 = ser.import_secret_key(ctx2, f"{d}/sk.npz")
    pk2 = ser.import_public_key(ctx2, f"{d}/pk.npz")
    ksw2 = ser.import_keyswitch(ctx2, f"{d}/ksw.npz")
    ct1 = ser.import_ciphertext(ctx2, f"{d}/ct.npz")
    ct2 = ser.import_ciphertext(ctx2, f"{d}/ct2.npz")

    assert list(sk2.decrypt(ct1).message) == list(msg % ctx.p)
    got = sk2.decrypt(ksw2.apply(ct2)).message
    assert list(got) == list(oracle.plaintext_mul(ctx, msg, msg))

    # imported keys interoperate with fresh encryptions
    ct3 = pk2.encrypt(scheme.Plaintext(ctx2, msg), sampling.RandomSource(1))
    assert list(sk2.decrypt(ct3).message) == list(msg % ctx.p)
