"""Pallas fused NTT kernel vs the einsum reference path (interpret mode on
CPU; the same kernel compiles natively on TPU)."""
import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from fhe_si_tpu.context import FheContext
from fhe_si_tpu.device import device_context
from fhe_si_tpu.ops import ntt, pallas_ntt


@pytest.mark.parametrize("m,p,g", [(46, 47, 5)])
def test_pallas_matches_einsum(m, p, g):
    ctx = FheContext(m=m, log_q=96, p=p, generator=g)
    dev = device_context(ctx)
    rng = np.random.default_rng(0)
    res = np.stack([rng.integers(0, int(q), (3, ctx.phim)) for q in ctx.primes],
                   axis=1)
    x = jnp.asarray(res, jnp.int32)
    # the kernel consumes ntt.chunk_matrix's native layout — no transpose
    want = np.asarray(ntt.modmatmul(dev.fwd_chunks, x, dev.q, dev.qinv_f))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_ntt.modmatmul_pallas(
            dev.fwd_chunks, x, dev.q, dev.qinv_f, tile_o=128, tile_b=2))
    assert np.array_equal(got, want)
    # inverse too (roundtrip)
    with pltpu.force_tpu_interpret_mode():
        back = np.asarray(pallas_ntt.modmatmul_pallas(
            dev.inv_chunks, jnp.asarray(want, jnp.int32), dev.q, dev.qinv_f,
            tile_o=128, tile_b=2))
    assert np.array_equal(back, res)

    # raw-digit variant: in-kernel Barrett of values < 2^24 broadcast
    # across the prime axis (the ByteDecomp digit path)
    digs = rng.integers(0, 1 << 24, (5, ctx.phim))
    dres = np.stack([digs % int(q) for q in ctx.primes], axis=1)
    want_raw = np.asarray(ntt.modmatmul(dev.fwd_chunks,
                                        jnp.asarray(dres, jnp.int32),
                                        dev.q, dev.qinv_f))
    with pltpu.force_tpu_interpret_mode():
        got_raw = np.asarray(pallas_ntt.modmatmul_pallas_raw(
            dev.fwd_chunks, jnp.asarray(digs, jnp.int32), dev.q, dev.qinv_f,
            tile_o=128, tile_b=2))
    assert np.array_equal(got_raw, want_raw)


def test_full_scheme_pipeline_flag_on(monkeypatch):
    """FHE_SI_TPU_PALLAS_NTT routes the FULL scheme pipeline (encrypt,
    mul+relin, rotate+keyswitch, decrypt) through the Pallas kernels —
    including _digit_evals' raw-digit variant — and stays bit-identical
    to the oracle.  Guards against the round-2 wiring bug where the flag
    path silently computed a wrong transform."""
    from fhe_si_tpu import device, sampling, scheme
    from fhe_si_tpu.hostmath import oracle

    monkeypatch.setenv("FHE_SI_TPU_PALLAS_NTT", "force")
    ctx = FheContext(m=22, log_q=80, p=23, generator=7)
    # fresh DeviceContext: use_pallas_ntt is cached at first touch
    device._DEVICE_CACHE.pop(id(ctx), None)
    with pltpu.force_tpu_interpret_mode():
        dev = device.device_context(ctx)
        assert dev.use_pallas_ntt
        src_d, src_o = sampling.RandomSource(77), sampling.RandomSource(77)
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

        kr_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev,
                                         ctx.log_q, 3, ctx.ndigits)
        kr_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev,
                                         ctx.log_q, 3, ctx.ndigits)
        ksw_d = scheme.KeySwitch.for_relinearization(sk_d, kr_d)
        ksw_o = oracle.keyswitch_init_s2(sk_o, kr_o)
        cm_d = ksw_d.apply(c1_d * c2_d)
        cm_o = oracle.apply_keyswitch(ksw_o, oracle.mul(c1_o, c2_o))
        assert cm_d.to_python_parts() == cm_o.parts

        k = ctx.generator
        ar_d = sampling.sample_keyswitch(src_d, ctx.phim, ctx.stdev,
                                         ctx.log_q, 2, ctx.ndigits)
        ar_o = sampling.sample_keyswitch(src_o, ctx.phim, ctx.stdev,
                                         ctx.log_q, 2, ctx.ndigits)
        ka_d = scheme.KeySwitch.for_automorph(sk_d, k, ar_d)
        ka_o = oracle.keyswitch_init_automorph(sk_o, k, ar_o)
        cr_d = ka_d.apply(c1_d >> k)
        cr_o = oracle.apply_keyswitch(ka_o, oracle.automorph(c1_o, k))
        assert cr_d.to_python_parts() == cr_o.parts
        assert list(sk_d.decrypt(cm_d).message) == oracle.decrypt(sk_o, cm_o)
    device._DEVICE_CACHE.pop(id(ctx), None)
