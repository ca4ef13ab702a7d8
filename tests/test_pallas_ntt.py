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
    fwd_t = jnp.swapaxes(dev.fwd_chunks, -1, -2)
    inv_t = jnp.swapaxes(dev.inv_chunks, -1, -2)
    want = np.asarray(ntt.modmatmul(dev.fwd_chunks, x, dev.q, dev.qinv_f))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_ntt.modmatmul_pallas(
            fwd_t, x, dev.q, dev.qinv_f, tile_o=128, tile_b=2))
    assert np.array_equal(got, want)
    # inverse too (roundtrip)
    with pltpu.force_tpu_interpret_mode():
        back = np.asarray(pallas_ntt.modmatmul_pallas(
            inv_t, jnp.asarray(want, jnp.int32), dev.q, dev.qinv_f,
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
            fwd_t, jnp.asarray(digs, jnp.int32), dev.q, dev.qinv_f,
            tile_o=128, tile_b=2))
    assert np.array_equal(got_raw, want_raw)
