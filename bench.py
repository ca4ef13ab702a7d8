"""Benchmark: homomorphic mults/s per chip at the canonical config
(logQ=80, p=23, g=7 — README:45-48), tensor-mul + full relinearization.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "mults/s", "vs_baseline": N}

vs_baseline divides by the measured single-threaded CPU rate of the
pure-Python oracle (hostmath/oracle.py), which faithfully implements the
reference algorithms; NTL is not installed in this image (BASELINE.md).
Secondary metrics (NTT throughput, mod-switch latency) go to stderr.
"""
import json
import sys
import time

import numpy as np


def _setup_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/fhe_si_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def bench_device(batch=256, iters=10):
    import jax
    import jax.numpy as jnp
    from fhe_si_tpu import sampling, scheme
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context

    ctx = FheContext(m=22, log_q=80, p=23, generator=7)
    dev = device_context(ctx)
    src = sampling.RandomSource(7)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    c2 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    b = jnp.broadcast_to(c2.parts[None], (batch,) + tuple(c2.parts.shape))

    fn = dev.batched_mul_relin_op
    out = fn(a, b, ksw.matrix_evals)
    out.block_until_ready()  # compile

    # block every call: async dispatch without per-call sync has been
    # observed to wildly overstate throughput on the axon runtime
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(a, b, ksw.matrix_evals).block_until_ready()
    dt = time.perf_counter() - t0
    rate = batch * iters / dt

    # secondary: NTT throughput (batched forward transforms/s) and
    # mod-switch (ScaleDown) latency
    res = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    ntt_in = dev.from_poly(res)  # [B, 2, L, phim] evals
    ntt_fn = jax.jit(dev.ntt_fwd)
    ntt_fn(ntt_in).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        ntt_fn(ntt_in).block_until_ready()
    ntt_rate = batch * 2 * ctx.num_primes * iters / (time.perf_counter() - t0)

    tens = dev.tensor_mul_op(c1.parts, c2.parts)
    dev.scale_down_op(tens)  # compile
    t0 = time.perf_counter()
    for _ in range(20):
        o = dev.scale_down_op(tens)
    o.block_until_ready()
    scale_ms = (time.perf_counter() - t0) / 20 * 1e3

    print(f"[bench] device: {rate:.1f} mults/s (batch={batch}); "
          f"NTT {ntt_rate:.0f} transforms/s; ScaleDown {scale_ms:.2f} ms",
          file=sys.stderr)
    return rate, ntt_rate, scale_ms


def bench_oracle(iters=5):
    from fhe_si_tpu import sampling
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.hostmath import oracle

    ctx = FheContext(m=22, log_q=80, p=23, generator=7)
    src = sampling.RandomSource(7)
    sk, pk = oracle.keygen(ctx, sampling.sample_keygen(src, ctx.phim, ctx.stdev,
                                                       ctx.log_q))
    ksw = oracle.keyswitch_init_s2(sk, sampling.sample_keyswitch(
        src, ctx.phim, ctx.stdev, ctx.log_q, 3, ctx.ndigits))
    m1 = src.uniform_mod_p(ctx.phim, ctx.p)
    m2 = src.uniform_mod_p(ctx.phim, ctx.p)
    c1 = oracle.encrypt(pk, m1, sampling.sample_encrypt(src, ctx.phim, ctx.stdev))
    c2 = oracle.encrypt(pk, m2, sampling.sample_encrypt(src, ctx.phim, ctx.stdev))

    t0 = time.perf_counter()
    for _ in range(iters):
        oracle.apply_keyswitch(ksw, oracle.mul(c1, c2))
    rate = iters / (time.perf_counter() - t0)
    print(f"[bench] oracle CPU baseline: {rate:.1f} mults/s", file=sys.stderr)
    return rate


def bench_big(p=4007, log_q=170, batch=8, iters=3):
    """Regression-scale config (phim=2002): reported to stderr only —
    compile cost makes it too slow for the default driver run."""
    import jax.numpy as jnp
    from fhe_si_tpu import sampling, scheme
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context
    from fhe_si_tpu.hostmath import numbth

    g = numbth.find_group_generator(p - 1)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g)
    dev = device_context(ctx)
    src = sampling.RandomSource(1)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    out = dev.batched_mul_relin_op(a, a, ksw.matrix_evals)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        dev.batched_mul_relin_op(a, a, ksw.matrix_evals).block_until_ready()
    rate = batch * iters / (time.perf_counter() - t0)
    print(f"[bench] BIG config p={p} phim={ctx.phim} L={ctx.num_primes} "
          f"logQ={log_q}: {rate:.1f} mults/s (batch={batch})", file=sys.stderr)
    return rate


def main():
    _setup_cache()
    dev_rate, ntt_rate, scale_ms = bench_device()
    cpu_rate = bench_oracle()
    if "--big" in sys.argv:
        bench_big()
    print(json.dumps({
        "metric": "homomorphic mults/s per chip (logQ=80, mul+relin)",
        "value": round(dev_rate, 1),
        "unit": "mults/s",
        "vs_baseline": round(dev_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
