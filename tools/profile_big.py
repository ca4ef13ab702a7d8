"""Profile the big config: batch scaling + per-stage timing.

Usage: python3 tools/profile_big.py [batch ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_si_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from fhe_si_tpu import sampling, scheme
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context
    from fhe_si_tpu.hostmath import numbth

    p, log_q = 4007, 170
    g = numbth.find_group_generator(p - 1)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g)
    dev = device_context(ctx)
    src = sampling.RandomSource(1)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    print(f"ctx: phim={ctx.phim} L={ctx.num_primes} n_limbs={ctx.n_limbs} "
          f"ndigits={ctx.ndigits}", flush=True)

    batches = [int(x) for x in sys.argv[1:]] or [8, 32, 64]
    for batch in batches:
        a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
        t0 = time.perf_counter()
        out = dev.batched_mul_relin_op(a, a, ksw.matrix_evals)
        out.block_until_ready()
        print(f"batch={batch}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            dev.batched_mul_relin_op(a, a, ksw.matrix_evals).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"batch={batch}: {batch*iters/dt:.1f} mults/s "
              f"({dt/iters*1e3:.1f} ms/step)", flush=True)

    # stage timing at the largest batch
    batch = batches[-1]
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    C = dev.C
    import functools

    tmul = jax.jit(jax.vmap(dev._tensor_mul, in_axes=(None, 0, 0)))
    sdown = jax.jit(jax.vmap(dev._scale_down, in_axes=(None, 0)))
    digs = jax.jit(jax.vmap(dev._digit_evals, in_axes=(None, 0)))
    kdot = jax.jit(jax.vmap(dev._keyswitch_digits, in_axes=(None, None, 0)))

    tp = tmul(C, a, a); tp.block_until_ready()
    pr = sdown(C, tp); pr.block_until_ready()
    de = digs(C, pr); de.block_until_ready()
    ko = kdot(C, ksw.matrix_evals, de); ko.block_until_ready()

    def t(f, *args, iters=3):
        f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else None
        t0 = time.perf_counter()
        for _ in range(iters):
            f(*args).block_until_ready()
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"stages at batch={batch} (ms/step):", flush=True)
    print(f"  tensor_mul   {t(functools.partial(tmul, C), a, a):8.1f}", flush=True)
    print(f"  scale_down   {t(functools.partial(sdown, C), tp):8.1f}", flush=True)
    print(f"  digit_evals  {t(functools.partial(digs, C), pr):8.1f}", flush=True)
    print(f"  ksw_dot+poly {t(functools.partial(kdot, C), ksw.matrix_evals, de):8.1f}", flush=True)


if __name__ == "__main__":
    main()
