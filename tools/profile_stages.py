"""Honest per-stage timing of the big-config mul+relin pipeline.

block_until_ready is not a reliable fence on the axon runtime (observed
returning ~700x early); the only honest sync is fetching real bytes.
Each stage is timed by enqueueing `iters` calls whose results are reduced
to scalars, then fetching every scalar — the device executes the queue
serially, so wall time / iters is the per-call device time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, f, *args, iters=5, batch=1):
    import jax.numpy as jnp
    import numpy as np
    np.asarray(jnp.sum(f(*args)))  # warm/compile + fetch
    t0 = time.perf_counter()
    ys = [jnp.sum(f(*args)) for _ in range(iters)]
    for y in ys:
        np.asarray(y)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:22s} {dt*1e3:9.2f} ms/step  "
          f"({batch/dt:.1f}/s)", flush=True)
    return dt


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
    print(f"ctx: phim={ctx.phim} L={ctx.num_primes} n={ctx.n_limbs} "
          f"ndigits={ctx.ndigits}", flush=True)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    C = dev.C

    tmul = jax.jit(jax.vmap(dev._tensor_mul, in_axes=(None, 0, 0)))
    sdown = jax.jit(jax.vmap(dev._scale_down, in_axes=(None, 0)))
    digs = jax.jit(jax.vmap(dev._digit_evals, in_axes=(None, 0)))
    kdot = jax.jit(jax.vmap(dev._keyswitch_digits, in_axes=(None, None, 0)))
    fwd1 = jax.jit(lambda C, x: dev._from_poly(C, x))
    inv1 = jax.jit(lambda C, e: dev._ntt(C, 'inv_chunks', e))
    crt1 = jax.jit(lambda C, e: dev._to_poly(C, e))

    import numpy as np
    tp = tmul(C, a, a)
    pr = sdown(C, tp)
    de = digs(C, pr)
    print(f"stages at batch={batch}:", flush=True)
    t_all = timed("mul_relin (full)",
                  lambda: dev.batched_mul_relin_op(a, a, ksw.matrix_evals),
                  batch=batch)
    t1 = timed("tensor_mul", lambda: tmul(C, a, a), batch=batch)
    t2 = timed("scale_down", lambda: sdown(C, tp), batch=batch)
    t3 = timed("digit_evals", lambda: digs(C, pr), batch=batch)
    t4 = timed("ksw_dot+topoly", lambda: kdot(C, ksw.matrix_evals, de),
               batch=batch)
    print(f"  sum of stages          {(t1+t2+t3+t4)*1e3:9.2f} ms", flush=True)
    # micro: one forward NTT of the 2-part ciphertext, one inverse, one CRT
    timed("from_poly (2 parts)", lambda: fwd1(C, a), batch=batch)
    ev = fwd1(C, a)
    timed("inv NTT (2 parts)", lambda: inv1(C, ev), batch=batch)
    timed("to_poly (2 parts)", lambda: crt1(C, ev), batch=batch)


if __name__ == "__main__":
    main()
