"""Strict re-measure: distinct inputs per iteration, correctness check."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_si_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np
    from fhe_si_tpu import sampling, scheme
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context
    from fhe_si_tpu.hostmath import numbth

    print("devices:", jax.devices(), flush=True)
    p, log_q = 4007, 170
    g = numbth.find_group_generator(p - 1)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g)
    dev = device_context(ctx)
    src = sampling.RandomSource(1)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    m1 = src.uniform_mod_p(ctx.phim, ctx.p)
    m2 = src.uniform_mod_p(ctx.phim, ctx.p)
    c1 = pk.encrypt(scheme.Plaintext(ctx, m1), src)
    c2 = pk.encrypt(scheme.Plaintext(ctx, m2), src)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = 8
    # distinct inputs per iteration: roll the batch axis so no two calls
    # see identical buffers (defeats any result memoization)
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    b = jnp.broadcast_to(c2.parts[None], (batch,) + tuple(c2.parts.shape))
    bs = [jnp.roll(b, i, axis=0) for i in range(iters)]
    out = dev.batched_mul_relin_op(a, b, ksw.matrix_evals)
    out.block_until_ready()

    t0 = time.perf_counter()
    for i in range(iters):
        dev.batched_mul_relin_op(a, bs[i], ksw.matrix_evals).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"distinct-input batch={batch}: {batch*iters/dt:.1f} mults/s "
          f"({dt/iters*1e3:.2f} ms/step)", flush=True)

    # same-input loop for comparison
    t0 = time.perf_counter()
    for i in range(iters):
        dev.batched_mul_relin_op(a, b, ksw.matrix_evals).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"same-input     batch={batch}: {batch*iters/dt:.1f} mults/s "
          f"({dt/iters*1e3:.2f} ms/step)", flush=True)

    # correctness: decrypt out[0] == m1*m2 in slots
    prod = scheme.Ciphertext(ctx, parts=out[0])
    got = sk.decrypt(prod).message_poly
    from fhe_si_tpu.hostmath import oracle
    want = oracle.polymul_mod_p(ctx, m1, m2) if hasattr(oracle, 'polymul_mod_p') else None
    if want is None:
        # fall back: slot-wise product
        s1 = ctx.decode_slots(m1)
        s2 = ctx.decode_slots(m2)
        got_slots = ctx.decode_slots(got)
        ok = np.array_equal(got_slots, (s1 * s2) % ctx.p)
    else:
        ok = np.array_equal(got, want)
    print("decrypt check:", "OK" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
