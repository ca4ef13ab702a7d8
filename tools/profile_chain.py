"""Chained per-stage device timing of the big-config mul+relin pipeline.

Each stage is run `steps` times inside ONE jit (lax.scan) with a
data-dependent carry, so the ~25-28 ms axon launch overhead is paid once
per measurement instead of once per step (see bench.py methodology).
The carry trick: the stage input is perturbed by a select on a scalar
reduction of the stage output — un-foldable data dependence at ~zero cost.

Usage: python3 tools/profile_chain.py [batch] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INT_MIN = -(1 << 31)


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

    p, log_q = 4007, 170
    g = numbth.find_group_generator(p - 1)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g)
    dev = device_context(ctx)
    src = sampling.RandomSource(1)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)),
                    src)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(f"ctx: phim={ctx.phim} L={ctx.num_primes} n={ctx.n_limbs} "
          f"ndigits={ctx.ndigits} ksw_rows={len(ctx.ksw_rows)} "
          f"batch={batch} steps={steps}", flush=True)

    C = dev.C
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    tmul = jax.vmap(dev._tensor_mul, in_axes=(None, 0, 0))
    sdown = jax.vmap(dev._scale_down, in_axes=(None, 0))
    digs = jax.vmap(dev._digit_evals, in_axes=(None, 0))
    kdot = jax.vmap(dev._keyswitch_digits, in_axes=(None, None, 0))
    tp = tmul(C, a, a)
    pr = sdown(C, tp)
    de = digs(C, pr)

    def chain_time(label, stage, x0, extra=()):
        """stage(C, x, *extra) chained `steps` times on carried x."""
        def chain(C, x, *extra):
            def body(cur, _):
                out = stage(C, cur, *extra)
                s = jnp.sum(out).astype(jnp.int32)
                nxt = jnp.where(s == jnp.int32(INT_MIN), cur + 1, cur)
                return nxt, ()
            y, _ = jax.lax.scan(body, x, None, length=steps)
            return jnp.sum(y)

        fn = jax.jit(chain)
        np.asarray(fn(C, x0, *extra))  # compile + warm
        best = float("inf")
        for r in range(3):
            x = jnp.roll(x0, r + 1, axis=0)
            x.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(fn(C, x, *extra))
            best = min(best, time.perf_counter() - t0)
        per = best / steps
        print(f"  {label:26s} {per*1e3:8.2f} ms/step ({batch/per:9.1f}/s)",
              flush=True)
        return per

    t_full = chain_time(
        "mul_relin (full)",
        lambda C, x, m: jax.vmap(dev._mul_relin,
                                 in_axes=(None, 0, 0, None))(C, x, x, m),
        a, (ksw.matrix_evals,))
    t1 = chain_time("tensor_mul", lambda C, x: tmul(C, x, x), a)
    t2 = chain_time("scale_down", sdown, tp)
    t3 = chain_time("digit_evals", digs, pr)
    t4 = chain_time("ksw_dot+topoly",
                    lambda C, x, m: kdot(C, m, x), de, (ksw.matrix_evals,))
    print(f"  sum of stages              {(t1+t2+t3+t4)*1e3:8.2f} ms "
          f"(full {t_full*1e3:.2f})", flush=True)

    # micro-stages
    from fhe_si_tpu.ops import crt, limbs as lb, modular
    K = dev._ksw_tables(C)

    chain_time("fwd NTT 2-part (L=21)",
               lambda C, x: dev._ntt(C, 'fwd_chunks', x),
               (a[..., 0] % 65537)[..., None, :] * jnp.ones(
                   (1, 1, ctx.num_primes, 1), jnp.int32) % C['q'])
    ev2 = dev.from_poly(a)
    chain_time("inv NTT 3-part (L=21)", lambda C, x: dev._ntt(C, 'inv_chunks', x), tp)
    chain_time("CRT recon 3-part (L=21)",
               lambda C, x: crt.residues_to_limbs_fast(
                   x, C['fast_crt'], C['q'], C['qinv_f'], dev.n), tp)
    chain_time("limbs_to_res 2-part",
               lambda C, x: crt.limbs_to_residues(
                   x, C['chunk_tbl'], C['wrap_ct'], C['q'], C['qinv_f']), a)
    chain_time("byte_decomp 3-part",
               lambda C, x: lb.byte_decomp(x, dev.log_q, dev.digit_bits,
                                           dev.ndigits, C['q_limbs']), pr)
    chain_time("reduce_signed 3-part", lambda C, x: dev._reduce_signed(C, x),
               pr)
    dig_res = modular.barrett(
        jnp.moveaxis(lb.byte_decomp(pr, dev.log_q, dev.digit_bits,
                                    dev.ndigits, C['q_limbs']),
                     -1, 2).reshape(batch, -1, ctx.phim)[:, :, None, :],
        K['q'], K['qinv_f'])
    # K passed as an ARGUMENT: closed-over device tables lower to HLO
    # constants and blow past the remote compiler's payload limit
    chain_time("digit fwd NTT (24xK rows)",
               lambda C, x, Kt: dev._ntt_raw(Kt['fwd_chunks'], x, Kt['q'],
                                             Kt['qinv_f']), dig_res, (K,))


if __name__ == "__main__":
    main()
