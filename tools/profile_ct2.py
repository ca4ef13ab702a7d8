"""Per-stage probes of the CT forward transform at the keyswitch digit
volume ([768 rows, Lk primes, N] at the ct4096 config) — locates where
the ~5-7 ms/step of the digit stage goes now that the pipeline is
natively batched (rank-3 transforms).  Every stage is timed in
isolation with the bench chain methodology.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_si_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context
    from fhe_si_tpu.ops import ntt, ntt_ct
    from fhe_si_tpu.ops.modular import mod_mul

    ctx = FheContext(m=8192, log_q=80, p=40961, generator=3)
    dev = device_context(ctx)
    C = dev.C
    K = dev._ksw_tables(C)
    T = K['ct']
    meta = dev.ct_meta
    N1, N2 = meta.N1, meta.N2
    Lk = K['q'].shape[0]
    q, qi = T['q'], T['qinv_f']
    steps = int(os.environ.get("STEPS", "64"))
    rng = np.random.default_rng(0)
    R = 768
    print(f"Lk={Lk} phim={ctx.phim} N1xN2={N1}x{N2} rows={R} steps={steps}",
          file=sys.stderr)

    def chain(fn, x0, label):
        def body(cur, _):
            return fn(cur), ()

        f = jax.jit(lambda a: jnp.sum(jax.lax.scan(body, a, None,
                                                   length=steps)[0]))
        np.asarray(f(x0))
        best = float("inf")
        for r in range(3):
            xr = jnp.roll(x0, r + 1, axis=0)
            xr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(f(xr))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best/steps*1e3:8.3f} ms/step", file=sys.stderr)

    digits = jnp.asarray(rng.integers(0, 1 << 24, size=(R, ctx.phim)),
                         jnp.int32)
    # the [R, c1, Lk, j2] intermediate every tail stage runs on
    mid = jnp.asarray(rng.integers(0, np.asarray(K['q'])[:, 0][None, None, :,
                                                              None],
                                   size=(R, N1, Lk, N2)), jnp.int32)
    back24 = lambda ev: jnp.sum(ev, axis=-2) % jnp.int32(1 << 24)  # noqa

    # full digit transform
    chain(lambda d: back24(ntt_ct.ct_fwd_digits(T, d, meta, 24)),
          digits, "ct_fwd_digits full (+sum fold)")

    # stage 1 only: digit chunks -> cross groups -> horner
    def stage1(d):
        dd = d.reshape(R, N2, N1)
        dd = jnp.swapaxes(dd, -1, -2)
        g, bits = ntt.digit_cross_groups(T['t2'], dd, 24)
        y = ntt.horner_combine(g, q, qi, bits)      # [R, c1, Lk, j2]
        return jnp.sum(y, axis=-2).reshape(R, ctx.phim) % jnp.int32(1 << 24)
    chain(stage1, digits, "stage1 only (cross groups + horner)")

    # tail pieces on the mid tensor
    chain(lambda y: mod_mul(y, T['tw'], q, qi, False), mid, "twiddle mod_mul")
    chain(lambda y: jnp.swapaxes(y, -1, -3) % jnp.int32(1 << 20), mid,
          "swapaxes(-1,-3) materialize")

    def stage2(y):
        z = jnp.swapaxes(y, -1, -3)
        out = ntt.modmatmul(T['t1'], z, q, qi)
        return jnp.swapaxes(out, -1, -3)
    chain(stage2, mid, "swap + t1 matmul + swap")

    def tail(y):
        out = ntt_ct._fwd_tail(T, y, meta)          # twiddle..join
        return out.reshape(R, N1, Lk, N2) % jnp.int32(1 << 20)
    chain(tail, mid, "full fwd tail (twiddle..join)")

    # modmatmul in the two layouts, same volume
    chain(lambda y: ntt.modmatmul(T['t1'], y, q, qi), mid,
          "t1 matmul on [R, c1, Lk, c2] (no swap)")


if __name__ == "__main__":
    main()
