"""Layout/vmap experiment for the keyswitch digit transform.

The digit stage costs ~14 ms at [B=64, R=12, Lk=8, N=4096] under vmap
while the same transform on a flat [128, L=12, N=4096] tensor costs
0.63 ms (5.7x worse per element).  This probe isolates WHICH structural
difference is responsible: the vmap batching, the extra leading rank,
or the table subset.  Usage: python3 tools/profile_digit_layout.py
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
    from fhe_si_tpu.ops import ntt_ct

    ctx = FheContext(m=8192, log_q=80, p=40961, generator=3)
    dev = device_context(ctx)
    K = dev._ksw_tables(dev.C)
    Lk = K['q'].shape[0]
    rng = np.random.default_rng(0)
    B, R = 64, 12
    N = ctx.phim
    kprimes = ctx.primes[np.asarray(ctx.ksw_rows)]
    flat = jnp.asarray(rng.integers(0, kprimes[:, None],
                                    size=(B * R, Lk, N)), jnp.int32)
    nested = flat.reshape(B, R, Lk, N)
    dflat = jnp.asarray(rng.integers(0, 1 << 24, size=(B * R, N)), jnp.int32)
    dnest = dflat.reshape(B, R, N)
    steps = int(os.environ.get("STEPS", "64"))

    def bench(fn, x0, label):
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
        print(f"{label:46s} {best/steps*1e3:8.3f} ms/step", file=sys.stderr)

    fwd = lambda x: dev._fwd_t(K, x)                       # noqa: E731
    norm = lambda y: y % jnp.int32(1 << 20)                # keep chain valid

    # A: flat [768, Lk, N], no vmap
    bench(lambda x: fwd(x), flat, "A fwd_t flat [768, Lk, N]")
    # B: vmapped over B with per-example [R, Lk, N] (the pipeline shape)
    bench(jax.vmap(fwd), nested, "B fwd_t vmap(B) x [R, Lk, N]")
    # C: direct call, extra leading rank, no vmap
    bench(lambda x: fwd(x), nested, "C fwd_t direct [B, R, Lk, N]")
    del norm

    def digits_round(d):
        ev = ntt_ct.ct_fwd_digits(K['ct'], d, dev.ct_meta, 24)
        return jnp.sum(ev, axis=-2) % jnp.int32(1 << 24)   # back to digits

    # D: digit fast path, flat rows
    bench(digits_round, dflat, "D ct_fwd_digits flat [768, N]")
    # E: digit fast path under vmap
    bench(jax.vmap(digits_round), dnest, "E ct_fwd_digits vmap(B) x [R, N]")


if __name__ == "__main__":
    main()
