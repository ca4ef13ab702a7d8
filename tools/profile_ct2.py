"""Focused A/B probes for the digit-stage CT transform slowdown.

The digit stage's subset ct_fwd measured 4x worse than linear volume
scaling vs the plain [B, L, N] probe (tools/profile_ct.py).  Candidates:
the vmap-prepended batch axis (5D tensors through the swapaxes pair) vs
the subset tables themselves.  Times each combination.
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

    ctx = FheContext(m=8192, log_q=80, p=40961, generator=3)
    dev = device_context(ctx)
    C = dev.C
    K = dev._ksw_tables(C)
    Lk = K['q'].shape[0]
    L = ctx.num_primes
    steps = 64
    rng = np.random.default_rng(0)
    kprimes = ctx.primes[np.asarray(ctx.ksw_rows)]
    print(f"L={L} Lk={Lk} phim={ctx.phim}", file=sys.stderr)

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
        ms = best / steps * 1e3
        el = int(np.prod(x0.shape))
        print(f"{label:44s} {ms:8.3f} ms/step "
              f"({ms/el*1e6:6.2f} ns/kel)", file=sys.stderr)
        return ms

    # flat 3D [768, Lk, N] == digit volume, no extra dims
    d3 = jnp.asarray(rng.integers(0, kprimes[:, None],
                                  size=(768, Lk, ctx.phim)), jnp.int32)
    chain(lambda c: dev._fwd_t(K, c), d3, "subset fwd, flat [768, 8, N]")

    # 4D [64, 12, Lk, N] plain jit (no vmap)
    d4 = d3.reshape(64, 12, Lk, ctx.phim)
    chain(lambda c: dev._fwd_t(K, c), d4, "subset fwd, plain 4D [64, 12, 8, N]")

    # 4D via vmap over the leading axis
    vf = jax.vmap(lambda c: dev._fwd_t(K, c))
    chain(vf, d4, "subset fwd, vmap over B [64, 12, 8, N]")

    # full-chain fwd at matched volume, plain 3D
    x3 = jnp.asarray(rng.integers(0, ctx.primes[:, None],
                                  size=(512, L, ctx.phim)), jnp.int32)
    chain(lambda c: dev._fwd_t(dev._full_as_subset(C), c), x3,
          "full fwd, flat [512, 12, N]")


if __name__ == "__main__":
    main()
