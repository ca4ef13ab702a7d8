"""A/B: elementwise vs MXU-digit-matmul CRT accumulation at big-config
shapes (chained-scan timing).  Both are bit-identical; this decides the
default (ops/crt.USE_MXU_PARTIALS).

Usage: python3 tools/bench_crt_paths.py [batch] [steps]
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
    import numpy as np
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context
    from fhe_si_tpu.hostmath import numbth
    from fhe_si_tpu.ops import crt

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    p, log_q = 4007, 170
    g = numbth.find_group_generator(p - 1)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g)
    dev = device_context(ctx)
    C = dev.C
    rng = np.random.default_rng(0)
    # 3-part tensored reconstruction input (the scale_down site)
    res = np.stack([rng.integers(0, int(q), (batch, 3, ctx.phim))
                    for q in ctx.primes], axis=2)
    x = jnp.asarray(res, jnp.int32)

    def run(fn, label):
        def chain(C, x0):
            def body(cur, _):
                out = fn(C, cur)
                s = jnp.sum(out).astype(jnp.int32)
                nxt = jnp.where(s == jnp.int32(-(1 << 31)), cur + 1, cur)
                return nxt, ()
            y, _ = jax.lax.scan(body, x0, None, length=steps)
            return jnp.sum(y)

        j = jax.jit(chain)
        np.asarray(j(C, x))
        best = float("inf")
        for r in range(3):
            xr = jnp.roll(x, r + 1, axis=0)
            xr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(j(C, xr))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best/steps*1e3:8.2f} ms/step", flush=True)

    def elementwise(C, cur):
        a, s, e = crt.crt_partials(cur, C['fast_crt'], C['q'], C['qinv_f'],
                                   prescaled=True)
        return crt.crt_finish(a, s, e, C['fast_crt'], dev.n)

    def mxu(C, cur):
        a, s, e = crt.crt_partials_mxu(cur, C['fast_crt'], C['q'],
                                       C['qinv_f'])
        return crt.crt_finish(a, s, e, C['fast_crt'], dev.n)

    run(elementwise, f"CRT recon elementwise [b{batch},3,21,2002]")
    run(mxu, f"CRT recon MXU-digits  [b{batch},3,21,2002]")


if __name__ == "__main__":
    main()
