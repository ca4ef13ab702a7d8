"""Isolate the per-iteration overhead of lax.scan on the axon TPU runtime.

Compares, at steps=8:
  (a) scan with a TRIVIAL body on a tiny carry
  (b) scan with the 6-plane dot body (known ~2.8 ms real compute)
  (c) same 6-plane body UNROLLED (python loop inside one jit)
  (d) trivial body unrolled
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

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    B, L, N, PLANES = 1536, 13, 2002, 6
    mat = jnp.asarray(rng.integers(-64, 65, (PLANES, L, N, N)), jnp.int8)
    x_big = jnp.asarray(rng.integers(-64, 65, (B, L, N)), jnp.int8)
    x_tiny = jnp.asarray(rng.integers(-64, 65, (8, 128)), jnp.int32)

    def six(m, x):
        y = None
        for p in range(PLANES):
            d = jnp.einsum('lok,blk->blo', m[p], x,
                           preferred_element_type=jnp.int32)
            y = d if y is None else y + d
        return jnp.clip(y, -64, 64).astype(jnp.int8)

    def trivial(m, x):
        return x + 1

    def timeit(label, body, x, m, use_scan):
        def run(x0, m):
            if use_scan:
                def sbody(cur, _):
                    return body(m, cur), ()
                y, _ = jax.lax.scan(sbody, x0, None, length=steps)
            else:
                y = x0
                for _ in range(steps):
                    y = body(m, y)
            return jnp.sum(y.astype(jnp.int32))
        runj = jax.jit(run)
        np.asarray(runj(x, m))
        best = float('inf')
        for r in range(3):
            xr = jnp.roll(x, r + 1, axis=0)
            xr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(runj(xr, m))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best/steps*1e3:8.3f} ms/step (total {best*1e3:.1f} ms)",
              flush=True)

    timeit("scan   trivial tiny ", trivial, x_tiny, mat, True)
    timeit("unroll trivial tiny ", trivial, x_tiny, mat, False)
    timeit("scan   6-plane dots ", six, x_big, mat, True)
    timeit("unroll 6-plane dots ", six, x_big, mat, False)


if __name__ == "__main__":
    main()
