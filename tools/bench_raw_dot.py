"""Probe the raw MXU int8 dot rate at digit-NTT shape, vs the full
modmatmul (digit split + 6 Karatsuba dots + Barrett-Horner).

Decides where einsum time goes: if the raw dots alone take ~the same
time, the path is MXU-bound at XLA's achievable rate and Pallas fusion
can't win; if raw dots are much faster, the combine/traffic is the
target.
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
    B, L, N = 1536, 13, 2002
    PLANES = 6

    mat = jnp.asarray(rng.integers(-64, 65, (PLANES, L, N, N)), jnp.int8)
    x0 = jnp.asarray(rng.integers(-64, 65, (B, L, N)), jnp.int8)

    def time_chain(label, fn, x, macs):
        def run(x0, m):
            def body(cur, _):
                y = fn(m, cur)
                return jnp.clip(y, -64, 64).astype(jnp.int8), ()
            y, _ = jax.lax.scan(body, x0, None, length=steps)
            return jnp.sum(y.astype(jnp.int32))
        runj = jax.jit(run)
        np.asarray(runj(x, mat))
        best = float('inf')
        for r in range(3):
            xr = jnp.roll(x, r + 1, axis=0)
            xr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(runj(xr, mat))
            best = min(best, time.perf_counter() - t0)
        per = best / steps
        print(f"{label}: {per*1e3:8.3f} ms/step  "
              f"{macs/per/1e12:6.1f} Tmac/s", flush=True)

    # (1) ONE plane dot: 13 batched [1536,2002]x[2002,2002]
    def one_dot(m, x):
        return jnp.einsum('lok,blk->blo', m[0], x,
                          preferred_element_type=jnp.int32).astype(jnp.int8)
    # careful: astype int8 wraps; fine for a rate probe
    def one(m, x):
        y = jnp.einsum('lok,blk->blo', m[0], x,
                       preferred_element_type=jnp.int32)
        return y  # int32; clip in chain body
    time_chain("1-plane dot  ", one, x0, B * L * N * N)

    # (2) all six plane dots, summed (reads 6 tables, no barrett)
    def six(m, x):
        y = None
        for p in range(PLANES):
            d = jnp.einsum('lok,blk->blo', m[p], x,
                           preferred_element_type=jnp.int32)
            y = d if y is None else y + d
        return y
    time_chain("6-plane dots ", six, x0, PLANES * B * L * N * N)

    # (3) transposed-rhs variant of one dot (lhs [b,k] rhs [k,o])
    matT = jnp.swapaxes(mat, -1, -2)
    def oneT(m, x):
        return jnp.einsum('lko,blk->blo', jnp.swapaxes(mat, -1, -2)[0]
                          if False else m, x,
                          preferred_element_type=jnp.int32)
    def oneT2(mT, x):
        return jnp.einsum('lko,blk->blo', mT[0],
                          x, preferred_element_type=jnp.int32)
    def time_chainT(label, fn, x, macs, m):
        def run(x0, m):
            def body(cur, _):
                y = fn(m, cur)
                return jnp.clip(y, -64, 64).astype(jnp.int8), ()
            y, _ = jax.lax.scan(body, x0, None, length=steps)
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
        per = best / steps
        print(f"{label}: {per*1e3:8.3f} ms/step  "
              f"{macs/per/1e12:6.1f} Tmac/s", flush=True)
    time_chainT("1-plane dot T", oneT2, x0, B * L * N * N, matT)

    # (4) bf16 variant: same shape at bf16 MXU rate for comparison
    matb = mat[0].astype(jnp.bfloat16)
    xb = x0.astype(jnp.bfloat16)
    def onebf(m, x):
        return jnp.einsum('lok,blk->blo', m, x,
                          preferred_element_type=jnp.float32)
    def time_bf(label, fn, x, macs, m):
        def run(x0, m):
            def body(cur, _):
                y = fn(m, cur)
                return jnp.clip(y, -64, 64).astype(jnp.bfloat16), ()
            y, _ = jax.lax.scan(body, x0, None, length=steps)
            return jnp.sum(y.astype(jnp.float32))
        runj = jax.jit(run)
        np.asarray(runj(x, m))
        best = float('inf')
        for r in range(3):
            xr = jnp.roll(x, r + 1, axis=0)
            xr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(runj(xr, m))
            best = min(best, time.perf_counter() - t0)
        per = best / steps
        print(f"{label}: {per*1e3:8.3f} ms/step  "
              f"{macs/per/1e12:6.1f} Tmac/s", flush=True)
    time_bf("1-plane bf16 ", onebf, xb, B * L * N * N, matb)


if __name__ == "__main__":
    main()
