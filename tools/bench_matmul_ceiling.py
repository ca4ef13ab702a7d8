"""Measure the practical ceiling of plain s8xs8->s32 einsums at the NTT
shape — the digit stage's MXU work WITHOUT the modular epilogue — to
locate how much of the 394 Tops/s v5e peak XLA itself delivers here.

Usage: python3 tools/bench_matmul_ceiling.py [rows] [L] [steps]
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

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    phim = 2002

    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.integers(-64, 65, (6, L, phim, phim)), jnp.int8)
    x = jnp.asarray(rng.integers(-64, 65, (rows, L, phim)), jnp.int8)

    def run(mat, x0):
        def body(cur, _):
            acc = None
            for plane in range(6):
                p = jnp.einsum('lok,...lk->...lo', mat[plane], cur,
                               preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
            # data-dependent int8 carry, epilogue-free
            return (acc & 63).astype(jnp.int8), ()
        y, _ = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(y.astype(jnp.int32))

    fn = jax.jit(run)
    np.asarray(fn(mat, x))
    best = float("inf")
    for r in range(3):
        xr = jnp.roll(x, r + 1, axis=0)
        xr.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(fn(mat, xr))
        best = min(best, time.perf_counter() - t0)
    per = best / steps
    ops = rows * L * 6 * 2 * phim * phim
    print(f"plain 6-dot s8 einsum [{rows},{L},{phim}]x[{phim},{phim}]: "
          f"{per*1e3:.2f} ms/step = {ops/per/1e12:.1f} Tops/s "
          f"({ops/per/394e12*100:.0f}% of v5e int8 peak)")


if __name__ == "__main__":
    main()
