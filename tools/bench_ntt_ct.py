"""Throughput of the Cooley-Tukey large-m NTT (ops/ntt_ct.py) at
phim = 2^13 (m = 2^14) — the scale the dense-table path cannot reach
(O(L*phim^2) tables ~ 400 MB/prime/plane).  Chained-scan timing per
bench.py methodology.

Usage: python3 tools/bench_ntt_ct.py [batch] [steps]
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
    from fhe_si_tpu.hostmath import numbth
    from fhe_si_tpu.ops import ntt_ct

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    m, L = 1 << 14, 9            # all nine 20-bit primes = 1 mod 2^14
    primes = []
    t = (1 << 20) // m
    while len(primes) < L and t > 0:
        q = t * m + 1
        if numbth.is_prime(q):
            primes.append(q)
        t -= 1
    roots = [numbth.find_element_of_order(q, m) for q in primes]
    tab = ntt_ct.CtNttTables(m, primes, roots)
    T = tab.pack()
    N = m // 2
    rng = np.random.default_rng(0)
    res = np.stack([rng.integers(0, int(q), (batch, N)) for q in primes],
                   axis=1)
    x = jnp.asarray(res, jnp.int32)

    def run(T, x0):
        def body(cur, _):
            y = ntt_ct.ct_inv(T, ntt_ct.ct_fwd(T, cur, tab.meta),
                              tab.meta)
            return y, ()
        y, _ = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(y)

    fn = jax.jit(run)
    np.asarray(fn(T, x))
    best = float("inf")
    for r in range(3):
        xr = jnp.roll(x, r + 1, axis=0)
        xr.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(fn(T, xr))
        best = min(best, time.perf_counter() - t0)
    per_rt = best / steps
    n_tr = batch * L * 2  # fwd+inv per prime per batch row
    tbl_mb = (tab.t1_chunks.nbytes + tab.t2_chunks.nbytes + tab.tw.nbytes
              + tab.tw.nbytes + tab.twi.nbytes
              + tab.t1i_chunks.nbytes + tab.t2i_chunks.nbytes) / 1e6
    print(f"CT-NTT phim={N} L={L} batch={batch}: {per_rt*1e3:.2f} ms/roundtrip"
          f" ({n_tr/per_rt:,.0f} transforms/s); tables {tbl_mb:.1f} MB total"
          f" (dense would be {L * 2 * 6 * N * N / 1e9:.0f} GB)")


if __name__ == "__main__":
    main()
