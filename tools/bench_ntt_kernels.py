"""Microbenchmark: einsum NTT vs Pallas fused NTT at production shapes.

Shapes mirror the big-config mul+relin stages (p=4007, phim=2002, L=21,
ksw subset 13 rows):
  lift      x[128, 21, 2002]   (batch 64 x 2 parts, full chain)
  digits    x[1536, 13, 2002]  (batch 64 x 24 digit rows, subset basis)

Chained-scan timing per bench.py methodology (axon launch overhead ~25ms
amortized over steps inside one jit).

Usage: python3 tools/bench_ntt_kernels.py [steps]
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
    from fhe_si_tpu.ops import ntt

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    p, log_q = 4007, 170
    g = numbth.find_group_generator(p - 1)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g)
    dev = device_context(ctx)
    C = dev.C
    K = C['ksw']
    rng = np.random.default_rng(0)

    # Tables MUST be jit ARGUMENTS, not closures: closed-over device
    # arrays lower to HLO constants and the axon remote compiler rejects
    # the oversized payload (see device.py docstring).
    def time_one(label, fn, x_np, tables, n_transforms):
        x = jnp.asarray(x_np)

        def run(x0, c, q, i):
            def body(cur, _):
                y = fn(c, cur, q, i)
                # data-dependent perturb: residues stay valid, no folding
                return jnp.where(y > 0, y - 1, y), ()
            y, _ = jax.lax.scan(body, x0, None, length=steps)
            return jnp.sum(y)

        runj = jax.jit(run)
        np.asarray(runj(x, *tables))  # compile+warm
        best = float('inf')
        for r in range(3):
            xr = jnp.roll(x, r + 1, axis=0)
            xr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(runj(xr, *tables))
            best = min(best, time.perf_counter() - t0)
        per_step = best / steps
        print(f"{label}: {per_step*1e3:8.3f} ms/step "
              f"({n_transforms/per_step:12.0f} transforms/s)", flush=True)
        return per_step

    L = ctx.num_primes
    Lk = len(ctx.ksw_rows)
    shapes = [
        (f"lift  full-chain [128,{L},2002]",
         rng.integers(0, 1 << 20, (128, L, 2002)).astype(np.int32) % np.asarray(ctx.primes)[None, :, None],
         (C['fwd_chunks'], C['q'], C['qinv_f']), 128 * L),
        (f"digit subset    [1536,{Lk},2002]",
         rng.integers(0, 1 << 20, (1536, Lk, 2002)).astype(np.int32) % np.asarray(ctx.primes)[ctx.ksw_rows][None, :, None],
         (K['fwd_chunks'], K['q'], K['qinv_f']), 1536 * Lk),
    ]
    from fhe_si_tpu.ops import pallas_ntt
    for label, x_np, tables, n_t in shapes:
        time_one(f"einsum {label}", ntt.modmatmul, x_np, tables, n_t)
        tt = tables  # kernel consumes the native chunk layout now
        for tb, to in ((128, 256), (256, 256), (256, 512), (512, 256)):
            try:
                time_one(f"pallas b{tb} o{to} {label}",
                         lambda c, x, q, i, tb=tb, to=to:
                         pallas_ntt.modmatmul_pallas(c, x, q, i, tile_o=to,
                                                     tile_b=tb),
                         x_np, tt, n_t)
            except Exception as e:
                print(f"pallas b{tb} o{to} {label}: FAILED "
                      f"{type(e).__name__}", flush=True)

    # raw-digit path: [1536, 2002] int32 digits < 2^24, broadcast over the
    # 13 subset primes in-kernel (vs einsum on materialized residues)
    digs = rng.integers(0, 1 << 24, (1536, 2002)).astype(np.int32)
    ktab = (K['fwd_chunks'], K['q'], K['qinv_f'])
    for tb, to in ((128, 256), (256, 256), (256, 512)):
        try:
            def raw(c, x, q, i, tb=tb, to=to):
                y = pallas_ntt.modmatmul_pallas_raw(c, x, q, i, tile_o=to,
                                                    tile_b=tb)
                return jnp.max(y, axis=-2)  # back to x's shape for chaining
            time_one(f"pallas-raw b{tb} o{to} digit [1536,2002]x{Lk}",
                     raw, digs, ktab, 1536 * Lk)
        except Exception as e:
            print(f"pallas-raw b{tb} o{to}: FAILED {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
