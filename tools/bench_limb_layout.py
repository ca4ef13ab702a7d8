"""Probe: limb-tensor layout for the VPU elementwise ops.

Current layout puts the limb axis LAST ([..., phim, n]); per-limb ops
slice a[..., k] — stride-n access.  Candidate layout puts limbs
second-to-last ([..., n, phim]) so each per-limb step reads a contiguous
[..., phim] vector.  Times normalize/add/reduce/byte_decomp-style chains
at big-config shapes in both layouts, chained inside one jit per the
bench.py methodology.

Usage: python3 tools/bench_limb_layout.py [batch] [steps]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    phim, n = 2002, 11
    LIMB_BITS, LIMB_MASK = 16, (1 << 16) - 1
    rng = np.random.default_rng(0)
    x_last = jnp.asarray(rng.integers(0, 1 << 16,
                                      (batch, 3, phim, n), dtype=np.int64),
                         jnp.int32)
    x_mid = jnp.moveaxis(x_last, -1, -2)          # [batch, 3, n, phim]

    def normalize_last(acc):
        out = []
        carry = jnp.zeros_like(acc[..., 0])
        for k in range(acc.shape[-1]):
            v = acc[..., k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(out, axis=-1)

    def normalize_mid(acc):
        out = []
        carry = jnp.zeros_like(acc[..., 0, :])
        for k in range(acc.shape[-2]):
            v = acc[..., k, :] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(out, axis=-2)

    def digits_last(a):
        # byte_decomp-ish: 8 digit extractions of 24 bits across limbs
        outs = []
        for j in range(8):
            k0, off = divmod(24 * j, 16)
            v = a[..., k0] >> off
            got = 16 - off
            idx = 1
            while got < 24:
                if k0 + idx < a.shape[-1]:
                    v = v | (a[..., k0 + idx] << got)
                got += 16
                idx += 1
            outs.append(v & ((1 << 24) - 1))
        return jnp.stack(outs, axis=-1)

    def digits_mid(a):
        outs = []
        for j in range(8):
            k0, off = divmod(24 * j, 16)
            v = a[..., k0, :] >> off
            got = 16 - off
            idx = 1
            while got < 24:
                if k0 + idx < a.shape[-2]:
                    v = v | (a[..., k0 + idx, :] << got)
                got += 16
                idx += 1
            outs.append(v & ((1 << 24) - 1))
        return jnp.stack(outs, axis=-3)

    def chain(fn, x):
        def body(cur, _):
            out = fn(cur)
            s = jnp.sum(out).astype(jnp.int32)
            nxt = jnp.where(s == jnp.int32(-(1 << 31)), cur + 1, cur)
            return nxt, ()
        y, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.sum(y)

    def run(label, fn, x):
        f = jax.jit(lambda x: chain(fn, x))
        np.asarray(f(x))
        best = float("inf")
        for r in range(3):
            xr = jnp.roll(x, r + 1, axis=0)
            xr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(f(xr))
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:28s} {best/steps*1e3:8.3f} ms/step", flush=True)

    run("normalize (limbs LAST)", lambda a: normalize_last(a + a), x_last)
    run("normalize (limbs MID)", lambda a: normalize_mid(a + a), x_mid)
    run("digits24 (limbs LAST)", digits_last, x_last)
    run("digits24 (limbs MID)", digits_mid, x_mid)
    # pure elementwise baseline (layout shouldn't matter)
    run("elementwise and/shift LAST", lambda a: (a & LIMB_MASK) + (a >> 3),
        x_last)
    run("elementwise and/shift MID", lambda a: (a & LIMB_MASK) + (a >> 3),
        x_mid)


if __name__ == "__main__":
    main()
