"""Benchmark: homomorphic mults/s per chip at the canonical config
(logQ=80, p=23, g=7 — README:45-48), tensor-mul + full relinearization.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "mults/s", "vs_baseline": N,
   "big": N, "ct4096": N, "ntt_v3": N, "scaledown_v3_ms": N}

value/vs_baseline follow the driver contract; the secondary keys pin the
numbers that matter for round-over-round comparison: the regression-scale
dense config (big: p=4007 phim=2002 L=21 logQ=170), the Cooley-Tukey
power-of-two config (ct4096: m=2^13 phim=4096 logQ=80, plus its MFU as
mfu_ct), the wide-lane config (ct8k: m=2^14 logQ=170, 23-bit lane), and
the pinned NTT/ScaleDown probes.

vs_baseline divides by the measured single-threaded CPU rate of the
pure-Python oracle (hostmath/oracle.py), which faithfully implements the
reference algorithms; NTL is not installed in this image (BASELINE.md).

Timing methodology (hard-won, see tools/profile_*.py): on the axon
runtime block_until_ready is NOT a reliable execution fence, identical-
input launches can be memoized, and each launch pays ~25 ms of tunnel
overhead (measured: a trivial 8-step scan costs 25.7 ms wall —
tools/bench_scan_overhead.py).  Honest rates therefore require all of:
  1. `steps` data-dependent mul+relins chained inside ONE jit (lax.scan)
     with steps LARGE enough that the 25 ms launch cost is noise
     (steps=32 -> <0.8 ms/step bias; lax.scan itself adds no per-step
     cost on this runtime),
  2. DISTINCT multiplicands per step (a squaring chain lets XLA CSE the
     two operand lifts into one; the reference benchmark op multiplies
     two different ciphertexts),
  3. a distinct input buffer for every launch,
  4. fetching a scalar reduction of the result (real bytes, tiny payload).
Reported rate = best of `reps` launches (machine is shared/noisy).
"""
import json
import sys
import time

import numpy as np


def _setup_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/fhe_si_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _chain_rate(dev, matrix, a, steps, reps=3):
    """mults/s of `steps` chained batched mul+relins inside one jit."""
    import jax
    import jax.numpy as jnp

    batch = a.shape[0]

    def chain(C, x, matrix):
        def body(cur, _):
            # rolling the limb tensor along phim gives a DISTINCT second
            # multiplicand (a valid ciphertext of a rotated polynomial),
            # so the two operand lifts cannot be CSE'd into one.
            # _mul_relin_b picks the family-appropriate batch lowering
            # (vmap for the tiny/dense family, native for CT —
            # device.py measurement note).
            other = jnp.roll(cur, 1, axis=-2)
            return dev._mul_relin_b(C, cur, other, matrix), ()

        y, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.sum(y)

    fn = jax.jit(chain)
    np.asarray(fn(dev.C, a, matrix))  # compile + warm
    best = float("inf")
    for r in range(reps):
        x = jnp.roll(a, r + 1, axis=0)  # distinct buffer per launch
        x.block_until_ready()
        t0 = time.perf_counter()
        y = fn(dev.C, x, matrix)
        np.asarray(y)  # scalar fetch = the only honest fence
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best, best / steps


# Secondary-probe shapes are PINNED independently of the main `steps`
# parameter so BENCH_r* numbers stay round-comparable (round 2 changed
# steps 8 -> 32 and the recorded NTT rate moved ~6x for probe reasons,
# not kernel reasons).  Bump the version suffix if a probe must change.
NTT_PROBE = dict(version="v3", batch=2048, steps=32)
SCALE_PROBE = dict(version="v3", steps=32)


def bench_device(batch=16384, steps=32):
    import jax
    import jax.numpy as jnp
    from fhe_si_tpu import sampling, scheme
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context

    ctx = FheContext(m=22, log_q=80, p=23, generator=7)
    dev = device_context(ctx)
    src = sampling.RandomSource(7)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))

    rate, step_s = _chain_rate(dev, ksw.matrix_evals, a, steps)

    # secondary: NTT throughput (chained fwd+inv round trips keep the
    # residues valid and the chain data-dependent) and ScaleDown latency
    # — probe shapes pinned (NTT_PROBE/SCALE_PROBE), NOT tied to `steps`
    ntt_steps = NTT_PROBE["steps"]

    def ntt_chain(C, x):
        # fwd + RAW inverse roundtrip on the full chain — identical
        # semantics to the v3 probe; the primitives moved behind the
        # per-basis transform-family dispatch (_fwd_t / ntt_inv path)
        def body(cur, _):
            ev = dev._fwd_t(dev._full_as_subset(C), cur)
            if dev.use_ct:
                from fhe_si_tpu.ops import ntt_ct
                back = ntt_ct.ct_inv(C['ct'], ev, dev.ct_meta)
            else:
                back = dev._ntt_raw(C['inv_chunks'], ev, C['q'], C['qinv_f'])
            return back, ()
        y, _ = jax.lax.scan(body, x, None, length=ntt_steps)
        return jnp.sum(y)

    a_ntt = a[:NTT_PROBE["batch"]]
    ev = dev.from_poly(a_ntt)  # [B, 2, L, phim]
    res = dev.ntt_inv(ev)
    fn = jax.jit(ntt_chain)
    np.asarray(fn(dev.C, res))
    dt = float("inf")
    for r in range(3):
        x = jnp.roll(res, r + 1, axis=0)
        x.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(fn(dev.C, x))
        dt = min(dt, time.perf_counter() - t0)
    ntt_rate = a_ntt.shape[0] * 2 * ctx.num_primes * 2 * ntt_steps / dt

    sd_steps = SCALE_PROBE["steps"]

    def sd_chain(C, t):
        def body(cur, _):
            parts = dev._scale_down(C, cur)
            # re-lift to keep shapes static and the chain data-dependent
            return dev._from_poly(C, parts), ()
        y, _ = jax.lax.scan(body, t, None, length=sd_steps)
        return jnp.sum(y)

    tens = dev.tensor_mul_op(c1.parts, c1.parts)
    fn = jax.jit(sd_chain)
    np.asarray(fn(dev.C, tens))
    scale_ms = float("inf")
    for r in range(3):
        # roll along phim: distinct buffer, entries remain valid residues
        x = jnp.roll(tens, r + 1, axis=-1)
        x.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(fn(dev.C, x))
        scale_ms = min(scale_ms, (time.perf_counter() - t0) / sd_steps * 1e3)

    print(f"[bench] device: {rate:.1f} mults/s (batch={batch}, "
          f"{steps} chained steps, {step_s*1e3:.2f} ms/step); "
          f"NTT[{NTT_PROBE['version']}] {ntt_rate:.0f} transforms/s "
          f"(batch={NTT_PROBE['batch']}, steps={ntt_steps}); "
          f"ScaleDown+lift[{SCALE_PROBE['version']}] {scale_ms:.2f} ms "
          f"(unbatched, steps={sd_steps})", file=sys.stderr)
    return rate, ntt_rate, scale_ms


def bench_oracle(iters=5):
    from fhe_si_tpu import sampling
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.hostmath import oracle

    ctx = FheContext(m=22, log_q=80, p=23, generator=7)
    src = sampling.RandomSource(7)
    sk, pk = oracle.keygen(ctx, sampling.sample_keygen(src, ctx.phim, ctx.stdev,
                                                       ctx.log_q))
    ksw = oracle.keyswitch_init_s2(sk, sampling.sample_keyswitch(
        src, ctx.phim, ctx.stdev, ctx.log_q, 3, ctx.ndigits))
    m1 = src.uniform_mod_p(ctx.phim, ctx.p)
    m2 = src.uniform_mod_p(ctx.phim, ctx.p)
    c1 = oracle.encrypt(pk, m1, sampling.sample_encrypt(src, ctx.phim, ctx.stdev))
    c2 = oracle.encrypt(pk, m2, sampling.sample_encrypt(src, ctx.phim, ctx.stdev))

    t0 = time.perf_counter()
    for _ in range(iters):
        oracle.apply_keyswitch(ksw, oracle.mul(c1, c2))
    rate = iters / (time.perf_counter() - t0)
    print(f"[bench] oracle CPU baseline: {rate:.1f} mults/s", file=sys.stderr)
    return rate


def bench_big(p=4007, log_q=170, batch=64, steps=16):
    """Regression-scale config (phim=2002, dense transform family)."""
    import jax.numpy as jnp
    from fhe_si_tpu import sampling, scheme
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context
    from fhe_si_tpu.hostmath import numbth

    g = numbth.find_group_generator(p - 1)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g)
    dev = device_context(ctx)
    src = sampling.RandomSource(1)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    rate, step_s = _chain_rate(dev, ksw.matrix_evals, a, steps)
    print(f"[bench] BIG config p={p} phim={ctx.phim} L={ctx.num_primes} "
          f"logQ={log_q}: {rate:.1f} mults/s (batch={batch}, {steps} chained "
          f"steps, {step_s*1e3:.1f} ms/step)", file=sys.stderr)
    return rate


def bench_ct(m=8192, p=40961, log_q=80, batch=64, steps=32):
    """Power-of-two-m config riding the Cooley-Tukey transform family —
    phim=4096 by default, the first scheme-level shape past the dense
    family's ~2 GB table wall.  Derives the int8-op count per mult from
    the static transform structure and reports sustained Tops/s + MFU."""
    import jax.numpy as jnp
    from fhe_si_tpu import sampling, scheme
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context

    ctx = FheContext(m=m, log_q=log_q, p=p, generator=3)
    dev = device_context(ctx)
    assert dev.use_ct
    src = sampling.RandomSource(1)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    a = jnp.broadcast_to(c1.parts[None], (batch,) + tuple(c1.parts.shape))
    rate, step_s = _chain_rate(dev, ksw.matrix_evals, a, steps)

    # int8 MACs per prime-transform: n_dots * N * (N1 + N2) (two matmul
    # stages of the two-level factorization over the padded length
    # N = m/2 >= phim, ops/ntt_ct.py)
    N1, N2 = dev.ct_split
    n_dots = 9 if ctx.wide else 6
    macs_pt = n_dots * (N1 * N2 * (N1 + N2))
    L, Lk = ctx.num_primes, len(ctx.ksw_rows)
    # transforms per mul+relin: 4 lifts (full chain) + 3 ScaleDown iNTTs
    # + 2*ndigits digit NTTs + 2 keyswitch iNTTs (subset basis)
    n_tf = 4 * L + 3 * L + (2 * ctx.ndigits + 2) * Lk
    tops = rate * n_tf * macs_pt * 2 / 1e12   # MAC = 2 ops
    mfu = 100 * tops / 394
    print(f"[bench] CT config m={m} phim={ctx.phim} L={L} logQ={log_q} "
          f"lane={ctx.prime_bits}b N1xN2={N1}x{N2}: {rate:.1f} mults/s "
          f"(batch={batch}, {steps} steps, {step_s*1e3:.1f} ms/step); "
          f"{n_tf} prime-transforms/mult x {macs_pt/1e6:.1f} MMACs = "
          f"{tops:.1f} Tops/s sustained = {mfu:.1f}% of v5e int8 peak",
          file=sys.stderr)
    return rate, mfu


def main():
    _setup_cache()
    dev_rate, ntt_rate, scale_ms = bench_device()
    cpu_rate = bench_oracle()
    big_rate = bench_big()
    ct_rate, ct_mfu = bench_ct()
    # wide-lane (23-bit, m >= 2^14) config: pinned in the driver JSON so
    # the 9-dot/7-group machinery's real cost is machine-recorded (r4
    # verdict: "nobody knows what it costs in practice")
    ct8k_rate, _ = bench_ct(m=16384, p=65537, log_q=170, batch=16, steps=8)
    # mixed-radix ring (m = 2^12*5, phim = 8192): the round-5 family
    # extension past power-of-two m — the first TPU number for a
    # non-2^k ring beyond the dense-table wall
    ct20k_rate, _ = bench_ct(m=20480, p=40961, log_q=80, batch=16, steps=8)
    # one driver-parsed line; secondary keys make rounds machine-comparable
    # (round-3 verdict: the meaningful numbers lived only in stderr prose)
    print(json.dumps({
        "metric": "homomorphic mults/s per chip (logQ=80, mul+relin)",
        "value": round(dev_rate, 1),
        "unit": "mults/s",
        "vs_baseline": round(dev_rate / cpu_rate, 2),
        "big": round(big_rate, 1),
        "ct4096": round(ct_rate, 1),
        "mfu_ct": round(ct_mfu, 2),
        "ct8k": round(ct8k_rate, 1),
        "ct20k_mixedradix": round(ct20k_rate, 1),
        "ntt_v3": round(ntt_rate),
        "scaledown_v3_ms": round(scale_ms, 3),
    }))


if __name__ == "__main__":
    main()
