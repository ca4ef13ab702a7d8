"""Stage-level profile of the Cooley-Tukey transform family on TPU.

Times 32-step data-dependent scan chains (bench.py methodology: distinct
buffers, scalar fetch fence) for each component of ct_fwd at the
bench_ct shapes, to locate where the 30 ms/step of the ct4096 config
goes.  Usage: python3 tools/profile_ct.py [m] [logq] [batch]
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
    from fhe_si_tpu.ops import ntt, ntt_ct
    from fhe_si_tpu.ops.modular import mod_mul

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    logq = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    p = 40961 if m == 8192 else 65537
    ctx = FheContext(m=m, log_q=logq, p=p, generator=3)
    dev = device_context(ctx)
    assert dev.use_ct
    N1, N2 = dev.ct_split
    L = ctx.num_primes
    T = dev.C['ct']
    print(f"m={m} phim={ctx.phim} L={L} lane={ctx.prime_bits}b "
          f"N1xN2={N1}x{N2} batch={batch}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, ctx.primes[:, None],
                                 size=(batch, L, ctx.phim)), jnp.int32)
    xs = jnp.asarray(ntt_ct._shape_split(x, N1, N2))   # [B, c1, L, c2]

    steps = int(os.environ.get("CT_PROFILE_STEPS", "256"))

    def chain(fn, x0, label, per_elem=None):
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
        print(f"{label:34s} {ms:8.3f} ms/step", file=sys.stderr)
        return ms

    q, qf = T['q'], T['qinv_f']
    w = ctx.wide

    meta = dev.ct_meta
    chain(lambda c: ntt_ct.ct_fwd(T, c, meta), x, "ct_fwd (full)")
    chain(lambda c: ntt_ct.ct_inv(T, ntt_ct.ct_fwd(T, c, meta), meta),
          x, "ct_fwd + ct_inv roundtrip")
    chain(lambda c: ntt.modmatmul(T['t2'], c, q, qf), xs,
          "stage matmul (t2, split layout)")
    chain(lambda c: mod_mul(c, T['tw'], q, qf, w), xs, "twiddle mod_mul")
    chain(lambda c: jnp.swapaxes(c, -1, -3) + jnp.int32(0), xs,
          "swapaxes materialize")
    from fhe_si_tpu.ops.modular import barrett
    chain(lambda c: barrett(c + c, q, qf), x, "single barrett pass")
    # dense-path comparison at the same data volume: one [N x N] matmul
    # would not fit; instead time the *narrow* elementwise lift path
    chain(lambda c: dev._fwd_t(dev._full_as_subset(dev.C), c), x,
          "dev._fwd_t (dispatch wrapper)")

    # ---- scheme-level sub-stages at the bench_ct batch (B ciphertexts)
    from fhe_si_tpu import sampling, scheme
    B = batch // 2
    src = sampling.RandomSource(7)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)),
                    src)
    a = jnp.broadcast_to(c1.parts[None], (B,) + tuple(c1.parts.shape))
    C = dev.C
    mat = ksw.matrix_evals
    print(f"scheme probes: B={B} parts{tuple(c1.parts.shape)} "
          f"n_ct={dev.n_ct} ksw_rows={len(ctx.ksw_rows)}", file=sys.stderr)

    def vchain(fn, x0, label, extra=None):
        # NATIVE batch (no vmap): the pipelines are rank-generic and
        # flatten leading dims to the fast 3-D shapes internally
        def body(cur, _):
            return (fn(cur) if extra is None else fn(cur, extra)), ()

        f = jax.jit(lambda z: jnp.sum(
            jax.lax.scan(body, z, None, length=steps)[0]))
        np.asarray(f(x0))
        best = float("inf")
        for r in range(3):
            xr = jnp.roll(x0, r + 1, axis=0)
            xr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(f(xr))
            best = min(best, time.perf_counter() - t0)
        ms = best / steps * 1e3
        print(f"{label:34s} {ms:8.3f} ms/step ({ms/B*1e3:6.1f} us/ct)",
              file=sys.stderr)
        return ms

    vchain(lambda p_: dev._reduce_signed(
        C, dev._to_poly(C, dev._from_poly(C, p_))), a,
        "lift + unlift + reduce")
    from fhe_si_tpu.ops import crt as crt_ops

    def crt_roundtrip(p_):
        # CRT both ways WITHOUT the NTTs (timing probe: feeds raw
        # residues to the prescaled reconstruction, values meaningless)
        Tf = dev._full_as_subset(C)
        wrap = dev._wrap_const(ctx.primes, p_.shape[-1])
        res = crt_ops.limbs_to_residues(p_, Tf['chunk_tbl'], wrap,
                                        Tf['q'], Tf['qinv_f'], ctx.wide)
        limbs = crt_ops.residues_to_limbs_fast(res, Tf['fast_crt'], Tf['q'],
                                               Tf['qinv_f'], prescaled=True,
                                               wide=ctx.wide)
        return dev._reduce_signed(C, limbs)

    vchain(crt_roundtrip, a, "crt both ways, no NTT")
    vchain(lambda p_: dev._scale_down(
        C, dev._tensor_mul(C, p_, jnp.roll(p_, 1, -2)))[:, :2], a,
        "tensor_mul + scale_down")
    vchain(lambda p_, m_: dev._mul_relin(C, p_, jnp.roll(p_, 1, -2), m_), a,
        "full mul_relin", extra=mat)

    # inside the keyswitch stage: 3-part input like scale_down's output
    a3 = jnp.concatenate([a, a[:, :1]], axis=1)       # [B, 3, phim, n_ct]
    Lk = len(ctx.ksw_rows)

    vchain(lambda p_, m_: jnp.concatenate(
        [dev._keyswitch_parts(C, p_, m_),
         p_[:, :1]], axis=1), a3, "keyswitch_parts (3-part in)", extra=mat)

    def digits_probe(p_):
        ev = dev._digit_evals(C, p_)              # [B, rows, Lk, phim]
        back = jnp.swapaxes(ev[:, :3, :dev.n_ct, :], -1, -2)
        return back % jnp.int32(1 << 16)
    vchain(digits_probe, a3, "digit_evals only (decomp+fwd)")

    from fhe_si_tpu.ops import limbs as lb
    K = dev._ksw_tables(C)
    kprimes = ctx.primes[np.asarray(ctx.ksw_rows)]

    def decomp_only(p_):
        digs = lb.byte_decomp(p_, ctx.log_q, dev.digit_bits, dev.ndigits,
                              C['q_limbs'])
        digs = jnp.moveaxis(digs, -1, -2).reshape(p_.shape[0], -1, ctx.phim)
        res = barrett(digs[..., None, :], K['q'], K['qinv_f'])
        back = jnp.swapaxes(res[:, :3, :dev.n_ct, :], -1, -2)
        return back % jnp.int32(1 << 16)
    vchain(decomp_only, a3, "byte_decomp + residues only")

    dsub = jnp.broadcast_to(
        jnp.asarray(rng.integers(0, kprimes[:, None],
                                 size=(12, Lk, ctx.phim)), jnp.int32)[None],
        (B, 12, Lk, ctx.phim))
    vchain(lambda d_: dev._fwd_t(K, d_), dsub, "subset ct_fwd on digit shape")

    draw = jnp.broadcast_to(
        jnp.asarray(rng.integers(0, 1 << 24, size=(12, ctx.phim)),
                    jnp.int32)[None], (B, 12, ctx.phim))
    vchain(lambda d_: jnp.sum(
        ntt_ct.ct_fwd_digits(K['ct'], d_, dev.ct_meta, dev.digit_bits),
        axis=-2) % jnp.int32(1 << 24),
        draw, "ct_fwd_digits (fast digit path)")

    from fhe_si_tpu.ops.modular import mod_dot
    rows = mat.shape[1]
    dg = jnp.broadcast_to(
        jnp.asarray(rng.integers(0, kprimes[:, None],
                                 size=(rows, Lk, ctx.phim)), jnp.int32)[None],
        (B, rows, Lk, ctx.phim))

    def dot_probe(d_, m_):
        K = dev._ksw_tables(C)
        md = (m_ if K['rows'] is None
              else jnp.take(m_, K['rows'], axis=2))
        acc = mod_dot(md, d_[..., None, :, :, :], K['q'], K['qinv_f'],
                      axis=-3, wide=ctx.wide)
        return jnp.concatenate(
            [jnp.broadcast_to(acc[:, :1], (acc.shape[0], rows - 2)
                              + acc.shape[2:]), acc], axis=1)
    vchain(dot_probe, dg, "ksw mod_dot only", extra=mat)


if __name__ == "__main__":
    main()
