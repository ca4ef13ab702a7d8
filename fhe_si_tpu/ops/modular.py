"""Vectorized modular arithmetic for int32 lanes (VPU-friendly).

TPU has no 64-bit integer multiply, so every product is kept below 2^31
by construction and quotients are estimated in float32 ("f32 Barrett"):

    t < 2^31 exactly held in int32
    quo = rint(f32(t) * f32(1/q))        |error| <= 1/2 + (t/q) * 2^-23 < 1
    r   = t - quo*q   in (-q, 2q)  ->  two conditional corrections

This replaces NTL's MulMod/mulmod_precon in the DoubleCRT elementwise
loops (reference DoubleCRT.cpp:104-111).  Two residue lanes exist:

  narrow (default): chain primes < 2^20 (context.PRIME_MAX_BITS); a full
      20x20-bit modular multiply splits each operand at 10 bits and uses
      two Barrett steps; all intermediates stay int32-exact.
  wide (wide=True): chain primes < 2^23 (context.PRIME_MAX_BITS_WIDE),
      needed once the ring index m reaches 2^14 — only 9 primes q = 1
      (mod 2^14) exist below 2^20, starving the chain.  The multiply is
      a 4-step Horner over unsigned 6-bit digits of `a`: every step is
      (r << 6) + a_i*b with r < 2^23 -> r<<6 < 2^29, a_i*b < 2^6 * 2^23
      = 2^29, sum < 2^30 — int32-exact, and the f32 quotient stays off
      by < 1 (t/q * 2^-23 < 2^-15 for q >= 2^14).

The `wide` flag is a trace-time constant (one context = one lane), so
jit specializes each pipeline to exactly one code path.
"""
from __future__ import annotations

import jax.numpy as jnp

D = 10           # split point for narrow-lane modmul
DMASK = (1 << D) - 1
DW = 12          # split point for wide-lane dot products
DWMASK = (1 << DW) - 1


def barrett(t, q, qinv_f):
    """t mod q for int32 t with |t| < 2^31 (t may be any sign).

    q: int32 (broadcastable), qinv_f: float32 1/q (broadcastable).
    """
    quo = jnp.rint(t.astype(jnp.float32) * qinv_f).astype(jnp.int32)
    r = t - quo * q  # int32 wraparound is exact mod 2^32; true r is small
    r = jnp.where(r < 0, r + q, r)
    r = jnp.where(r >= q, r - q, r)
    return r


def mod_mul(a, b, q, qinv_f, wide: bool = False):
    """(a*b) mod q for residues a, b in [0, q).

    narrow (q < 2^20): split at 10 bits,
        a*b = (a1*b1)*2^20 + (a1*b0 + a0*b1)*2^10 + a0*b0;
    a1*b1 < 2^20 needs no reduction; two Barrett steps finish the Horner
    combine with every intermediate < 2^31.

    wide (q < 2^23): 4-step Horner over unsigned 6-bit digits of a
    (a < 2^23 -> top digit a>>18 < 2^5); every step is
    (r << 6) + a_i*b < 2^29 + 2^29 — int32-exact (module header).
    """
    if wide:
        r = barrett((a >> 18) * b, q, qinv_f)               # < 2^28
        r = barrett((r << 6) + ((a >> 12) & 63) * b, q, qinv_f)
        r = barrett((r << 6) + ((a >> 6) & 63) * b, q, qinv_f)
        return barrett((r << 6) + (a & 63) * b, q, qinv_f)
    a1, a0 = a >> D, a & DMASK
    b1, b0 = b >> D, b & DMASK
    h = a1 * b1                              # < 2^20
    t = (h << D) + a1 * b0 + a0 * b1         # < 2^30 + 2^21
    tm = barrett(t, q, qinv_f)
    u = (tm << D) + a0 * b0                  # < 2^30 + 2^20
    return barrett(u, q, qinv_f)


def mod_dot(a, b, q, qinv_f, axis: int, wide: bool = False):
    """Exact (sum_k a_k * b_k) mod q, reduced ONCE instead of per term.

    Replaces a chain of mod_mul/mod_add (the KeySwitchSI::ApplyKeySwitch
    dot, FHE-SI.cpp:246-254): split both operands, accumulate the
    partial-product sums UNREDUCED, then a Barrett-Horner.
    ~2.5x less VPU work than K mod_muls for K ~ 24.

    narrow: 10-bit splits, terms < 2^20, K <= 512.
    wide:   12-bit splits (lo < 2^12, hi < 2^11); ll <= K*2^24 and
            lh <= 2K*2^23 cap K at 64 ((r<<6) + partial < 2^29 + 2^30
            stays int32-exact); the 12-bit Horner shifts run as two
            6-bit hops.  K = parts*ndigits <= 4*ceil(logQ/8) stays far
            below 64 at every supported logQ.
    """
    K = a.shape[axis] if a.shape[axis] != 1 else b.shape[axis]
    if wide:
        assert K <= 64, "mod_dot(wide): too many terms for unreduced accumulation"
        a_lo, a_hi = a & DWMASK, a >> DW
        b_lo, b_hi = b & DWMASK, b >> DW
        ll = jnp.sum(a_lo * b_lo, axis=axis)          # <= K * 2^24
        lh = (jnp.sum(a_lo * b_hi, axis=axis)
              + jnp.sum(a_hi * b_lo, axis=axis))      # <= 2K * 2^23
        hh = jnp.sum(a_hi * b_hi, axis=axis)          # <= K * 2^22
        r = barrett(hh, q, qinv_f)
        r = barrett(r << 6, q, qinv_f)
        r = barrett((r << 6) + lh, q, qinv_f)         # < 2^29 + 2^30
        r = barrett(r << 6, q, qinv_f)
        return barrett((r << 6) + ll, q, qinv_f)      # < 2^29 + 2^30
    assert K <= 512, "mod_dot: too many terms for unreduced accumulation"
    a_lo, a_hi = a & DMASK, a >> D
    b_lo, b_hi = b & DMASK, b >> D
    ll = jnp.sum(a_lo * b_lo, axis=axis)          # < K * 2^20
    lh = (jnp.sum(a_lo * b_hi, axis=axis)
          + jnp.sum(a_hi * b_lo, axis=axis))      # < 2K * 2^20
    hh = jnp.sum(a_hi * b_hi, axis=axis)          # < K * 2^20
    r = barrett(hh, q, qinv_f)
    r = barrett((r << D) + lh, q, qinv_f)         # < 2^30 + 2K*2^20
    return barrett((r << D) + ll, q, qinv_f)      # < 2^30 + K*2^20


def mod_add(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def mod_sub(a, b, q):
    s = a - b
    return jnp.where(s < 0, s + q, s)


def mod_neg(a, q):
    return jnp.where(a == 0, a, q - a)
