"""Vectorized modular arithmetic for int32 lanes (VPU-friendly).

TPU has no 64-bit integer multiply, so every product is kept below 2^31
by construction and quotients are estimated in float32 ("f32 Barrett"):

    t < 2^31 exactly held in int32
    quo = rint(f32(t) * f32(1/q))        |error| <= 1/2 + (t/q) * 2^-23 < 1
    r   = t - quo*q   in (-q, 2q)  ->  two conditional corrections

This replaces NTL's MulMod/mulmod_precon in the DoubleCRT elementwise
loops (reference DoubleCRT.cpp:104-111).  Chain primes are < 2^20
(context.PRIME_MAX_BITS), so a full 20x20-bit modular multiply splits
each operand at 10 bits and uses two Barrett steps; all intermediates
stay int32-exact.
"""
from __future__ import annotations

import jax.numpy as jnp

D = 10           # split point for full-width modmul
DMASK = (1 << D) - 1


def barrett(t, q, qinv_f):
    """t mod q for int32 t with |t| < 2^31 (t may be any sign).

    q: int32 (broadcastable), qinv_f: float32 1/q (broadcastable).
    """
    quo = jnp.rint(t.astype(jnp.float32) * qinv_f).astype(jnp.int32)
    r = t - quo * q  # int32 wraparound is exact mod 2^32; true r is small
    r = jnp.where(r < 0, r + q, r)
    r = jnp.where(r >= q, r - q, r)
    return r


def mod_mul(a, b, q, qinv_f):
    """(a*b) mod q for residues a, b in [0, q), q < 2^20.

    Split at 10 bits:  a*b = (a1*b1)*2^20 + (a1*b0 + a0*b1)*2^10 + a0*b0.
    a1*b1 < 2^20 needs no reduction; two Barrett steps finish the Horner
    combine with every intermediate < 2^31.
    """
    a1, a0 = a >> D, a & DMASK
    b1, b0 = b >> D, b & DMASK
    h = a1 * b1                              # < 2^20
    t = (h << D) + a1 * b0 + a0 * b1         # < 2^30 + 2^21
    tm = barrett(t, q, qinv_f)
    u = (tm << D) + a0 * b0                  # < 2^30 + 2^20
    return barrett(u, q, qinv_f)


def mod_dot(a, b, q, qinv_f, axis: int):
    """Exact (sum_k a_k * b_k) mod q, reduced ONCE instead of per term.

    Replaces a chain of mod_mul/mod_add (the KeySwitchSI::ApplyKeySwitch
    dot, FHE-SI.cpp:246-254): split both operands at 10 bits, accumulate
    the four partial-product sums UNREDUCED (each term < 2^20, so sums
    stay int32-exact for K <= 512 terms), then a 3-step Barrett-Horner.
    ~2.5x less VPU work than K mod_muls for K ~ 24.
    """
    K = a.shape[axis] if a.shape[axis] != 1 else b.shape[axis]
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
