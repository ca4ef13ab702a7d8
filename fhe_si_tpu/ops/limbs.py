"""Fixed-width big-int arithmetic in 16-bit limbs on int32 lanes.

Represents values mod 2^(16n) as n little-endian limbs in [0, 2^16),
two's complement for signed quantities.  This is the device analog of
the reference's NTL ZZ coefficient domain: Reduce's mask/sign-fix
(Util.cpp:3-26) becomes limb masking, ScaleDown's floor((2x+q)/2q)
(Ciphertext.cpp:194-218) becomes an arithmetic shift, and ByteDecomp's
radix-2^24 digits (Ciphertext.cpp:82-121) become static bit slices.

All shapes carry limbs on the LAST axis; every loop below is over the
static limb count and unrolls at trace time.
"""
from __future__ import annotations

import jax.numpy as jnp

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def normalize(acc):
    """Carry-propagate int32 partial limbs into canonical [0, 2^16) limbs.

    Works for signed partials: the arithmetic >> propagates borrows, and
    the final truncation is exactly arithmetic mod 2^(16n).
    """
    n = acc.shape[-1]
    out = []
    carry = jnp.zeros_like(acc[..., 0])
    for k in range(n):
        v = acc[..., k] + carry
        out.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS  # arithmetic shift: signed carries work
    return jnp.stack(out, axis=-1)


def add(a, b):
    return normalize(a + b)


def sub(a, b):
    return normalize(a - b)


def neg(a):
    return normalize(-a)


def is_negative(a):
    """Sign of the two's complement value (top bit of top limb)."""
    return (a[..., -1] >> (LIMB_BITS - 1)) & 1


def reduce_mod_q(a, log_q: int, positive: bool, q_limbs, out_width: int | None = None):
    """Reduce semantics (Util.cpp:3-26) on limbs.

    positive: a mod 2^logQ in [0, q)  — pure masking.
    signed:   then map [q/2, q) down by q (two's complement subtract).
    q_limbs: limbs of 2^logQ (context constant), width >= needed.
    out_width: emit this many limbs (default: input width).  Any width
    with 16*out_width > logQ is exact — the masked value has < logQ bits
    and the signed representative [-q/2, q/2) fits two's complement.
    """
    n = a.shape[-1]
    nw = out_width if out_width is not None else n
    assert LIMB_BITS * nw > log_q, "out_width too narrow for logQ"
    assert LIMB_BITS * n >= log_q, "input too narrow to mask logQ bits"
    hi_limb, hi_bits = divmod(log_q, LIMB_BITS)
    masked = []
    for k in range(nw):
        if k < hi_limb and k < n:
            masked.append(a[..., k])
        elif k == hi_limb and hi_bits and k < n:
            masked.append(a[..., k] & ((1 << hi_bits) - 1))
        else:
            masked.append(jnp.zeros_like(a[..., 0]))
    m = jnp.stack(masked, axis=-1)
    if positive:
        return m
    sb_limb, sb_off = divmod(log_q - 1, LIMB_BITS)
    sign = (m[..., sb_limb] >> sb_off) & 1
    return normalize(m - sign[..., None] * q_limbs[..., :nw])


def match_width(a, n: int):
    """Sign-extend (or truncate) two's complement limbs to width n.

    Truncation is value-preserving only when the value fits n limbs
    signed; extension always is.
    """
    cur = a.shape[-1]
    if cur == n:
        return a
    if cur > n:
        return a[..., :n]
    fill = (0 - is_negative(a)) & LIMB_MASK        # 0x0000 / 0xffff
    ext = jnp.broadcast_to(fill[..., None], a.shape[:-1] + (n - cur,))
    return jnp.concatenate([a, ext], axis=-1)


def arith_shift_right(a, shift: int):
    """floor(x / 2^shift) for the signed two's complement value x."""
    n = a.shape[-1]
    ls, bs = divmod(shift, LIMB_BITS)
    sign_fill = (0 - is_negative(a)) & LIMB_MASK  # 0x0000 or 0xffff

    def limb(k):
        return a[..., k] if k < n else sign_fill

    out = []
    for k in range(n):
        lo = limb(k + ls)
        if bs == 0:
            out.append(lo)
        else:
            hi = limb(k + ls + 1)
            out.append(((lo >> bs) | (hi << (LIMB_BITS - bs))) & LIMB_MASK)
    return jnp.stack(out, axis=-1)


def shift_left(a, shift: int):
    """x * 2^shift mod 2^(16n)."""
    n = a.shape[-1]
    ls, bs = divmod(shift, LIMB_BITS)
    zero = jnp.zeros_like(a[..., 0])

    def limb(k):
        return a[..., k] if 0 <= k < n else zero

    out = []
    for k in range(n):
        lo = limb(k - ls)
        if bs == 0:
            out.append(lo)
        else:
            hi = limb(k - ls - 1)
            out.append(((lo << bs) | (hi >> (LIMB_BITS - bs))) & LIMB_MASK)
    return jnp.stack(out, axis=-1)


def mul_small(a, c):
    """a * c for nonnegative c < 2^20 (int32 array broadcastable to a[..., 0]).

    10-bit split keeps products < 2^26; lo/hi accumulation then one
    normalize.  For signed c, negate via neg() at the caller.
    """
    c = jnp.asarray(c, dtype=jnp.int32)
    ch, cl = c >> 10, c & 1023
    p0 = a * cl[..., None]                 # < 2^26
    p1 = a * ch[..., None]                 # < 2^26, weight 2^10
    acc = (p0 & LIMB_MASK) + ((p1 & ((1 << (LIMB_BITS - 10)) - 1)) << 10)
    hi = (p0 >> LIMB_BITS) + (p1 >> (LIMB_BITS - 10))
    acc = acc + jnp.pad(hi[..., :-1], [(0, 0)] * (hi.ndim - 1) + [(1, 0)])
    return normalize(acc)


def scale_coeffs_by_bigint(coeffs, const_limbs, const_limbs_sh10):
    """coeffs[..., i] * C for small nonnegative coeffs < 2^20 and a big
    constant C given as limbs (plus its 2^10-shifted copy).

    Used for floor(q/p) * message in encrypt (FHE-SI.cpp:31).
    Returns limbs [..., n].
    """
    ch, cl = coeffs >> 10, coeffs & 1023
    p0 = cl[..., None] * const_limbs       # < 2^10 * 2^16 = 2^26
    p1 = ch[..., None] * const_limbs_sh10
    acc = (p0 & LIMB_MASK) + (p1 & LIMB_MASK)
    hi = (p0 >> LIMB_BITS) + (p1 >> LIMB_BITS)
    acc = acc + jnp.pad(hi[..., :-1], [(0, 0)] * (hi.ndim - 1) + [(1, 0)])
    return normalize(acc)


def from_small_signed(coeffs, n: int):
    """Small signed int32 values [..., ] -> two's complement limbs [..., n].

    Arithmetic >> sign-extends, so negative values produce 0xffff upper
    limbs — exactly value mod 2^(16n).  Shifts are clamped to 31 (int32).
    """
    return jnp.stack(
        [(coeffs >> min(LIMB_BITS * k, 31)) & LIMB_MASK for k in range(n)],
        axis=-1)


def byte_decomp(a, log_q: int, digit_bits: int, ndigits: int, q_limbs):
    """ByteDecomp digits (Ciphertext.cpp:82-121): positive rep mod q,
    then digit j = bits [digit_bits*j, digit_bits*(j+1)).

    Returns int32 [..., ndigits] with limbs axis consumed (per-coefficient
    digit values < 2^digit_bits <= 2^24).
    """
    pos = reduce_mod_q(a, log_q, True, q_limbs)
    n = pos.shape[-1]
    zero = jnp.zeros_like(pos[..., 0])

    def limb(k):
        return pos[..., k] if k < n else zero

    digits = []
    for j in range(ndigits):
        lo_bit = digit_bits * j
        k0, off = divmod(lo_bit, LIMB_BITS)
        v = limb(k0) >> off
        got = LIMB_BITS - off
        idx = 1
        while got < digit_bits:
            v = v | (limb(k0 + idx) << got)
            got += LIMB_BITS
            idx += 1
        digits.append(v & ((1 << digit_bits) - 1))
    return jnp.stack(digits, axis=-1)
