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
    """a * c for nonnegative c < 2^30 (int32 array broadcastable to a[..., 0]).

    3 x 10-bit digit split keeps every product < 2^27; lo/hi accumulation
    then one normalize.  For signed c, negate via neg() at the caller.
    """
    c = jnp.asarray(c, dtype=jnp.int32)
    c2, c1, c0 = c >> 20, (c >> 10) & 1023, c & 1023
    p0 = a * c0[..., None]                 # < 2^26
    p1 = a * c1[..., None]                 # < 2^26, weight 2^10
    p2 = a * c2[..., None]                 # < 2^26, weight 2^20
    # weight-2^20 plane lands at limb k+1 with a 4-bit in-limb shift
    acc = ((p0 & LIMB_MASK)
           + ((p1 & ((1 << (LIMB_BITS - 10)) - 1)) << 10))
    hi = (p0 >> LIMB_BITS) + (p1 >> (LIMB_BITS - 10))
    hi = hi + ((p2 & ((1 << (LIMB_BITS - 4)) - 1)) << 4)
    hi2 = p2 >> (LIMB_BITS - 4)
    pad = [(0, 0)] * (hi.ndim - 1)
    acc = acc + jnp.pad(hi[..., :-1], pad + [(1, 0)])
    acc = acc + jnp.pad(hi2[..., :-2], pad + [(2, 0)])
    return normalize(acc)


def scale_coeffs_by_bigint(coeffs, const_limbs, const_limbs_sh10,
                           const_limbs_sh20=None):
    """coeffs[..., i] * C for nonnegative coeffs < 2^30 and a big
    constant C given as limbs (plus its 2^10- and 2^20-shifted copies;
    the sh20 plane may be omitted when coeffs < 2^20).

    Used for floor(q/p) * message in encrypt (FHE-SI.cpp:31).
    Returns limbs [..., n].
    """
    c2, c1, c0 = coeffs >> 20, (coeffs >> 10) & 1023, coeffs & 1023
    p0 = c0[..., None] * const_limbs       # < 2^10 * 2^16 = 2^26
    p1 = c1[..., None] * const_limbs_sh10
    acc = (p0 & LIMB_MASK) + (p1 & LIMB_MASK)
    hi = (p0 >> LIMB_BITS) + (p1 >> LIMB_BITS)
    if const_limbs_sh20 is not None:
        p2 = c2[..., None] * const_limbs_sh20   # c2 < 2^10
        acc = acc + (p2 & LIMB_MASK)
        hi = hi + (p2 >> LIMB_BITS)
    acc = acc + jnp.pad(hi[..., :-1], [(0, 0)] * (hi.ndim - 1) + [(1, 0)])
    return normalize(acc)


def mod_p_bounded(y, p_limbs, p_f, K_bound: int):
    """y mod p in [0, p) for two's complement limbs y with |y| <= K*p,
    K = K_bound < 2^12, and p < 2^30 given as limbs plus float32 p.

    The quotient is estimated in float32 (|y| <= 2^42 -> absolute f32
    error <= |y|*2^-24 <= K*p*2^-24, so |quo_err| <= 1/2 + K*2^-24 < 1
    for K < 2^12), subtracted in the limb domain (quo * p_limbs products
    < 2^12 * 2^16 = 2^28, int32-exact), and fixed with one add-p /
    subtract-p correction pair.  Used by the decrypt tail when p >= 2^20
    (the 4-bit chunk-dot path's table entries would overflow int32).
    Returns int32 values (p < 2^30 fits the lane).
    """
    assert K_bound < (1 << 12), "mod_p_bounded: quotient bound too large"
    n = y.shape[-1]
    if p_limbs.shape[-1] < n:       # p is positive: zero-extend
        p_limbs = jnp.pad(p_limbs, (0, n - p_limbs.shape[-1]))
    else:
        p_limbs = p_limbs[..., :n]
    # |y| in f32 via sign-magnitude (a direct two's complement f32 sum
    # would cancel catastrophically for negatives): each product is
    # exact, the adds lose <= |y|*2^-22 total, so the quotient error is
    # <= 1/2 + K*2^-22 < 1 independent of p.  |y| <= K*p < 2^42 lives in
    # the low 3-4 limbs of the magnitude.
    neg = is_negative(y)
    ya = normalize(jnp.where(neg[..., None] == 1, -y, y))
    m = min(n, 4)
    yf = jnp.zeros(y.shape[:-1], dtype=jnp.float32)
    for k in range(m):
        yf = yf + ya[..., k].astype(jnp.float32) * jnp.float32(2.0 ** (16 * k))
    quo = jnp.rint(yf / p_f).astype(jnp.int32)
    quo = jnp.where(neg == 1, -quo, quo)
    r = normalize(y - quo[..., None] * p_limbs)        # in (-p, 2p)
    r = normalize(r + is_negative(r)[..., None] * p_limbs)
    d = normalize(r - p_limbs)
    r = jnp.where(is_negative(d)[..., None] == 1, r, d)  # now in [0, p)
    # assemble into int32: values < p < 2^30 live in the low two limbs
    return r[..., 0] + (r[..., 1] << LIMB_BITS)


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
    digit values < 2^digit_bits <= 2^24).  digit_bits > 24 (decompSize
    >= 4) overflows an int32 digit value — use byte_decomp_planes.
    """
    assert digit_bits <= 24, "digit radix above 2^24: use byte_decomp_planes"
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


def byte_decomp_planes(a, log_q: int, digit_bits: int, ndigits: int, q_limbs):
    """ByteDecomp for digit radixes past int32 lanes (decompSize >= 4,
    reference FHEContext.h:91-99 accepts any decompSize): each radix-
    2^digit_bits digit is carried as ceil(digit_bits/16) little-endian
    16-bit planes.  digit j plane t = bits [digit_bits*j + 16*t, ...+16)
    of the positive representative — the same bit slicing as
    byte_decomp, regrouped.

    Returns int32 [..., ndigits, nplanes], every plane in [0, 2^16).
    """
    nplanes = (digit_bits + LIMB_BITS - 1) // LIMB_BITS
    pos = reduce_mod_q(a, log_q, True, q_limbs)
    n = pos.shape[-1]
    zero = jnp.zeros_like(pos[..., 0])

    def limb(k):
        return pos[..., k] if k < n else zero

    digits = []
    for j in range(ndigits):
        planes = []
        for t in range(nplanes):
            lo_bit = digit_bits * j + LIMB_BITS * t
            width = min(LIMB_BITS, digit_bits - LIMB_BITS * t)
            k0, off = divmod(lo_bit, LIMB_BITS)
            v = limb(k0) >> off
            if off:
                v = v | (limb(k0 + 1) << (LIMB_BITS - off))
            planes.append(v & ((1 << width) - 1))
        digits.append(jnp.stack(planes, axis=-1))
    return jnp.stack(digits, axis=-2)
