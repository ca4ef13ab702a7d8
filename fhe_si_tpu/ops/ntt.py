"""Exact modular NTT as MXU integer matmuls.

The reference converts between coefficient and evaluation domains with a
Bluestein chirp-z per prime (bluestein.cpp:92-144 inside
Cmodulus::FFT/iFFT, CModulus.cpp:89-132).  On TPU the idiomatic design
evaluates/interpolates with one dense phim x phim matrix per prime
(precomputed on the host, context.ntt_tables): the transform becomes a
batched integer matmul that runs on the MXU systolic array instead of a
scalar butterfly pipeline on the VPU.

Exactness: operands are split into 3 BALANCED 7-bit digits d_i in
[-64, 64] (top digit in [0, 64]), so v = sum_i d_i * 2^(7i) covers the
full 20-bit residue range with int8-safe digits.  Each of the 3x3 = 9
partial matmuls accumulates products |d*e| <= 2^12 over at most
phim <= 2^13 terms — |partial| < 2^25, int32-exact and MXU-native
(s8 x s8 -> s32).  The partials are grouped by total shift s = i+j
(5 groups, |sum| < 3*2^25 < 2^27) and recombined with a Barrett-Horner
pass whose intermediates stay below 2^28 (< q*2^23 for q >= 2^14, so the
f32 quotient estimate is off by < 1 and two conditional corrections fix
the residue).

A balanced 3-digit split does 9/16 the MXU work of the previous unsigned
4x5-bit scheme and reads 3/4 the table bytes from HBM.  On top of that,
the 3x3 digit product is computed Karatsuba-style with SIX matmuls
instead of nine: the host table carries the three digit planes plus the
three pairwise digit sums (e_i + e_j in [-128, 126], still int8), and

    c0 = p00                      with  p_ii = e_i  @ d_i
    c1 = p01 - p00 - p11                p_ij = (e_i+e_j) @ (d_i+d_j)
    c2 = p02 - p00 - p22 + p11
    c3 = p12 - p11 - p22
    c4 = p22

Device digit sums |d_i + d_j| <= 128 fit int8 (min is exactly -128);
cross products |p_ij| <= 2^14 * phim <= 2^27 and the combined shift
groups |c_s| < 2^28 keep the Barrett-Horner pass int32-exact
(|t| < 2^29 < q*2^23 for q >= 2^14, so the f32 quotient is off by < 1).

WIDE lane (primes < 2^23, context.PRIME_MAX_BITS_WIDE — required once
m >= 2^14, where the sub-2^20 prime window holds only 9 usable primes):
residues split into FOUR balanced 6-bit digits, d0..d2 in [-32, 31] and
the top digit d3 = v >> 18 in [0, 34] (v < 2^23.09 guarantees this, so
the prime cap is exactly 2^23).  The 4x4 digit product runs as TWO-LEVEL
Karatsuba — halves at t^2 (t = 2^6), Karatsuba inside each half-product
— NINE dots instead of sixteen, using nine matrix planes
    e0, e1, e2, e3, e0+e1, e2+e3, e0+e2, e1+e3, e0+e1+e2+e3
and the matching nine device digit combinations.  Every combination
fits int8: the four-way sum lies in [-96, 93+34] = [-96, 127].  Dot
bounds at the largest supported contraction (phim = 2^15): the worst
product |127 * 127| < 2^14, each dot < 2^29, and the worst shift-group
combination (9 dots with the per-dot bounds of _wide_groups) stays
below 2^30.2; the Horner step (r << 6) + c_s < 2^29 + 2^30.2 < 2^31.
Lane selection is static per table: 6 planes = narrow, 9 = wide.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .modular import barrett

CHUNK_BITS = 7
N_CHUNKS = 3  # covers 20-bit residues (7+7+6 bits + carries)
N_PLANES = 6  # d0, d1, d2, d0+d1, d1+d2, d0+d2
_HALF = 1 << (CHUNK_BITS - 1)          # 64
_MASK = (1 << CHUNK_BITS) - 1          # 127

CHUNK_BITS_W = 6
N_CHUNKS_W = 4   # covers 23-bit residues (6+6+6 bits + top in [0, 34])
N_PLANES_W = 9   # e0..e3, e0+e1, e2+e3, e0+e2, e1+e3, sum(e)
_HALF_W = 1 << (CHUNK_BITS_W - 1)      # 32
_MASK_W = (1 << CHUNK_BITS_W) - 1      # 63
WIDE_MAX_PHIM = 1 << 15  # contraction cap keeping wide groups int32-exact


def chunk_matrix(mat: np.ndarray, wide: bool = False) -> np.ndarray:
    """Host-side: [L, n, k] int matrix -> balanced int8 digit planes.

    narrow (entries in [0, 2^20)): [N_PLANES, L, n, k] — the 3 digits
    with mat == sum_i d_i << (7i), then the 3 pairwise sums for
    Karatsuba.  Digit ranges: d0, d1 in [-64, 63]; d2 in [0, 64]; every
    pairwise sum lies in [-128, 127] and is computed directly in int8.

    wide (entries in [0, 2^23)): [N_PLANES_W, L, n, k] — 4 balanced
    6-bit digits (top in [0, 34]) plus the five sums of the two-level
    Karatsuba (module header); every plane fits int8.

    Processed one prime-slab at a time to keep temporaries at
    O(n*k) int32 instead of O(L*n*k) (setup-time hot path at phim ~ 2000).
    """
    if wide:
        return _chunk_matrix_wide(mat)
    L = mat.shape[0]
    out = np.empty((N_PLANES,) + mat.shape, dtype=np.int8)
    for l in range(L):
        v = mat[l].astype(np.int32)
        for i in range(N_CHUNKS - 1):
            d = ((v + _HALF) & _MASK) - _HALF
            out[i, l] = d
            np.subtract(v, d, out=v)
            v >>= CHUNK_BITS
        assert 0 <= v.min() and v.max() <= _HALF, "matrix entry exceeds 20 bits"
        out[2, l] = v
    np.add(out[0], out[1], out=out[3])
    np.add(out[1], out[2], out=out[4])
    np.add(out[0], out[2], out=out[5])
    return out


def _chunk_matrix_wide(mat: np.ndarray) -> np.ndarray:
    L = mat.shape[0]
    out = np.empty((N_PLANES_W,) + mat.shape, dtype=np.int8)
    for l in range(L):
        v = mat[l].astype(np.int32)
        for i in range(N_CHUNKS_W - 1):
            d = ((v + _HALF_W) & _MASK_W) - _HALF_W
            out[i, l] = d
            np.subtract(v, d, out=v)
            v >>= CHUNK_BITS_W
        assert 0 <= v.min() and v.max() <= 34, "matrix entry exceeds 2^23"
        out[3, l] = v
    np.add(out[0], out[1], out=out[4])
    np.add(out[2], out[3], out=out[5])
    np.add(out[0], out[2], out=out[6])
    np.add(out[1], out[3], out=out[7])
    np.add(out[4], out[5], out=out[8])
    return out


def chunk_x(x):
    """Device-side balanced digit split of residues x in [0, 2^21).

    Returns N_CHUNKS int8 arrays; each |d_i| <= 64.
    """
    out = []
    v = x
    for _ in range(N_CHUNKS - 1):
        d = ((v + _HALF) & _MASK) - _HALF
        out.append(d.astype(jnp.int8))
        v = (v - d) >> CHUNK_BITS
    out.append(v.astype(jnp.int8))
    return out


def chunk_x_wide(x):
    """Device-side balanced 6-bit digit split of residues x in [0, 2^23):
    N_CHUNKS_W int8 arrays, d0..d2 in [-32, 31], d3 = top in [0, 32]."""
    out = []
    v = x
    for _ in range(N_CHUNKS_W - 1):
        d = ((v + _HALF_W) & _MASK_W) - _HALF_W
        out.append(d.astype(jnp.int8))
        v = (v - d) >> CHUNK_BITS_W
    out.append(v.astype(jnp.int8))
    return out


def prescale_planes(planes, scale, q, qinv_f):
    """Device-side re-chunking of a table with a per-prime scalar folded in.

    Rebuilds the integer entries from the digit planes, multiplies by
    `scale` mod q, and re-splits (same layout as chunk_matrix; the plane
    count selects the lane).  Used at DeviceContext init to fold the CRT
    premultiplier binv into the iNTT tables ('inv_chunks_crt').

    planes: int8 [N_PLANES(_W), L, n, k]; scale/q/qinv_f broadcastable
    to [L, n, k].  Returns int8 planes of the same layout.
    """
    from .modular import mod_mul
    wide = planes.shape[0] == N_PLANES_W
    if wide:
        v = (planes[0].astype(jnp.int32)
             + (planes[1].astype(jnp.int32) << CHUNK_BITS_W)
             + (planes[2].astype(jnp.int32) << (2 * CHUNK_BITS_W))
             + (planes[3].astype(jnp.int32) << (3 * CHUNK_BITS_W)))
        v = mod_mul(v, scale, q, qinv_f, wide=True)
        d = chunk_x_wide(v)
        s01 = (d[0].astype(jnp.int32) + d[1]).astype(jnp.int8)
        s23 = (d[2].astype(jnp.int32) + d[3]).astype(jnp.int8)
        s02 = (d[0].astype(jnp.int32) + d[2]).astype(jnp.int8)
        s13 = (d[1].astype(jnp.int32) + d[3]).astype(jnp.int8)
        s4 = (s01.astype(jnp.int32) + s23).astype(jnp.int8)
        return jnp.stack([d[0], d[1], d[2], d[3], s01, s23, s02, s13, s4])
    v = (planes[0].astype(jnp.int32)
         + (planes[1].astype(jnp.int32) << CHUNK_BITS)
         + (planes[2].astype(jnp.int32) << (2 * CHUNK_BITS)))
    v = mod_mul(v, scale, q, qinv_f)
    d = chunk_x(v)
    d01 = (d[0].astype(jnp.int32) + d[1]).astype(jnp.int8)
    d12 = (d[1].astype(jnp.int32) + d[2]).astype(jnp.int8)
    d02 = (d[0].astype(jnp.int32) + d[2]).astype(jnp.int8)
    return jnp.stack([d[0], d[1], d[2], d01, d12, d02])


def karatsuba_groups(mat_chunks, x):
    """The MXU dots + Karatsuba recombine, WITHOUT the modular Horner.

    Dispatches on the table's plane count: 6 planes = narrow lane
    (3x7-bit digits, six dots, five shift groups with |c_s| < 2^28);
    9 planes = wide lane (4x6-bit digits, nine dots, seven groups with
    |c_s| < 2^30.2 at phim <= 2^15 — module header).  The groups are
    LINEAR in x, so under coefficient-axis sharding each shard computes
    them on its n_in slice and a psum over the shards yields the full
    groups (parallel/shard.py coeff_sharded_ntt) — the bounds hold for
    the full contraction length, so the psum cannot overflow.
    """
    if mat_chunks.shape[0] == N_PLANES_W:
        return _wide_groups(mat_chunks, x)
    d = chunk_x(x)
    # device-side pairwise sums; |d_i + d_j| <= 128 fits int8 exactly
    d01 = (d[0].astype(jnp.int32) + d[1]).astype(jnp.int8)
    d12 = (d[1].astype(jnp.int32) + d[2]).astype(jnp.int8)
    d02 = (d[0].astype(jnp.int32) + d[2]).astype(jnp.int8)

    def mm(plane, vec):
        return jnp.einsum('lok,...lk->...lo', mat_chunks[plane], vec,
                          preferred_element_type=jnp.int32)

    p00, p11, p22 = mm(0, d[0]), mm(1, d[1]), mm(2, d[2])
    p01, p12, p02 = mm(3, d01), mm(4, d12), mm(5, d02)
    return (p00,
            p01 - p00 - p11,
            p02 - p00 - p22 + p11,
            p12 - p11 - p22,
            p22)


def _wide_groups(mat_chunks, x):
    """Wide-lane two-level Karatsuba: 9 dots -> 7 shift groups (base 2^6).

    Write A = AL + AH*t^2 with AL = a0 + a1*t, AH = a2 + a3*t (t = 2^6),
    likewise E; then A*E = PL + (PM - PL - PH)*t^2 + PH*t^4 with each
    half-product expanded by inner Karatsuba (3 dots each).  Per-dot
    bounds at phim <= 2^15 (with digit maxima 32/32/32/32 and combo
    maxima 64/64/64/64/125): the largest dot |mM2| <= 125^2 * 2^15
    < 2^29, and the worst group (c3, nine dots) < 2^30.2 — int32-exact.
    """
    assert x.shape[-1] <= WIDE_MAX_PHIM, \
        "wide-lane contraction exceeds the int32 group bound"
    d = chunk_x_wide(x)
    s01 = (d[0].astype(jnp.int32) + d[1]).astype(jnp.int8)
    s23 = (d[2].astype(jnp.int32) + d[3]).astype(jnp.int8)
    s02 = (d[0].astype(jnp.int32) + d[2]).astype(jnp.int8)
    s13 = (d[1].astype(jnp.int32) + d[3]).astype(jnp.int8)
    s4 = (s01.astype(jnp.int32) + s23).astype(jnp.int8)   # in [-96, 127]

    def mm(plane, vec):
        return jnp.einsum('lok,...lk->...lo', mat_chunks[plane], vec,
                          preferred_element_type=jnp.int32)

    mL0, mL1, mL2 = mm(0, d[0]), mm(1, d[1]), mm(4, s01)
    mH0, mH1, mH2 = mm(2, d[2]), mm(3, d[3]), mm(5, s23)
    mM0, mM1, mM2 = mm(6, s02), mm(7, s13), mm(8, s4)
    pl = (mL0, mL2 - mL0 - mL1, mL1)
    ph = (mH0, mH2 - mH0 - mH1, mH1)
    mid = (mM0 - pl[0] - ph[0],
           (mM2 - mM0 - mM1) - pl[1] - ph[1],
           mM1 - pl[2] - ph[2])
    return (pl[0], pl[1], pl[2] + mid[0], mid[1], ph[0] + mid[2],
            ph[1], ph[2])


def horner_combine(groups, q, qinv_f, bits: int | None = None):
    """Barrett-Horner combine of the shift groups into residues mod q.

    narrow (5 groups, base 2^7): |(r << 7) + c_s| < 2^27 + 2^28 < 2^29.
    wide (7 groups, base 2^6):   |(r << 6) + c_s| < 2^29 + 2^30.2 < 2^31.
    Both keep the f32 quotient estimate off by < 1.  The base is inferred
    from the group count for the two standard lanes; cross-radix callers
    (digit_cross_groups) pass `bits` explicitly."""
    if bits is None:
        bits = CHUNK_BITS if len(groups) == 2 * N_CHUNKS - 1 else CHUNK_BITS_W
    r = barrett(groups[-1], q, qinv_f)
    for c in groups[-2::-1]:
        r = barrett((r << bits) + c, q, qinv_f)
    return r


def chunk_x_n(x, nchunks: int, bits: int):
    """Balanced base-2^bits split of nonnegative int32 x into nchunks int8
    planes: x = sum_i d_i << (bits*i), d_i in [-2^(bits-1), 2^(bits-1))
    for i < nchunks-1, top plane in [0, x_max/2^(bits*(nchunks-1)) + 1].
    The caller guarantees the top plane fits int8."""
    half = 1 << (bits - 1)
    mask = (1 << bits) - 1
    out = []
    v = x
    for _ in range(nchunks - 1):
        d = ((v + half) & mask) - half
        out.append(d.astype(jnp.int8))
        v = (v - d) >> bits
    out.append(v.astype(jnp.int8))
    return out


def digit_cross_groups(mat_chunks, digits, digit_bits: int):
    """MXU dots of a table's digit planes against PRIME-INDEPENDENT
    activation values — the keyswitch digit stage's first transform
    contact (device._digit_evals fast path).

    digits: int32 [..., n_in] in [0, 2^digit_bits), digit_bits <= 27 —
    the SAME tensor for every prime, so no [rows, L, phim] residue
    materialization happens before the matmul; the per-prime reduction
    rides the Barrett-Horner combine of the OUTPUT (which is per-prime
    anyway).  The activation is chunked on device into base-2^CHUNK_BITS
    (narrow table) / 2^CHUNK_BITS_W (wide) balanced int8 planes matching
    the table's radix, and each (table plane i, activation plane j) pair
    is one s8xs8 einsum whose (l, o) output dims BOTH come from the
    table — one [M, K] x [K, L*o] matmul per pair instead of L batched
    small ones.

    Bounds (contraction length K = n_in <= 2^15):
      narrow: |tab| <= 64, |act| <= 64 (top act plane for digit_bits=24
        is bits 21..23 + balance carry <= 9) -> |dot| <= 2^12 * K; the
        largest group sums min(3, n_act) = 3 dots < 3 * 2^12 * 2^15
        < 2^29; Horner (r << 7) + c < 2^27 + 2^29 < 2^31.
      wide:   |tab| <= 34, |act| <= 67 (top plane of a 24-bit value in
        base 2^6 <= 64 + 3) -> |dot| <= 2278 * K; largest group 4 dots
        < 2^28.2; Horner (r << 6) + c < 2^29 + 2^28.2 < 2^31.

    Returns the shift-group list (pass to horner_combine with the
    matching base).
    """
    wide = mat_chunks.shape[0] == N_PLANES_W
    bits = CHUNK_BITS_W if wide else CHUNK_BITS
    n_tab = N_CHUNKS_W if wide else N_CHUNKS
    n_act = (digit_bits + bits - 1) // bits
    assert digit_bits <= 27, "digit value exceeds the int8 top-plane bound"
    assert digits.shape[-1] <= WIDE_MAX_PHIM, \
        "digit contraction exceeds the int32 group bound"
    planes = chunk_x_n(digits, n_act, bits)

    def mm(i, j):
        return jnp.einsum('lok,...k->...lo', mat_chunks[i], planes[j],
                          preferred_element_type=jnp.int32)

    groups = [None] * (n_tab + n_act - 1)
    for i in range(n_tab):
        for j in range(n_act):
            d = mm(i, j)
            s = i + j
            groups[s] = d if groups[s] is None else groups[s] + d
    return groups, bits


def modmatmul(mat_chunks, x, q, qinv_f):
    """Exact (mat @ x) mod q, batched over the prime axis.

    mat_chunks: int8 [N_PLANES, L, n_out, n_in] (narrow host digit+sum
                planes) or [N_PLANES_W, ...] (wide lane — the plane
                count selects the lane statically)
    x:          int32 [..., L, n_in] residues in [0, q)
    q, qinv_f:  [L, 1] broadcastables
    returns     int32 [..., L, n_out]

    Leading dims are flattened to ONE batch axis before the einsums and
    restored after: XLA lowers the batched dots and surrounding
    transposes dramatically worse at rank >= 4 (measured 2.9x at the
    ct4096 digit volume, tools/profile_digit_layout.py).
    """
    lead = x.shape[:-2]
    if len(lead) > 1:
        flat = x.reshape((-1,) + x.shape[-2:])
        r = horner_combine(karatsuba_groups(mat_chunks, flat), q, qinv_f)
        return r.reshape(lead + r.shape[1:])
    return horner_combine(karatsuba_groups(mat_chunks, x), q, qinv_f)
