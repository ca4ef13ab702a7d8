"""Conversions between limb coefficients and per-prime residues.

from_poly: the device analog of Cmodulus::FFT's input reduction
(CModulus.cpp:89-107 reduces the big coefficients mod p_i before the
transform): 4-bit chunk dot products against precomputed 2^(4c) mod q_l
tables, with a two's complement sign correction.

to_poly: the device analog of DoubleCRT::toPoly's incremental big-int CRT
(DoubleCRT.cpp:349-398, intVecCRT NumbTh.cpp:306-338).  We use Garner
mixed-radix reconstruction — all int32 modular ops — followed by a limb
accumulation against precomputed partial-product tables and the same
centered reduction (subtract P when the value exceeds floor(P/2)).
The result is the exact centered representative in (-P/2, P/2), which is
the unique value the reference's intVecCRT produces, so downstream
bit-exactness is preserved.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import limbs as lb
from .modular import barrett, mod_mul, mod_sub

CHUNK = 4
CMASK = (1 << CHUNK) - 1

# A/B switch for the MXU digit-matmul CRT accumulation.  Both paths are
# bit-identical (tests/test_ops.py::test_crt_partials_mxu_parity); the
# ELEMENTWISE path is the measured default: at the big config the MXU
# variant's contraction is K = L = 21 padded to 128 on both matmul axes,
# and the padding waste loses to the VPU (6.85 vs 4.66 ms/step,
# tools/bench_crt_paths.py — BASELINE.md).  Set FHE_SI_TPU_MXU_CRT=1
# for chains long enough to fill the MXU's contraction dim (L >~ 64).
import os as _os
USE_MXU_PARTIALS = _os.environ.get("FHE_SI_TPU_MXU_CRT", "0") == "1"


def limbs_to_residues(poly, chunk_tbl, wrap, q, qinv_f, wide: bool = False):
    """[..., phim, n] limbs -> [..., L, phim] residues.

    chunk_tbl: int32 [>=4n, L] with tbl[c, l] = 2^(4c) mod q_l (a wider
               table is sliced to the input width)
    wrap:      int32 [L, 1]   2^(16n) mod q_l for THIS n (sign correction)

    narrow: one chunk dot; partial sums stay int32-exact:
    15 * 2^20 * 4n < 2^31 for n <= 34.

    wide (q < 2^23): the table entries split at 12 bits into two planes
    (done here at trace time — the splits constant-fold against the
    table parameter), two dots (lo <= 15 * 2^12 * 4n, hi <= 15 * 2^11
    * 4n — int32-exact for n <= 2^13), then a 2-hop Barrett-Horner
    rejoins them: (r << 6) + lo - sign*wrap < 2^29 + 2^24 + 2^23.
    """
    n = poly.shape[-1]
    assert chunk_tbl.shape[0] >= 4 * n, "chunk table narrower than input"
    chunks = jnp.stack([(poly >> (CHUNK * i)) & CMASK for i in range(4)], axis=-1)
    chunks = chunks.reshape(*poly.shape[:-1], 4 * n)
    sign = lb.is_negative(poly)[..., None, :]  # [..., 1, phim]
    if wide:
        assert 15 * (1 << 12) * 4 * n < (1 << 31), "limb width too large"
        tbl = chunk_tbl[:4 * n]
        raw_lo = jnp.einsum('...xc,cl->...lx', chunks, tbl & 4095,
                            preferred_element_type=jnp.int32)
        raw_hi = jnp.einsum('...xc,cl->...lx', chunks, tbl >> 12,
                            preferred_element_type=jnp.int32)
        r = barrett(raw_hi, q, qinv_f)
        r = barrett(r << 6, q, qinv_f)
        return barrett((r << 6) + raw_lo - sign * wrap, q, qinv_f)
    assert 15 * (1 << 20) * 4 * n < (1 << 31), "limb width too large for one pass"
    raw = jnp.einsum('...xc,cl->...lx', chunks, chunk_tbl[:4 * n],
                     preferred_element_type=jnp.int32)
    raw = raw - sign * wrap
    return barrett(raw, q, qinv_f)


def limbs_to_mod_small(poly, p_chunk_tbl, p_wrap, p, pinv_f):
    """[..., phim, n] limbs -> [..., phim] values mod small p (decrypt tail).

    p_wrap must be 2^(16n) mod p for THIS input width n."""
    n = poly.shape[-1]
    assert p_chunk_tbl.shape[0] >= 4 * n, "chunk table narrower than input"
    chunks = jnp.stack([(poly >> (CHUNK * i)) & CMASK for i in range(4)], axis=-1)
    chunks = chunks.reshape(*poly.shape[:-1], 4 * n)
    raw = jnp.einsum('...xc,c->...x', chunks, p_chunk_tbl[:4 * n],
                     preferred_element_type=jnp.int32)
    raw = raw - lb.is_negative(poly) * p_wrap
    return barrett(raw, p, pinv_f)


def crt_partials(res, t, q, qinv_f, prescaled: bool = False,
                 wide: bool = False):
    """Per-prime-local half of the single-pass CRT reconstruction.

    prescaled=True: the caller's iNTT table already carried the binv
    factor (value rows scaled by b_l^{-1} mod q_l, redundant row by 1 —
    device.DeviceContext 'inv_chunks_crt'), so `res` IS c and the
    per-element mod_mul is skipped.  The redundant row then holds the raw
    E mod m_r, which is exactly what the one-hot er dot expects.

    res: [..., Lrows, phim] residue rows INCLUDING the redundant-modulus
    row.  The tables (context.fast_crt_tables) are padded to the full
    prime axis with zeros at the redundant index plus a one-hot
    ``er_mask``, so this function is uniform in the prime axis: it is the
    shardable half.  Under shard_map over a 'limb' mesh axis, call it on
    the local rows and ``psum`` all three outputs before crt_finish; the
    single-device path just feeds them straight through (the sums here
    ARE the full reductions then).

    Returns (acc, sig_raw, er):
      acc     [..., phim, n]  limb accumulation of sum_l c_l * B_l;
              entries < Lrows * (2^16 + 2^11) < 2^23 for Lrows <= 64 —
              int32-safe to psum.
      sig_raw [..., phim]     unreduced sum of c_l*B_l mod m_r terms,
              < Lrows * 2^20 < 2^26: barrett'd in crt_finish.
      er      [..., phim]     the redundant row E mod m_r (one-hot mask
              dot, so the owning shard contributes it and psum delivers
              it everywhere).
    """
    mr = t['mr']            # int32 scalar
    mrinv = t['mrinv_f']    # float32 scalar

    if prescaled:
        c = res  # acc/sig terms on the redundant row are zeroed by B/Bmodr
    else:
        c = mod_mul(res, t['binv'][:, None], q, qinv_f, wide)  # 0 on redundant

    # limb accumulation  S = sum_l c_l * B_l   (10-bit digit split;
    # wide lane: ch < 2^13 keeps p1 = ch * Bh < 2^29, still int32-exact)
    cl = (c & 1023)[..., None]
    ch = (c >> 10)[..., None]
    p0 = cl * t['B'][:, None, :]                 # < 2^26
    p1 = ch * t['Bh'][:, None, :]
    acc = (jnp.sum(p0 & lb.LIMB_MASK, axis=-3)
           + jnp.sum(p1 & lb.LIMB_MASK, axis=-3))
    hi = jnp.sum(p0 >> lb.LIMB_BITS, axis=-3) + jnp.sum(p1 >> lb.LIMB_BITS,
                                                        axis=-3)
    acc = acc + jnp.pad(hi[..., :-1], [(0, 0)] * (hi.ndim - 1) + [(1, 0)])

    term = mod_mul(c, t['Bmodr'][:, None], mr, mrinv, wide)
    sig_raw = jnp.sum(term, axis=-2)             # < Lrows * 2^23 < 2^29
    er = jnp.sum(t['er_mask'][:, None] * res, axis=-2)
    return acc, sig_raw, er


def crt_partials_mxu(res, t, q, qinv_f):
    """crt_partials for PRESCALED residues with the limb accumulation as
    MXU int8 digit matmuls instead of elementwise limb expansion.

    The dominant cost of the single-pass reconstruction is
    S = sum_l c_l * B_l in the limb domain: the elementwise path
    materializes [.., L, phim, n] int32 planes and does ~8 VPU ops per
    (l, x, k).  Here both factors ride the same balanced 7-bit digit
    machinery as the NTT (ops/ntt.py): c (< 2^20) splits into 3 digits
    on device, B's 16-bit limbs split into 3 digit planes on the host
    (fast_crt_tables['B_chunks'], with pairwise sums for Karatsuba), and
    the contraction over l becomes SIX s8xs8->s32 einsums — O(L) VPU
    work collapses to one MXU pass plus a 5-term shift-group recombine.

    Exactness: |digit| <= 64, |pairwise sum| <= 128, so every product is
    <= 2^14 and group sums over l <= 3 * 2^14 * L < 2^22 for L <= 64 —
    int32-exact, and still exact after a psum over limb shards (the
    bound covers the full chain).  Recombine intermediates < 2^31.

    Returns the same (acc, sig_raw, er) triple as crt_partials
    (acc in partial-limb form for crt_finish; entries < 2^26).
    """
    from . import ntt

    c = res  # prescaled: value rows carry binv, redundant row raw
    d = ntt.chunk_x(c)                       # 3 x int8 [.., L, phim]
    d01 = (d[0].astype(jnp.int32) + d[1]).astype(jnp.int8)
    d12 = (d[1].astype(jnp.int32) + d[2]).astype(jnp.int8)
    d02 = (d[0].astype(jnp.int32) + d[2]).astype(jnp.int8)
    planes = (d[0], d[1], d[2], d01, d12, d02)
    Bc = t['B_chunks']                       # int8 [6, L, n]

    def mm(i, j):
        return jnp.einsum('...lx,ln->...xn', planes[i], Bc[j],
                          preferred_element_type=jnp.int32)

    p00, p11, p22 = mm(0, 0), mm(1, 1), mm(2, 2)
    p01, p12, p02 = mm(3, 3), mm(4, 4), mm(5, 5)
    groups = (p00,
              p01 - p00 - p11,
              p02 - p00 - p22 + p11,
              p12 - p11 - p22,
              p22)

    n = Bc.shape[-1]
    pad = [(0, 0)] * (p00.ndim - 1)
    acc = jnp.zeros_like(p00)
    for s, G in enumerate(groups):
        off, sh = divmod(7 * s, lb.LIMB_BITS)
        Ga = G & lb.LIMB_MASK                # [0, 2^16)
        Gb = G >> lb.LIMB_BITS               # signed, |Gb| < 2^6
        t0 = Ga << sh                        # < 2^31
        t1 = (t0 >> lb.LIMB_BITS) + (Gb << sh)   # |t1| < 2^22
        lo = t0 & lb.LIMB_MASK
        if off:
            lo = jnp.pad(lo[..., :-off], pad + [(off, 0)])
            t1 = jnp.pad(t1[..., :-(off + 1)], pad + [(off + 1, 0)])
        else:
            t1 = jnp.pad(t1[..., :-1], pad + [(1, 0)])
        acc = acc + lo + t1

    mr = t['mr']
    term = mod_mul(c, t['Bmodr'][:, None], mr, t['mrinv_f'])
    sig_raw = jnp.sum(term, axis=-2)
    er = jnp.sum(t['er_mask'][:, None] * res, axis=-2)
    return acc, sig_raw, er


def crt_finish(acc, sig_raw, er, t, n_limbs: int, wide: bool = False):
    """Replicated tail of the single-pass CRT reconstruction: compute the
    exact wrap count w = ((S mod m_r) - E_r) * P^{-1} mod m_r (exact since
    0 <= w <= L < m_r), subtract w*P in the limb domain, normalize."""
    mr = t['mr']
    mrinv = t['mrinv_f']
    sig = barrett(sig_raw, mr, mrinv)
    diff = mod_sub(sig, er, mr)
    w = mod_mul(diff, t['Pinv_r'], mr, mrinv, wide)

    wl = (w & 1023)[..., None]
    wh = (w >> 10)[..., None]
    sub = (wl * t['P_limbs'] + wh * t['P_limbs_sh10'])
    acc = acc - (sub & lb.LIMB_MASK)
    shi = sub >> lb.LIMB_BITS
    acc = acc - jnp.pad(shi[..., :-1], [(0, 0)] * (shi.ndim - 1) + [(1, 0)])
    out = lb.normalize(acc)
    assert out.shape[-1] == n_limbs
    return out


def residues_to_limbs_fast(res, t, q, qinv_f, n_limbs: int | None = None,
                           prescaled: bool = False, wide: bool = False):
    """Single-pass CRT reconstruction via the redundant modulus
    (context.fast_crt_tables): no serial Garner scan — O(L) parallel
    work plus one small exact correction.  Returns the centered signed
    value E as two's complement limbs at the BASIS width
    (t['B'].shape[-1] — per-basis 'n_rec', context._fast_crt_for).

    Prescaled inputs take the MXU digit-matmul accumulation
    (crt_partials_mxu) when the tables carry digit planes; the paths
    are bit-identical (tests/test_ops.py::test_crt_partials_mxu_parity).
    The MXU variant rides the narrow 3x7-bit digit split, so wide-lane
    contexts always use the elementwise path.

    res: [..., L, phim] with the LAST row tracking E mod m_r.
    """
    if prescaled and 'B_chunks' in t and USE_MXU_PARTIALS and not wide:
        acc, sig_raw, er = crt_partials_mxu(res, t, q, qinv_f)
    else:
        acc, sig_raw, er = crt_partials(res, t, q, qinv_f, prescaled, wide)
    return crt_finish(acc, sig_raw, er, t,
                      n_limbs if n_limbs is not None else t['B'].shape[-1],
                      wide)


def residues_to_limbs(res, tables, q, qinv_f, n_limbs: int,
                      wide: bool = False):
    """[..., L, phim] residues -> [..., phim, n] limbs of the centered
    representative in (-P/2, P/2).

    tables: dict from FheContext.garner_tables moved to device:
      invq [L, L], W / Wh [L, n] (prefix products, plain and 2^10-shifted),
      P_limbs [n], halfP_digits [L].
    """
    L = res.shape[-2]
    invq = tables['invq']          # int32 [L, L]
    W, Wh = tables['W'], tables['Wh']
    P_limbs = tables['P_limbs']
    half_digits = tables['halfP_digits']

    # Garner: digits[j] in [0, q_j); after step j, rows i>j hold the partial
    # mixed-radix remainders.
    t = res
    digits = []
    for j in range(L):
        a_j = t[..., j, :]
        digits.append(a_j)
        if j + 1 < L:
            rest = t[..., j + 1:, :]
            qr = q[j + 1:]
            qir = qinv_f[j + 1:]
            diff = mod_sub(rest, a_j[..., None, :] % qr, qr)
            t = t.at[..., j + 1:, :].set(
                mod_mul(diff, invq[j, j + 1:, None], qr, qir, wide))
    D = jnp.stack(digits, axis=-2)  # [..., L, phim]

    # lexicographic compare against floor(P/2) digits, most significant last
    gt = jnp.zeros(D.shape[:-2] + D.shape[-1:], dtype=jnp.int32)
    for j in range(L):
        dj = D[..., j, :]
        hj = half_digits[j]
        gt = jnp.where(dj > hj, 1, jnp.where(dj < hj, 0, gt))

    # limb accumulation: sum_j digit_j * W_j, digits split at 10 bits
    dl = (D & 1023)[..., None]           # [..., L, phim, 1]
    dh = (D >> 10)[..., None]
    Wb = W[:, None, :]                   # [L, 1, n]
    Whb = Wh[:, None, :]
    p0 = dl * Wb                         # < 2^26
    p1 = dh * Whb
    acc = jnp.sum(p0 & lb.LIMB_MASK, axis=-3) + jnp.sum(p1 & lb.LIMB_MASK, axis=-3)
    hi = jnp.sum(p0 >> lb.LIMB_BITS, axis=-3) + jnp.sum(p1 >> lb.LIMB_BITS, axis=-3)
    acc = acc + jnp.pad(hi[..., :-1], [(0, 0)] * (hi.ndim - 1) + [(1, 0)])
    acc = acc - gt[..., None] * P_limbs
    out = lb.normalize(acc)
    if out.shape[-1] != n_limbs:
        raise AssertionError("table width mismatch")
    return out
