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


def chunk_matrix(mat: np.ndarray) -> np.ndarray:
    """Host-side: [L, n, k] int matrix (entries in [0, 2^20)) -> balanced
    int8 digit planes [N_PLANES, L, n, k]: the 3 digits with
    mat == sum_i d_i << (7i), then the 3 pairwise sums for Karatsuba.

    Digit ranges: d0, d1 in [-64, 63]; d2 in [0, 64]; every pairwise sum
    lies in [-128, 127] and is computed directly in int8 (no wrap).
    Processed one prime-slab at a time to keep temporaries at
    O(n*k) int32 instead of O(L*n*k) (setup-time hot path at phim ~ 2000).
    """
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


def prescale_planes(planes, scale, q, qinv_f):
    """Device-side re-chunking of a table with a per-prime scalar folded in.

    Rebuilds the integer entries from the 3 digit planes, multiplies by
    `scale` mod q, and re-splits (same balanced digits + pairwise sums as
    chunk_matrix).  Used at DeviceContext init to fold the CRT
    premultiplier binv into the iNTT tables ('inv_chunks_crt').

    planes: int8 [N_PLANES, L, n, k]; scale/q/qinv_f broadcastable to
    [L, n, k].  Returns int8 [N_PLANES, L, n, k].
    """
    from .modular import mod_mul
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
    """The six MXU dots + Karatsuba recombine, WITHOUT the modular Horner.

    Returns the five shift-group partial sums (c0..c4), each int32
    [..., L, n_out] with |c_s| < 2^28.  These are LINEAR in x, so under
    coefficient-axis sharding each shard computes them on its n_in slice
    and a psum over the shards yields the full groups
    (parallel/shard.py coeff_sharded_ntt) — the bounds above hold for the
    full contraction length, so the psum cannot overflow.
    """
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


def horner_combine(groups, q, qinv_f):
    """Barrett-Horner combine of the shift groups into residues mod q;
    |(r << 7) + c_s| < 2^27 + 2^28 < 2^29 keeps the f32 quotient exact."""
    r = barrett(groups[-1], q, qinv_f)
    for c in groups[-2::-1]:
        r = barrett((r << CHUNK_BITS) + c, q, qinv_f)
    return r


def modmatmul(mat_chunks, x, q, qinv_f):
    """Exact (mat @ x) mod q, batched over the prime axis.

    mat_chunks: int8 [N_PLANES, L, n_out, n_in]  (host digit+sum planes)
    x:          int32 [..., L, n_in] residues in [0, q), q < 2^20
    q, qinv_f:  [L, 1] broadcastables
    returns     int32 [..., L, n_out]
    """
    return horner_combine(karatsuba_groups(mat_chunks, x), q, qinv_f)
