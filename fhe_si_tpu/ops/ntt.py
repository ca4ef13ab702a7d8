"""Exact modular NTT as MXU integer matmuls.

The reference converts between coefficient and evaluation domains with a
Bluestein chirp-z per prime (bluestein.cpp:92-144 inside
Cmodulus::FFT/iFFT, CModulus.cpp:89-132).  On TPU the idiomatic design
evaluates/interpolates with one dense phim x phim matrix per prime
(precomputed on the host, context.ntt_tables): the transform becomes a
batched integer matmul that runs on the MXU systolic array instead of a
scalar butterfly pipeline on the VPU.

Exactness: operands are split into 5-bit chunks (< 32, int8-safe), so
each partial matmul accumulates products < 2^10 over at most phim <= 2^13
terms — int32-exact and MXU-native (s8 x s8 -> s32).  The 4x4 chunk
products are grouped by total shift s = i+j and recombined with a
Barrett-Horner pass.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .modular import barrett

CHUNK_BITS = 5
N_CHUNKS = 4  # covers 20-bit residues


def chunk_matrix(mat: np.ndarray) -> np.ndarray:
    """Host-side: [L, n, k] int matrix -> int8 chunks [N_CHUNKS, L, n, k]."""
    return np.stack([(mat >> (CHUNK_BITS * i)) & ((1 << CHUNK_BITS) - 1)
                     for i in range(N_CHUNKS)]).astype(np.int8)


def modmatmul(mat_chunks, x, q, qinv_f):
    """Exact (mat @ x) mod q, batched over the prime axis.

    mat_chunks: int8 [N_CHUNKS, L, n_out, n_in]  (host-precomputed chunks)
    x:          int32 [..., L, n_in] residues < 2^20
    q, qinv_f:  [L, 1] broadcastables
    returns     int32 [..., L, n_out]
    """
    xc = [((x >> (CHUNK_BITS * i)) & ((1 << CHUNK_BITS) - 1)).astype(jnp.int8)
          for i in range(N_CHUNKS)]
    # partial sums grouped by total shift s = i + j
    parts = [None] * (2 * N_CHUNKS - 1)
    for i in range(N_CHUNKS):
        for j in range(N_CHUNKS):
            pr = jnp.einsum('lok,...lk->...lo', mat_chunks[j], xc[i],
                            preferred_element_type=jnp.int32)
            s = i + j
            parts[s] = pr if parts[s] is None else parts[s] + pr
    # Horner from the top shift down; r < q so (r << 5) + part < 2^26 + 2^26
    r = barrett(parts[-1], q, qinv_f)
    for s in range(2 * N_CHUNKS - 3, -1, -1):
        r = barrett((r << CHUNK_BITS) + parts[s], q, qinv_f)
    return r
