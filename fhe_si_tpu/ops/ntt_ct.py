"""O(L*m)-memory NTT for power-of-two m via two-level Cooley-Tukey.

The dense-table transform (context.ntt_tables + ops/ntt.modmatmul) is
O(L*phim^2) int8 per table plane — ~2 GB HBM at phim=2002 and unusable
past phim ~ 6-8k.  The reference scales to arbitrary m with Bluestein's
chirp-z (bluestein.cpp:92-144: O(m log m) time, O(m) memory); Bluestein
itself cannot be replayed inside 20-bit chain primes (the power-of-two
convolution length N >= 2m-1 would require q = 1 mod lcm(N, m) > 2^28),
so the TPU-native scaling path uses the family lattice crypto actually
scales with — m = 2^k — where the transform factors exactly:

  phim = N = m/2, primitive m-th roots are w^(2u+1), and context.zms
  for m = 2^k is the odd residues ascending: zms[j] = 2j+1.  Hence

    F[j, c] = w^((2j+1)c) = w^c * W^(jc),   W = w^2 of order N

  i.e. a chirp premultiply followed by a CYCLIC DFT of size N — the
  negacyclic NTT.  The size-N DFT then splits c = c1 + N1*c2,
  j = j2 + N2*j1 (N = N1*N2):

    X[j2 + N2*j1] = sum_c1 W^(c1*j2) * (W^N2)^(c1*j1)
                    * sum_c2 (W^N1)^(c2*j2) * x[c1 + N1*c2]

  — an inner batch of N2-point DFTs, a twiddle, and an outer batch of
  N1-point DFTs.  Both DFT stages run as exact int8-digit MXU matmuls
  (ops/ntt.modmatmul: balanced 7-bit digits, Karatsuba 6-dot,
  Barrett-Horner), so the machinery, bounds, and bit-exactness story
  are identical to the dense path; only the table shape changes:
  O(L*(N1^2 + N2^2 + N)) instead of O(L*N^2) — ~430 KB/prime at
  N = 8192 versus ~400 MB/prime dense.

The inverse is exact with no Phi_m-reduction matrix: for m = 2^k the
phim evaluations at the primitive roots determine the degree<phim
polynomial uniquely, so the inverse is the inverse DFT (1/N folded into
the inverse chirp) followed by the inverse chirp — semantics of
Cmodulus::iFFT (CModulus.cpp:109-132) restricted to this family.

Extension note (documented, not built): for smooth m with one odd prime
factor (m = 2*3^k etc.) Phi_m is 3-sparse and X^(m/2) = -1 mod Phi_m,
so the same decomposition plus two block-folds covers those families;
arbitrary prime m at phim >> 8k genuinely needs >20-bit primes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..hostmath import numbth
from . import ntt
from .modular import mod_mul


def _split(N: int) -> tuple[int, int]:
    """N = N1*N2 with N1 >= N2, both powers of two, as square as possible."""
    k = N.bit_length() - 1
    k1 = (k + 1) // 2
    return 1 << k1, 1 << (k - k1)


class CtNttTables:
    """Per-prime Cooley-Tukey tables for one power-of-two m.

    Built from (m, primes, roots) — the same inputs Cmodulus caches per
    prime (CModulus.cpp:59-86).  All tables are device arrays:

      t1_chunks / t2_chunks: int8 [6, L, Ni, Ni] digit planes of the
          outer/inner DFT matrices (ntt.chunk_matrix layout)
      tw  / twi : int32 [N1, L, N2]  twiddles W^(±c1*j2)
      chirp     : int32 [L, N]       w^c
      chirp_inv : int32 [L, N]       w^(-c) * N^(-1)  (1/N folded here)
    """

    def __init__(self, m: int, primes, roots, wide: bool = False):
        assert m & (m - 1) == 0 and m >= 8, "CtNttTables: m must be 2^k >= 8"
        self.m = m
        self.wide = wide
        self.N = N = m // 2
        self.N1, self.N2 = N1, N2 = _split(N)
        primes = np.asarray(primes, dtype=np.int64)
        roots = np.asarray(roots, dtype=np.int64)
        L = len(primes)
        self.L = L

        T1 = np.empty((L, N1, N1), dtype=np.int32)
        T2 = np.empty((L, N2, N2), dtype=np.int32)
        T1i = np.empty((L, N1, N1), dtype=np.int32)
        T2i = np.empty((L, N2, N2), dtype=np.int32)
        tw = np.empty((L, N1, N2), dtype=np.int64)
        twi = np.empty((L, N1, N2), dtype=np.int64)
        chirp = np.empty((L, N), dtype=np.int64)
        chirp_inv = np.empty((L, N), dtype=np.int64)
        for l in range(L):
            q, w = int(primes[l]), int(roots[l])
            assert pow(w, m, q) == 1 and pow(w, m // 2, q) == q - 1, \
                "root is not a primitive m-th root of unity"
            # powers of w over [0, m)
            pw = np.empty(m, dtype=np.int64)
            acc = 1
            for i in range(m):
                pw[i] = acc
                acc = acc * w % q
            winv = numbth.modinv(w, q)
            pwi = np.empty(m, dtype=np.int64)
            acc = 1
            for i in range(m):
                pwi[i] = acc
                acc = acc * winv % q
            # W = w^2 (order N); W^e = pw[(2e) % m]
            j1 = np.arange(N1, dtype=np.int64)
            j2 = np.arange(N2, dtype=np.int64)
            T1[l] = pw[(2 * N2 * np.outer(j1, j1)) % m]
            T2[l] = pw[(2 * N1 * np.outer(j2, j2)) % m]
            T1i[l] = pwi[(2 * N2 * np.outer(j1, j1)) % m]
            T2i[l] = pwi[(2 * N1 * np.outer(j2, j2)) % m]
            tw[l] = pw[(2 * np.outer(j1, j2)) % m]
            twi[l] = pwi[(2 * np.outer(j1, j2)) % m]
            c = np.arange(N, dtype=np.int64)
            chirp[l] = pw[c % m]
            ninv = numbth.modinv(N, q)
            chirp_inv[l] = pwi[c % m] * ninv % q

        self.q = jnp.asarray(primes[:, None], jnp.int32)
        self.qinv_f = jnp.asarray((1.0 / primes[:, None]).astype(np.float32))
        self.t1_chunks = jnp.asarray(ntt.chunk_matrix(T1, wide))
        self.t2_chunks = jnp.asarray(ntt.chunk_matrix(T2, wide))
        self.t1i_chunks = jnp.asarray(ntt.chunk_matrix(T1i, wide))
        self.t2i_chunks = jnp.asarray(ntt.chunk_matrix(T2i, wide))
        # twiddles arranged [N1, L, N2] so they broadcast against the
        # [..., N1, L, N2] intermediate without transposes
        self.tw = jnp.asarray(np.moveaxis(tw, 0, 1).astype(np.int32))
        self.twi = jnp.asarray(np.moveaxis(twi, 0, 1).astype(np.int32))
        self.chirp = jnp.asarray(chirp.astype(np.int32))
        self.chirp_inv = jnp.asarray(chirp_inv.astype(np.int32))

    # Thread tables through jit as arguments (device.py rule: closed-over
    # arrays become HLO constants).
    def pack(self) -> dict:
        return dict(q=self.q, qinv_f=self.qinv_f,
                    t1=self.t1_chunks, t2=self.t2_chunks,
                    t1i=self.t1i_chunks, t2i=self.t2i_chunks,
                    tw=self.tw, twi=self.twi,
                    chirp=self.chirp, chirp_inv=self.chirp_inv)


def _shape_split(x, N1, N2):
    """[..., L, N] -> [..., N1, L, N2] with c = c1 + N1*c2: element
    (c1, l, c2) = x[l, c1 + N1*c2]."""
    *lead, L, N = x.shape
    y = x.reshape(*lead, L, N2, N1)        # [.., L, c2, c1]
    return jnp.moveaxis(y, -1, -3)         # [.., c1, L, c2]


def _shape_join(y, N1, N2):
    """[..., N1, L, N2] with (j1, l, j2) -> [..., L, N], j = j2 + N2*j1."""
    z = jnp.moveaxis(y, -3, -2)            # [.., L, j1, j2]
    *lead, L, _, _ = z.shape
    return z.reshape(*lead, L, N1 * N2)


def _is_wide(T: dict) -> bool:
    """Lane of a packed table (static): wide tables carry 9 digit planes."""
    return T['t1'].shape[0] == ntt.N_PLANES_W


def ct_fwd(T: dict, x, N1: int, N2: int):
    """Evaluations at primitive m-th roots in zms (ascending-odd) order:
    identical semantics and values to the dense ntt_fwd.  x: int32
    [..., L, N] residues in [0, q)."""
    w = _is_wide(T)
    y = mod_mul(x, T['chirp'], T['q'], T['qinv_f'], w)
    y = _shape_split(y, N1, N2)                      # [.., c1, L, c2]
    y = ntt.modmatmul(T['t2'], y, T['q'], T['qinv_f'])   # DFT over c2 -> j2
    y = mod_mul(y, T['tw'], T['q'], T['qinv_f'], w)
    y = jnp.swapaxes(y, -1, -3)                      # [.., j2, L, c1]
    y = ntt.modmatmul(T['t1'], y, T['q'], T['qinv_f'])   # DFT over c1 -> j1
    y = jnp.swapaxes(y, -1, -3)                      # [.., j1, L, j2]
    return _shape_join(y, N1, N2)


def ct_inv(T: dict, evals, N1: int, N2: int, chirp_key: str = 'chirp_inv'):
    """Inverse of ct_fwd (coefficients of the unique degree<N poly).

    chirp_key='chirp_inv_crt' selects the inverse chirp with the CRT
    premultiplier binv folded in (device.DeviceContext ct_with_crt) —
    the CT analog of the dense path's prescaled 'inv_chunks_crt'."""
    w = _is_wide(T)
    *lead, L, N = evals.shape
    y = evals.reshape(*lead, L, N1, N2)              # j = j2 + N2*j1
    y = jnp.moveaxis(y, -2, -3)                      # [.., j1, L, j2]
    y = jnp.swapaxes(y, -1, -3)                      # [.., j2, L, j1]
    y = ntt.modmatmul(T['t1i'], y, T['q'], T['qinv_f'])  # inv DFT over j1
    y = jnp.swapaxes(y, -1, -3)                      # [.., c1, L, j2]
    y = mod_mul(y, T['twi'], T['q'], T['qinv_f'], w)
    y = ntt.modmatmul(T['t2i'], y, T['q'], T['qinv_f'])  # inv DFT over j2
    y = _shape_split_inv(y, N1, N2)
    return mod_mul(y, T[chirp_key], T['q'], T['qinv_f'], w)


def _shape_split_inv(y, N1, N2):
    """[..., c1, L, c2] -> [..., L, N] with c = c1 + N1*c2."""
    z = jnp.moveaxis(y, -3, -1)            # [.., L, c2, c1]
    *lead, L, _, _ = z.shape
    return z.reshape(*lead, L, N2 * N1)
