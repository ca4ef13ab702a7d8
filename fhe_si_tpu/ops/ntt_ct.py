"""O(L*m)-memory NTT for m = 2^a * q^b via two-level Cooley-Tukey.

The dense-table transform (context.ntt_tables + ops/ntt.modmatmul) is
O(L*phim^2) int8 per table plane — ~2 GB HBM at phim=2002 and unusable
past phim ~ 6-8k.  The reference scales to arbitrary m with Bluestein's
chirp-z (bluestein.cpp:92-144: O(m log m) time, O(m) memory); Bluestein
itself cannot be replayed inside 20/23-bit chain primes (the
power-of-two convolution length N >= 2m-1 would require q = 1 mod
lcm(N, m) > 2^28), so the TPU-native scaling family is every EVEN m
whose odd part is a prime power — m = 2^a * q^b with q an odd prime
(b = 0 gives the power-of-two family) — which covers the reference's
canonical m = p-1 for safe primes and the 2^a*5-type rings, and factors
exactly into MXU matmul stages:

  Primitive m-th roots are w^t for t = 2u+1 with q !| t, i.e. ALL odd t
  when m = 2^a, else u != (q-1)/2 (mod q).  Let N = m/2 and W = w^2 of
  order N; context.zms ascending == t = 2u+1 ascending == u ascending
  (skipping the excluded residue).  Then

    F[u, c] = w^((2u+1)c) = w^c * W^(uc)

  — a chirp premultiply followed by a CYCLIC DFT of size N.  The size-N
  DFT splits c = c1 + N1*c2, u = j2 + N2*j1 (N = N1*N2, any divisor
  split):

    X[j2 + N2*j1] = sum_c1 W^(N2*j1*c1) * tw(c1, j2)
                    * sum_c2 W^(N1*j2*c2) * y[c1 + N1*c2]

  — an inner batch of N2-point DFTs, a twiddle, and an outer batch of
  N1-point DFTs.  THE CHIRP IS FOLDED INTO THE TABLES (new, round 5):
  w^c = w^(c1) * w^(N1*c2); the c2 factor folds into the inner DFT's
  columns (t2) and the c1 factor into the twiddle (tw), so no standalone
  chirp pass touches the activation — the first per-prime contact of the
  data IS the stage-1 matmul, which lets the keyswitch digit stage feed
  prime-INDEPENDENT digit values straight into it
  (ops/ntt.digit_cross_groups; device._digit_evals).

  Both DFT stages run as exact int8-digit MXU matmuls (ops/ntt.modmatmul:
  balanced digits, Karatsuba, Barrett-Horner), so the machinery, bounds,
  and bit-exactness story are identical to the dense path; only the
  table shape changes: O(L*(N1^2 + N2^2 + N)) instead of O(L*N^2) —
  ~430 KB/prime at N = 8192 versus ~400 MB/prime dense.

General m (odd part q^b > 1): the input (phim coefficients) is
zero-padded to length N = m/2 before the chirped DFT, and the output
keeps the u with 2u+1 coprime to m — u mod q != (q-1)/2, a REGULAR
pattern, so the drop is a [N/q, q] reshape + static column slice, not a
gather.  The inverse scatters the evals back (zero column inserted),
runs the inverse DFT + inverse chirp (both folded into tables, with
N^-1 on t2i), and reduces the degree<N result mod Phi_m in closed form:
Phi_m(X) = sum_{i<q} (-1)^i X^(i*s) with s = m/(2q) (Phi_{2^a q^b} =
Phi_{2q}(X^(m/2q))), so X^(phim+r) = sum_{i<q-1} (-1)^(i+1) X^(i*s+r)
for r < s = N - phim — ONE signed block-fold of the tail into the q-1
leading blocks (semantics of Cmodulus::iFFT's reduce-mod-Phi_m,
CModulus.cpp:109-132).  For m = 2^k the pad/drop/fold all vanish
(phim = N) and the transform is the negacyclic NTT.

The phim evaluations at the primitive roots determine the polynomial
mod Phi_m uniquely, and the folded result is its canonical degree<phim
representative — bit-identical to the dense path and the oracle
(tests/test_ntt_ct.py, tests/test_ct_scheme.py).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..hostmath import numbth
from . import ntt
from .modular import mod_add, mod_mul, mod_sub


class CtMeta(NamedTuple):
    """Static (trace-time) transform geometry, threaded alongside the
    device table dict."""
    N1: int
    N2: int
    phim: int
    q_odd: int       # odd prime of m's odd part (1 for m = 2^k)

    @property
    def N(self) -> int:
        return self.N1 * self.N2

    @property
    def u0(self) -> int:
        """Excluded DFT row residue: u = (q-1)/2 (mod q) has q | 2u+1."""
        return (self.q_odd - 1) // 2


def ct_supported(m: int) -> bool:
    """True when m rides this family: even m >= 8 whose odd part is 1 or
    an odd prime power (Phi_m is then the q-sparse polynomial the inverse
    fold relies on)."""
    if m < 8 or m % 2:
        return False
    odd = m
    while odd % 2 == 0:
        odd //= 2
    if odd == 1:
        return True
    fac = set(numbth.factorize(odd))
    return len(fac) == 1


def _odd_prime(m: int) -> int:
    odd = m
    while odd % 2 == 0:
        odd //= 2
    return 1 if odd == 1 else min(numbth.factorize(odd))


def _split(N: int) -> tuple[int, int]:
    """N = N1*N2 with N1 >= N2, both divisors, as square as possible."""
    best = 1
    for d in range(1, int(math.isqrt(N)) + 1):
        if N % d == 0:
            best = d
    return N // best, best


class CtNttTables:
    """Per-prime Cooley-Tukey tables for one m = 2^a * q^b.

    Built from (m, primes, roots) — the same inputs Cmodulus caches per
    prime (CModulus.cpp:59-86).  All tables are device arrays; the chirp
    and 1/N normalization are FOLDED in (module header):

      t1  : int8 planes [P, L, N1, N1]   W^(N2*j1*c1)
      t2  : int8 planes [P, L, N2, N2]   W^(N1*j2*c2) * w^(N1*c2)
      tw  : int32 [N1, L, N2]            w^c1 * W^(c1*j2)
      t1i : int8 planes [P, L, N1, N1]   W^(-N2*j1*c1)
      t2i : int8 planes [P, L, N2, N2]   W^(-N1*j2*c2) * w^(-N1*c2) / N
      twi : int32 [N1, L, N2]            w^(-c1) * W^(-c1*j2)
    """

    def __init__(self, m: int, primes, roots, wide: bool = False):
        assert ct_supported(m), \
            f"CtNttTables: m={m} must be even >= 8 with prime-power odd part"
        self.m = m
        self.wide = wide
        self.N = N = m // 2
        self.q_odd = q_odd = _odd_prime(m)
        self.phim = N if q_odd == 1 else N // q_odd * (q_odd - 1)
        self.N1, self.N2 = N1, N2 = _split(N)
        self.meta = CtMeta(N1, N2, self.phim, q_odd)
        primes = np.asarray(primes, dtype=np.int64)
        roots = np.asarray(roots, dtype=np.int64)
        self.roots = roots
        L = len(primes)
        self.L = L

        T1 = np.empty((L, N1, N1), dtype=np.int32)
        T2 = np.empty((L, N2, N2), dtype=np.int32)
        T1i = np.empty((L, N1, N1), dtype=np.int32)
        T2i = np.empty((L, N2, N2), dtype=np.int32)
        tw = np.empty((L, N1, N2), dtype=np.int64)
        twi = np.empty((L, N1, N2), dtype=np.int64)
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
            T1i[l] = pwi[(2 * N2 * np.outer(j1, j1)) % m]
            # inner DFT with the c2 chirp factor folded into its columns:
            # t2[j2, c2] = W^(N1*j2*c2) * w^(N1*c2) = w^(N1*c2*(2*j2+1))
            c2 = np.arange(N2, dtype=np.int64)
            T2[l] = pw[(N1 * c2[None, :] * (2 * j2[:, None] + 1)) % m]
            # inverse inner DFT with the inverse chirp factor AND 1/N:
            # t2i[c2, j2] = W^(-N1*j2*c2) * w^(-N1*c2) / N
            ninv = numbth.modinv(N, q)
            T2i[l] = pwi[(N1 * c2[:, None] * (2 * j2[None, :] + 1)) % m] \
                * ninv % q
            c1 = np.arange(N1, dtype=np.int64)
            # twiddle with the c1 chirp factor folded:
            # tw[c1, j2] = w^c1 * W^(c1*j2) = w^(c1*(2*j2+1))
            tw[l] = pw[(c1[:, None] * (2 * j2[None, :] + 1)) % m]
            twi[l] = pwi[(c1[:, None] * (2 * j2[None, :] + 1)) % m]

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

    # Thread tables through jit as arguments (device.py rule: closed-over
    # arrays become HLO constants).
    def pack(self) -> dict:
        return dict(q=self.q, qinv_f=self.qinv_f,
                    t1=self.t1_chunks, t2=self.t2_chunks,
                    t1i=self.t1i_chunks, t2i=self.t2i_chunks,
                    tw=self.tw, twi=self.twi)


def _shape_split(x, N1, N2):
    """[..., L, N] -> [..., N1, L, N2] with c = c1 + N1*c2: element
    (c1, l, c2) = x[l, c1 + N1*c2]."""
    *lead, L, N = x.shape
    y = x.reshape(*lead, L, N2, N1)        # [.., L, c2, c1]
    return jnp.moveaxis(y, -1, -3)         # [.., c1, L, c2]


def _shape_join(y, N1, N2):
    """[..., N1, L, N2] with (j1, l, j2) -> [..., L, N], u = j2 + N2*j1."""
    z = jnp.moveaxis(y, -3, -2)            # [.., L, j1, j2]
    *lead, L, _, _ = z.shape
    return z.reshape(*lead, L, N1 * N2)


def _shape_split_inv(y, N1, N2):
    """[..., c1, L, c2] -> [..., L, N] with c = c1 + N1*c2."""
    z = jnp.moveaxis(y, -3, -1)            # [.., L, c2, c1]
    *lead, L, _, _ = z.shape
    return z.reshape(*lead, L, N2 * N1)


def _is_wide(T: dict) -> bool:
    """Lane of a packed table (static): wide tables carry 9 digit planes."""
    return T['t1'].shape[0] == ntt.N_PLANES_W


def _drop_excluded(full, meta: CtMeta):
    """[..., L, N] DFT output in u-order -> [..., L, phim] rows with
    2u+1 coprime to m (u mod q != u0): static column slice, no gather."""
    if meta.q_odd == 1:
        return full
    *lead, L, N = full.shape
    q, u0 = meta.q_odd, meta.u0
    g = full.reshape(*lead, L, N // q, q)
    kept = jnp.concatenate([g[..., :u0], g[..., u0 + 1:]], axis=-1)
    return kept.reshape(*lead, L, meta.phim)


def _insert_excluded(evals, meta: CtMeta):
    """Inverse of _drop_excluded: zero column at the excluded residue."""
    if meta.q_odd == 1:
        return evals
    *lead, L, phim = evals.shape
    q, u0 = meta.q_odd, meta.u0
    g = evals.reshape(*lead, L, meta.N // q, q - 1)
    z = jnp.zeros(g.shape[:-1] + (1,), dtype=evals.dtype)
    full = jnp.concatenate([g[..., :u0], z, g[..., u0:]], axis=-1)
    return full.reshape(*lead, L, meta.N)


def _fold_mod_phim(z, q_dev, meta: CtMeta):
    """degree<N coefficients -> degree<phim, exactly mod Phi_m:
    X^(phim+r) = sum_{i<q-1} (-1)^(i+1) X^(i*s+r), r < s = N - phim
    (module header).  z: residues [..., L, N] in [0, q)."""
    if meta.q_odd == 1:
        return z
    *lead, L, N = z.shape
    q, phim = meta.q_odd, meta.phim
    s = N - phim
    head = z[..., :phim].reshape(*lead, L, q - 1, s)
    tail = z[..., phim:][..., None, :]               # [..., L, 1, s]
    qd = q_dev[..., None]                            # [L, 1, 1]
    tail_b = jnp.broadcast_to(tail, head.shape)
    # sign of block i is (-1)^(i+1): -, +, -, ...
    sign_neg = (jnp.arange(q - 1, dtype=jnp.int32) % 2 == 0)[:, None]
    folded = jnp.where(sign_neg, mod_sub(head, tail_b, qd),
                       mod_add(head, tail_b, qd))
    return folded.reshape(*lead, L, phim)


def _pad_to_N(x, meta: CtMeta):
    if meta.q_odd == 1:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, meta.N - meta.phim)]
    return jnp.pad(x, pad)


def _flatten_lead(x, keep: int):
    """Merge every leading dim ahead of the last `keep` axes into one.

    XLA lowers the stage einsums/transposes of this module dramatically
    worse at rank >= 4 (measured 14.6 vs 5.0 ms/step for identical data
    at the ct4096 digit volume, tools/profile_digit_layout.py), so every
    public transform flattens its leading dims at trace time and
    restores them on the way out.  Returns (flat, lead_shape)."""
    lead = x.shape[:x.ndim - keep]
    if len(lead) <= 1:
        return x, None
    return x.reshape((-1,) + x.shape[x.ndim - keep:]), lead


def _restore_lead(y, lead):
    if lead is None:
        return y
    return y.reshape(lead + y.shape[1:])


def _fwd_tail(T, y, meta: CtMeta):
    """Shared forward tail from the stage-1 output [..., c1, L, j2]:
    twiddle, outer DFT, join, drop excluded rows."""
    w = _is_wide(T)
    y = mod_mul(y, T['tw'], T['q'], T['qinv_f'], w)
    y = jnp.swapaxes(y, -1, -3)                      # [.., j2, L, c1]
    y = ntt.modmatmul(T['t1'], y, T['q'], T['qinv_f'])   # DFT over c1 -> j1
    y = jnp.swapaxes(y, -1, -3)                      # [.., j1, L, j2]
    return _drop_excluded(_shape_join(y, meta.N1, meta.N2), meta)


def ct_fwd(T: dict, x, meta: CtMeta):
    """Evaluations at primitive m-th roots in zms (ascending-t) order:
    identical semantics and values to the dense ntt_fwd.  x: int32
    [..., L, phim] residues in [0, q)."""
    x, lead = _flatten_lead(x, 2)
    y = _shape_split(_pad_to_N(x, meta), meta.N1, meta.N2)
    y = ntt.modmatmul(T['t2'], y, T['q'], T['qinv_f'])   # chirped DFT c2->j2
    return _restore_lead(_fwd_tail(T, y, meta), lead)


def ct_fwd_digits(T: dict, digits, meta: CtMeta, digit_bits: int):
    """ct_fwd of PRIME-INDEPENDENT digit values (the keyswitch digit
    stage, FHE-SI.cpp:241-260 ByteDecomp rows): digits int32 [..., phim]
    in [0, 2^digit_bits), digit_bits <= 27.

    The per-prime residue reduction is NOT materialized: stage 1
    contracts the raw digit values against the chirped inner-DFT digit
    planes (ops/ntt.digit_cross_groups — one wide [M, K] x [K, L*N2]
    matmul per plane pair), and the Barrett-Horner combine of the matmul
    OUTPUT performs the first mod-q reduction.  Bit-identical to
    ct_fwd(T, barrett(digits) broadcast per prime) by linearity."""
    digits, lead = _flatten_lead(digits, 1)
    # split WITHOUT an L axis: [..., N] -> [..., N1, N2], c = c1 + N1*c2
    d = _pad_to_N(digits, meta)
    *ld, N = d.shape
    d = d.reshape(*ld, meta.N2, meta.N1)             # [.., c2, c1]
    d = jnp.swapaxes(d, -1, -2)                      # [.., c1, c2]
    groups, bits = ntt.digit_cross_groups(T['t2'], d, digit_bits)
    y = ntt.horner_combine(groups, T['q'], T['qinv_f'], bits)
    # digit_cross_groups emits [..., c1, L, j2] (l, o from the table)
    return _restore_lead(_fwd_tail(T, y, meta), lead)


def ct_inv(T: dict, evals, meta: CtMeta, t2i_key: str = 't2i'):
    """Inverse of ct_fwd (canonical degree<phim representative mod
    Phi_m).

    t2i_key='t2i_crt' selects the inverse inner-DFT table with the CRT
    premultiplier binv folded in (device.DeviceContext ct_with_crt) —
    the CT analog of the dense path's prescaled 'inv_chunks_crt'."""
    w = _is_wide(T)
    N1, N2 = meta.N1, meta.N2
    evals, flead = _flatten_lead(evals, 2)
    y = _insert_excluded(evals, meta)
    *lead, L, N = y.shape
    y = y.reshape(*lead, L, N1, N2)                  # u = j2 + N2*j1
    y = jnp.moveaxis(y, -2, -3)                      # [.., j1, L, j2]
    y = jnp.swapaxes(y, -1, -3)                      # [.., j2, L, j1]
    y = ntt.modmatmul(T['t1i'], y, T['q'], T['qinv_f'])  # inv DFT over j1
    y = jnp.swapaxes(y, -1, -3)                      # [.., c1, L, j2]
    y = mod_mul(y, T['twi'], T['q'], T['qinv_f'], w)
    y = ntt.modmatmul(T[t2i_key], y, T['q'], T['qinv_f'])  # inv DFT over j2
    z = _shape_split_inv(y, N1, N2)
    return _restore_lead(_fold_mod_phim(z, T['q'], meta), flead)
