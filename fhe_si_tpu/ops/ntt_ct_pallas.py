"""Fused Pallas kernels for the power-of-two-m Cooley-Tukey NTT.

WHY A KERNEL HERE (and why the round-3 dense-path kernel was deleted):
the CT transform at production digit volume is BANDWIDTH-bound, not
MXU-bound — the useful matmul work is ~0.05 ms while XLA materializes
~6 int32 Karatsuba-group tensors per stage in HBM (measured 5.6 ms for
the digit transform at [768, 8, 4096]; tools/profile_ct2.py).  The
round-3 postmortem killed a kernel on the DENSE path, which runs at 29%
MFU — compute-bound, where XLA's matmul scheduling wins.  Here the
whole two-stage factorization fits in VMEM (all stage tables < 0.6 MB),
so one kernel fuses: digit chunking -> stage-1 dots -> Barrett-Horner
-> twiddle -> stage-2 dots -> Barrett-Horner -> output layout, with HBM
traffic reduced to the input read + output write.

Layout: grid is (row blocks, primes); every array is shaped so its
last two dims are the full (N1, N2)-class grids the Mosaic lowering
requires (reshapes between [.., N] and [.., N1, N2] happen in the
wrappers — Mosaic cannot shape-cast the lane dim), and each grid step
compiles to one small (~30-dot) kernel body.

Scope: NARROW lane (q < 2^20, 3x7-bit digit planes), m = 2^k (no
excluded rows), N1/N2 <= 128.  Everything else falls back to the XLA
path in ops/ntt_ct.py; both paths are bit-identical
(tests/test_ntt_ct_pallas.py, interpret mode on CPU + real TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_ct import CtMeta

# rows per grid step: VMEM ~ 6 group buffers (bm*N*4B each) + in/out
# blocks (bm*N*4B) + int8 planes; bm=32 at N=4096 is ~4 MB of groups,
# well under the ~16 MB/core VMEM.  Overridable for experiments.
import os as _os
BM = int(_os.environ.get("FHE_SI_TPU_PALLAS_BM", "32"))


def supported(meta: CtMeta, wide: bool) -> bool:
    """Narrow lane, m = 2^k, stage factors within the MXU/VPU tile
    sweet spot (the prime chain rides a grid axis, so any L works)."""
    return (not wide and meta.q_odd == 1
            and 8 <= meta.N2 <= meta.N1 <= 128)


def _dot_c1(lhs, rhs):
    """lhs [bm, k, f] (contract axis 1) x rhs [o, k] -> [bm, f, o]."""
    return jax.lax.dot_general(
        lhs, rhs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def _barrett(t, q, qinv_f):
    quo = jnp.rint(t.astype(jnp.float32) * qinv_f).astype(jnp.int32)
    r = t - quo * q
    r = jnp.where(r < 0, r + q, r)
    return jnp.where(r >= q, r - q, r)


def _mod_mul_narrow(a, b, q, qinv_f):
    a1, a0 = a >> 10, a & 1023
    b1, b0 = b >> 10, b & 1023
    t = ((a1 * b1) << 10) + a1 * b0 + a0 * b1
    tm = _barrett(t, q, qinv_f)
    return _barrett((tm << 10) + a0 * b0, q, qinv_f)


def _chunk_planes(v, nchunks):
    """Balanced base-2^7 int8 planes of nonnegative int32 v."""
    out = []
    for _ in range(nchunks - 1):
        d = ((v + 64) & 127) - 64
        out.append(d.astype(jnp.int8))
        v = (v - d) >> 7
    out.append(v.astype(jnp.int8))
    return out


def _horner(groups, q, qinv_f):
    r = _barrett(groups[-1], q, qinv_f)
    for c in groups[-2::-1]:
        r = _barrett((r << 7) + c, q, qinv_f)
    return r


def _stage_cross(planes_act, tab3, q, qinv_f):
    """Digit-cross stage: activation planes (4) x raw table planes (3),
    12 dots, 6 shift groups, Barrett-Horner.  tab3 [3, o, k]."""
    n_act = len(planes_act)
    groups = [None] * (3 + n_act - 1)
    for i in range(3):
        tp = tab3[i]
        for j in range(n_act):
            d = _dot_c1(planes_act[j], tp)
            s = i + j
            groups[s] = d if groups[s] is None else groups[s] + d
    return _horner(groups, q, qinv_f)


def _stage_karatsuba(y, tab6, q, qinv_f):
    """6-dot Karatsuba stage on residues y [bm, k, f] (contract axis 1)
    against the 6-plane table [6, o, k].  Returns int32 [bm, f, o]."""
    d = _chunk_planes(y, 3)
    d01 = (d[0].astype(jnp.int32) + d[1]).astype(jnp.int8)
    d12 = (d[1].astype(jnp.int32) + d[2]).astype(jnp.int8)
    d02 = (d[0].astype(jnp.int32) + d[2]).astype(jnp.int8)
    p00 = _dot_c1(d[0], tab6[0])
    p11 = _dot_c1(d[1], tab6[1])
    p22 = _dot_c1(d[2], tab6[2])
    p01 = _dot_c1(d01, tab6[3])
    p12 = _dot_c1(d12, tab6[4])
    p02 = _dot_c1(d02, tab6[5])
    groups = (p00,
              p01 - p00 - p11,
              p02 - p00 - p22 + p11,
              p12 - p11 - p22,
              p22)
    return _horner(groups, q, qinv_f)


def _fwd_tail_l(y1, t1_l, tw_l, q, qinv_f):
    """Twiddle + outer DFT from stage-1 y1 [bm, c1, j2] -> [bm, j1, j2]
    (the u = j2 + N2*j1 output grid)."""
    y1 = _mod_mul_narrow(y1, tw_l, q, qinv_f)        # tw_l [c1, j2]
    y2 = _stage_karatsuba(y1, t1_l, q, qinv_f)       # contract c1
    return jnp.swapaxes(y2, -1, -2)                  # [bm, j1, j2]


# All reshapes between [.., N] and [.., N1, N2]-class grids happen in
# the WRAPPERS (XLA-side, free): Mosaic cannot shape-cast the lane dim.

def _fwd_digits_kernel(d_ref, t2_ref, t1_ref, tw_ref, q_ref, qi_ref,
                       out_ref, *, n_act):
    l = pl.program_id(1)
    q = q_ref[l, 0]
    qi = qi_ref[l, 0]
    dd = d_ref[:]                                # [bm, c2, c1]
    act = _chunk_planes(dd, n_act)               # contract c2 (axis 1)
    y1 = _stage_cross(act, t2_ref[:, 0], q, qi)      # [bm, c1, j2]
    out_ref[:, 0] = _fwd_tail_l(y1, t1_ref[:, 0], tw_ref[0], q, qi)


def _fwd_res_kernel(x_ref, t2_ref, t1_ref, tw_ref, q_ref, qi_ref,
                    out_ref):
    l = pl.program_id(1)
    q = q_ref[l, 0]
    qi = qi_ref[l, 0]
    xx = x_ref[:, 0]                             # [bm, c2, c1] residues
    y1 = _stage_karatsuba(xx, t2_ref[:, 0], q, qi)   # [bm, c1, j2]
    out_ref[:, 0] = _fwd_tail_l(y1, t1_ref[:, 0], tw_ref[0], q, qi)


def _inv_kernel(e_ref, t1i_ref, t2i_ref, twi_ref, q_ref, qi_ref,
                out_ref):
    l = pl.program_id(1)
    q = q_ref[l, 0]
    qi = qi_ref[l, 0]
    ee = e_ref[:, 0]                             # [bm, j1, j2]
    z = _stage_karatsuba(ee, t1i_ref[:, 0], q, qi)  # j1 -> [bm, j2, c1]
    # twiddle twi_l [c1, j2] -> [j2, c1] against [bm, j2, c1]
    z = _mod_mul_narrow(z, jnp.swapaxes(twi_ref[0], 0, 1), q, qi)
    y = _stage_karatsuba(z, t2i_ref[:, 0], q, qi)   # j2 -> [bm, c1, c2]
    out_ref[:, 0] = jnp.swapaxes(y, -1, -2)      # [bm, c2, c1]


def _pad_rows(x, bm):
    R = x.shape[0]
    pad = (-R) % bm
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return x, R


@partial(jax.jit, static_argnames=("meta", "digit_bits", "interpret"))
def ct_fwd_digits(T, digits, meta: CtMeta, digit_bits: int,
                  interpret: bool = False):
    """Fused forward transform of prime-independent digit rows.

    digits int32 [..., phim] in [0, 2^digit_bits) -> [..., L, phim].
    Bit-identical to ntt_ct.ct_fwd_digits (the XLA path)."""
    N1, N2 = meta.N1, meta.N2
    N = meta.N
    n_act = (digit_bits + 6) // 7
    lead = digits.shape[:-1]
    d2 = digits.reshape((-1, N))
    d2, R = _pad_rows(d2, BM)
    L = T['q'].shape[0]
    Rp = d2.shape[0]
    d4 = d2.reshape(Rp, N2, N1)                  # c = c1 + N1*c2
    out = pl.pallas_call(
        partial(_fwd_digits_kernel, n_act=n_act),
        out_shape=jax.ShapeDtypeStruct((Rp, L, N1, N2), jnp.int32),
        grid=(Rp // BM, L),
        in_specs=[
            pl.BlockSpec((BM, N2, N1), lambda i, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, N2, N2), lambda i, l: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, N1, N1), lambda i, l: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1, N2), lambda i, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BM, 1, N1, N2), lambda i, l: (i, l, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(d4, T['t2'][:3], T['t1'], jnp.swapaxes(T['tw'], 0, 1),
      T['q'], T['qinv_f'])
    return out[:R].reshape(lead + (L, N))


@partial(jax.jit, static_argnames=("meta", "interpret"))
def ct_fwd(T, x, meta: CtMeta, interpret: bool = False):
    """Fused forward transform of per-prime residues [..., L, phim]."""
    N1, N2 = meta.N1, meta.N2
    N = meta.N
    lead = x.shape[:-2]
    L = x.shape[-2]
    x2 = x.reshape((-1, L, N))
    x2, R = _pad_rows(x2, BM)
    Rp = x2.shape[0]
    x4 = x2.reshape(Rp, L, N2, N1)               # c = c1 + N1*c2
    out = pl.pallas_call(
        _fwd_res_kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, L, N1, N2), jnp.int32),
        grid=(Rp // BM, L),
        in_specs=[
            pl.BlockSpec((BM, 1, N2, N1), lambda i, l: (i, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, N2, N2), lambda i, l: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, N1, N1), lambda i, l: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1, N2), lambda i, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BM, 1, N1, N2), lambda i, l: (i, l, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x4, T['t2'], T['t1'], jnp.swapaxes(T['tw'], 0, 1),
      T['q'], T['qinv_f'])
    return out[:R].reshape(lead + (L, N))


@partial(jax.jit, static_argnames=("meta", "t2i_key", "interpret"))
def ct_inv(T, evals, meta: CtMeta, t2i_key: str = 't2i',
           interpret: bool = False):
    """Fused inverse transform [..., L, phim] -> coefficients."""
    N1, N2 = meta.N1, meta.N2
    N = meta.N
    lead = evals.shape[:-2]
    L = evals.shape[-2]
    e2 = evals.reshape((-1, L, N))
    e2, R = _pad_rows(e2, BM)
    Rp = e2.shape[0]
    e4 = e2.reshape(Rp, L, N1, N2)               # u = j2 + N2*j1
    out = pl.pallas_call(
        _inv_kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, L, N2, N1), jnp.int32),
        grid=(Rp // BM, L),
        in_specs=[
            pl.BlockSpec((BM, 1, N1, N2), lambda i, l: (i, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, N1, N1), lambda i, l: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, N2, N2), lambda i, l: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1, N2), lambda i, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BM, 1, N2, N1), lambda i, l: (i, l, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(e4, T['t1i'], T[t2i_key], jnp.swapaxes(T['twi'], 0, 1),
      T['q'], T['qinv_f'])
    return out[:R].reshape(lead + (L, N))
