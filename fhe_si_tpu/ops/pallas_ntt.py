"""Fused exact modular NTT matmul as a Pallas TPU kernel.

ntt.modmatmul builds six separate XLA int8 dots whose int32 partial
products round-trip through HBM before the Karatsuba/Barrett-Horner
combine — ~2 GB of avoidable traffic per step at production shapes.
This kernel keeps the whole digit-product accumulation and the modular
recombine in VMEM: one HBM read of x and the tables, one HBM write of
the residues.

Layout and tiling:
  grid = (prime l, output tile o, batch tile b) — b innermost, so the
  (l, o) table block stays VMEM-resident across the batch sweep and the
  full table stack is fetched exactly once per call.
  Tables are consumed in ntt.chunk_matrix's NATIVE [P, L, n_out, n_in]
  layout: the MXU dot contracts x's last axis against the table's last
  axis (an A @ B^T dot_general), so the einsum path and this kernel share
  one copy of the planes and the device.py flag path needs no transposed
  duplicates (the round-2 wiring bug was exactly such a mismatch).

The einsum path (ops/ntt.py) remains the reference implementation and
the fallback for small shapes; parity is asserted by
tests/test_pallas_ntt.py against it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import CHUNK_BITS, N_CHUNKS, N_PLANES

TILE_O = 256
TILE_B = 128


def _barrett(t, q, qinv):
    quo = jnp.rint(t.astype(jnp.float32) * qinv).astype(jnp.int32)
    r = t - quo * q
    r = jnp.where(r < 0, r + q, r)
    return jnp.where(r >= q, r - q, r)


def _kernel(q_ref, qinv_ref, c_ref, x_ref, o_ref):
    l = pl.program_id(0)
    q = q_ref[l, 0]
    qinv = qinv_ref[l, 0]
    x = x_ref[0]                                         # [TB, Ni] int32
    # balanced 7-bit digit split (see ntt.chunk_x): |d_i| <= 64
    half, mask = 1 << (CHUNK_BITS - 1), (1 << CHUNK_BITS) - 1
    xcs = []
    v = x
    for _ in range(N_CHUNKS - 1):
        d = ((v + half) & mask) - half
        xcs.append(d.astype(jnp.int8))
        v = (v - d) >> CHUNK_BITS
    xcs.append(v.astype(jnp.int8))
    d01 = (xcs[0].astype(jnp.int32) + xcs[1]).astype(jnp.int8)
    d12 = (xcs[1].astype(jnp.int32) + xcs[2]).astype(jnp.int8)
    d02 = (xcs[0].astype(jnp.int32) + xcs[2]).astype(jnp.int8)

    def mm(plane, vec):
        # contract last-vs-last: table block is [TO, Ni] (native layout)
        return jax.lax.dot_general(
            vec, c_ref[plane, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)            # [TB, TO]

    p00, p11, p22 = mm(0, xcs[0]), mm(1, xcs[1]), mm(2, xcs[2])
    p01, p12, p02 = mm(3, d01), mm(4, d12), mm(5, d02)
    cs = (p00, p01 - p00 - p11, p02 - p00 - p22 + p11,
          p12 - p11 - p22, p22)
    r = _barrett(cs[-1], q, qinv)
    for s in range(2 * N_CHUNKS - 3, -1, -1):
        r = _barrett((r << CHUNK_BITS) + cs[s], q, qinv)
    o_ref[0] = r


def _kernel_raw(q_ref, qinv_ref, c_ref, x_ref, o_ref):
    """Like _kernel, but x carries RAW int32 values (|x| < q * 2^20, e.g.
    ByteDecomp digits < 2^24) shared across primes: the per-prime Barrett
    reduction happens here in VMEM, so the [K, L, phim] residue tensor of
    the digit stage never exists in HBM."""
    l = pl.program_id(0)
    q = q_ref[l, 0]
    qinv = qinv_ref[l, 0]
    x = _barrett(x_ref[...], q, qinv)                    # [TB, Ni]
    half, mask = 1 << (CHUNK_BITS - 1), (1 << CHUNK_BITS) - 1
    xcs = []
    v = x
    for _ in range(N_CHUNKS - 1):
        d = ((v + half) & mask) - half
        xcs.append(d.astype(jnp.int8))
        v = (v - d) >> CHUNK_BITS
    xcs.append(v.astype(jnp.int8))
    d01 = (xcs[0].astype(jnp.int32) + xcs[1]).astype(jnp.int8)
    d12 = (xcs[1].astype(jnp.int32) + xcs[2]).astype(jnp.int8)
    d02 = (xcs[0].astype(jnp.int32) + xcs[2]).astype(jnp.int8)

    def mm(plane, vec):
        return jax.lax.dot_general(
            vec, c_ref[plane, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    p00, p11, p22 = mm(0, xcs[0]), mm(1, xcs[1]), mm(2, xcs[2])
    p01, p12, p02 = mm(3, d01), mm(4, d12), mm(5, d02)
    cs = (p00, p01 - p00 - p11, p02 - p00 - p22 + p11,
          p12 - p11 - p22, p22)
    r = _barrett(cs[-1], q, qinv)
    for s in range(2 * N_CHUNKS - 3, -1, -1):
        r = _barrett((r << CHUNK_BITS) + cs[s], q, qinv)
    o_ref[0] = r


@functools.partial(jax.jit, static_argnames=("tile_o", "tile_b"))
def modmatmul_pallas_raw(mat_chunks, x, q, qinv_f,
                         tile_o: int = TILE_O, tile_b: int = TILE_B):
    """NTT of raw int32 rows broadcast across all L primes.

    mat_chunks: int8 [N_PLANES, L, No, Ni] (ntt.chunk_matrix layout);
    x: int32 [..., Ni] with |x| < min(q) * 2^20 (ByteDecomp digits
    qualify); q/qinv_f: [L, 1].
    Returns int32 [..., L, No] — residues of (mat @ (x mod q_l)) mod q_l.
    """
    *lead, Ni = x.shape
    L = mat_chunks.shape[1]
    No = mat_chunks.shape[2]
    xb = x.reshape(-1, Ni)
    B = xb.shape[0]
    pad_o = (-No) % tile_o
    pad_b = (-B) % tile_b
    mc = mat_chunks
    if pad_o:
        mc = jnp.pad(mc, ((0, 0), (0, 0), (0, pad_o), (0, 0)))
    if pad_b:
        xb = jnp.pad(xb, ((0, pad_b), (0, 0)))
    no_pad, b_pad = No + pad_o, B + pad_b

    grid = (L, no_pad // tile_o, b_pad // tile_b)
    out = pl.pallas_call(
        _kernel_raw,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda l, o, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, 1), lambda l, o, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N_PLANES, 1, tile_o, Ni), lambda l, o, b: (0, l, o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, Ni), lambda l, o, b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_b, tile_o), lambda l, o, b: (l, b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, b_pad, no_pad), jnp.int32),
    )(q[:, :1], qinv_f[:, :1], mc, xb)
    out = out[:, :B, :No]
    return jnp.moveaxis(out, 0, 1).reshape(*lead, L, No)


@functools.partial(jax.jit, static_argnames=("tile_o", "tile_b"))
def modmatmul_pallas(mat_chunks, x, q, qinv_f,
                     tile_o: int = TILE_O, tile_b: int = TILE_B):
    """Drop-in for ntt.modmatmul on large shapes (same table layout).

    mat_chunks: int8 [N_PLANES, L, No, Ni] — ntt.chunk_matrix output,
                shared verbatim with the einsum path; x: int32
                [..., L, Ni]; q/qinv_f: [L, 1].
    Returns int32 [..., L, No].
    """
    *lead, L, Ni = x.shape
    No = mat_chunks.shape[2]
    xb = jnp.moveaxis(x.reshape(-1, L, Ni), 1, 0)  # [L, B, Ni]
    B = xb.shape[1]
    pad_o = (-No) % tile_o
    pad_b = (-B) % tile_b
    mc = mat_chunks
    if pad_o:
        mc = jnp.pad(mc, ((0, 0), (0, 0), (0, pad_o), (0, 0)))
    if pad_b:
        xb = jnp.pad(xb, ((0, 0), (0, pad_b), (0, 0)))
    no_pad, b_pad = No + pad_o, B + pad_b

    grid = (L, no_pad // tile_o, b_pad // tile_b)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda l, o, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, 1), lambda l, o, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N_PLANES, 1, tile_o, Ni), lambda l, o, b: (0, l, o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, Ni), lambda l, o, b: (l, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_b, tile_o), lambda l, o, b: (l, b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, b_pad, no_pad), jnp.int32),
    )(q[:, :1], qinv_f[:, :1], mc, xb)
    out = out[:, :B, :No]
    return jnp.moveaxis(out, 0, 1).reshape(*lead, L, No)
