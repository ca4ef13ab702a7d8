"""Fused exact modular NTT matmul as a Pallas TPU kernel.

ntt.modmatmul builds N_CHUNKS^2 separate XLA dots whose partial products round-trip
through HBM before the Barrett-Horner combine.  This kernel keeps the whole
chunk x chunk accumulation and the modular recombine in VMEM: grid over
(prime l, output tile o), MXU s8xs8->s32 dots per chunk pair, f32-Barrett
on the VPU, one HBM write per output tile.

Used when phim is large enough to tile (>= 256 and a multiple of 128 after
padding); the einsum path remains the reference implementation and the
fallback for small/odd shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import CHUNK_BITS, N_CHUNKS

TILE_O = 256


def _barrett(t, q, qinv):
    quo = jnp.rint(t.astype(jnp.float32) * qinv).astype(jnp.int32)
    r = t - quo * q
    r = jnp.where(r < 0, r + q, r)
    return jnp.where(r >= q, r - q, r)


def _kernel(q_ref, qinv_ref, c_ref, x_ref, o_ref):
    q = q_ref[0]
    qinv = qinv_ref[0]
    x = x_ref[:, 0, :]                                   # [B, Ni] int32
    # balanced 7-bit digit split (see ntt.chunk_x): |d_i| <= 64
    half, mask = 1 << (CHUNK_BITS - 1), (1 << CHUNK_BITS) - 1
    xcs = []
    v = x
    for _ in range(N_CHUNKS - 1):
        d = ((v + half) & mask) - half
        xcs.append(d.astype(jnp.int8))
        v = (v - d) >> CHUNK_BITS
    xcs.append(v.astype(jnp.int8))
    parts = [None] * (2 * N_CHUNKS - 1)
    for i in range(N_CHUNKS):
        xc = xcs[i]
        for j in range(N_CHUNKS):
            m = c_ref[j, 0]                              # [TO, Ni] int8
            pr = jax.lax.dot_general(
                xc, m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)        # [B, TO]
            s = i + j
            parts[s] = pr if parts[s] is None else parts[s] + pr
    r = _barrett(parts[-1], q, qinv)
    for s in range(2 * N_CHUNKS - 3, -1, -1):
        r = _barrett((r << CHUNK_BITS) + parts[s], q, qinv)
    o_ref[:, 0, :] = r


@functools.partial(jax.jit, static_argnames=("tile_o",))
def modmatmul_pallas(mat_chunks, x, q, qinv_f, tile_o: int = TILE_O):
    """Drop-in for ntt.modmatmul on large shapes.

    mat_chunks: int8 [4, L, No, Ni]; x: int32 [..., L, Ni];
    q/qinv_f: [L, 1].  Returns int32 [..., L, No].
    """
    *lead, L, Ni = x.shape
    No = mat_chunks.shape[2]
    xb = x.reshape(-1, L, Ni)
    B = xb.shape[0]
    pad_o = (-No) % tile_o
    mc = mat_chunks
    if pad_o:
        mc = jnp.pad(mat_chunks, ((0, 0), (0, 0), (0, pad_o), (0, 0)))
    no_pad = No + pad_o

    grid = (L, no_pad // tile_o)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda l, o: (l,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda l, o: (l,), memory_space=pltpu.SMEM),
            pl.BlockSpec((N_CHUNKS, 1, tile_o, Ni), lambda l, o: (0, l, o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, Ni), lambda l, o: (0, l, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1, tile_o), lambda l, o: (0, l, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, no_pad), jnp.int32),
    )(q[:, 0], qinv_f[:, 0], mc, xb)
    if pad_o:
        out = out[..., :No]
    return out.reshape(*lead, L, No)
