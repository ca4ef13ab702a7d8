"""SPMD sharding over a TPU mesh.

The reference is single-threaded; its only parallelism hook is manual
data-sharding by file (README:78-84).  The TPU-native axes (SURVEY §2):

  'dp'   — ciphertext batch (regression/statistics blocks are independent
           until the final additive reduce): pure data parallelism.
  'limb' — the CRT prime axis L of every residue tensor: elementwise
           ciphertext ops and the per-prime NTT matmuls are independent
           per prime; only Garner CRT reconstruction couples primes, and
           GSPMD inserts the all-gather there automatically.

Round-1 strategy: jit with NamedSharding-annotated inputs and let GSPMD
place collectives; explicit shard_map/ppermute pipelines come later for
the hot paths.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_limb: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_limb
    use = np.array(devices[:n_dp * n_limb]).reshape(n_dp, n_limb)
    return Mesh(use, ('dp', 'limb'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Ciphertext-batch tensors [B, ...]: batch over 'dp', replicated else."""
    return NamedSharding(mesh, P('dp'))


def limb_sharding(mesh: Mesh, l_axis: int, ndim: int) -> NamedSharding:
    """Residue tensors with the prime axis at l_axis sharded over 'limb'."""
    spec = [None] * ndim
    spec[l_axis] = 'limb'
    return NamedSharding(mesh, P(*spec))


def batch_limb_sharding(mesh: Mesh) -> NamedSharding:
    """[B, k, L, phim] evals: batch over 'dp', primes over 'limb'."""
    return NamedSharding(mesh, P('dp', None, 'limb'))


def shard_batched_parts(mesh: Mesh, parts):
    """Place a [B, k, phim, n] limb tensor batch-sharded on the mesh."""
    return jax.device_put(parts, batch_sharding(mesh))


def sharded_mul_relin(dev, mesh: Mesh):
    """Batched mul+relinearize with the key-switch matrix sharded over
    'limb' (its prime axis) and the ciphertext batch over 'dp'; the
    result is reduced over the batch with ciphertext adds (the additive
    block-merge of Regression.h:102-149) under a psum-like GSPMD reduce.

    Returns jitted fn(parts_a [B,ka,phim,n], parts_b, matrix [2,K,L,phim])
    -> summed parts [2, phim, n].
    """
    from ..ops import limbs as lb

    def step(C, a, b, matrix):
        out = dev._mul_relin(C, a, b, matrix)   # rank-generic, native batch
        # additive block reduce: sum of mod-q limb polys then signed reduce
        acc = out[0]
        for i in range(1, out.shape[0]):
            acc = dev._reduce_signed(C, lb.add(acc, out[i]))
        return acc

    in_shardings = (None, batch_sharding(mesh), batch_sharding(mesh),
                    limb_sharding(mesh, 2, 4))
    jitted = jax.jit(step, in_shardings=in_shardings,
                     out_shardings=NamedSharding(mesh, P()))
    return lambda a, b, matrix: jitted(dev.C, a, b, matrix)
