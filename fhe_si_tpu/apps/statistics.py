"""Encrypted mean / second moment / covariance (reference Statistics.h:12-208).

Covariance follows the reference formula  n * sum(x x^T) - mu mu^T  with
rotate-and-reduce slot sums and noise masking of non-first slots.
"""
from __future__ import annotations

import numpy as np

from .. import sampling, scheme
from ..context import FheContext
from .matrix import Matrix


def load_data(filename: str):
    """Statistics-side LoadData (Test_Statistics.cpp:9-33): labels ignored."""
    try:
        with open(filename) as f:
            tokens = f.read().split()
    except OSError as e:
        raise SystemExit(f"Unable to read data file: {e}")
    dim, n = int(tokens[0]), int(tokens[1])
    vals = [int(t) for t in tokens[2:2 + n * (dim + 1)]]
    data = Matrix()
    for i in range(n):
        row = vals[i * (dim + 1):(i + 1) * (dim + 1)]
        data.add_row(row[:dim])
    return data, dim


def batch_data(ctx: FheContext, raw_data: Matrix):
    """Test_Statistics.cpp:35-64: per-batch plaintext blocks + block sizes."""
    batch = ctx.usable_slots
    blocks, block_sizes = [], []
    n, d = raw_data.num_rows(), raw_data.num_cols()
    for i in range(0, n, batch):
        hi = min(i + batch, n)
        row = [scheme.Plaintext.from_slots(
                   ctx, [raw_data.at(k, j) % ctx.p for k in range(i, hi)])
               for j in range(d)]
        blocks.append(row)
        block_sizes.append(scheme.Plaintext(ctx, [(hi - i) % ctx.p]))
    return blocks, block_sizes


class Statistics:
    """Reference Statistics class (Statistics.h:12-171)."""

    def __init__(self, ctx: FheContext, source: sampling.RandomSource):
        self.ctx = ctx
        self.source = source
        self.secret_key, self.public_key = scheme.keygen(ctx, source)
        self.key_switch = scheme.KeySwitch.for_relinearization(
            self.secret_key, source)
        self.auto_key_switch = []
        self.auto_ks = []
        k = ctx.generator
        n_slots = ctx.usable_slots
        while n_slots > 1:
            self.auto_ks.append(k)
            self.auto_key_switch.append(
                scheme.KeySwitch.for_automorph(self.secret_key, k, source))
            n_slots >>= 1
            k = k * k % ctx.m
        self.data = Matrix()
        self.n_elems: list[scheme.Ciphertext] = []

    def prewarm_async(self, dim: int, n_blocks: int) -> list:
        """Launch background compiles of every batched pipeline shape this
        run will hit (scheme.prewarm_async): the compiles overlap the
        host-bound batch/encrypt phases instead of serializing into the
        computation/decryption phases.  Shapes follow compute_covariance
        exactly: P = d(d+1)/2 pair products, nb-block group sums, the
        rotate-reduce stages at batches P and d, and the d+d^2+2
        decryption batch (width-canonical after decrypt_batch)."""
        import jax.numpy as jnp
        from ..device import device_context
        ctx, dev = self.ctx, device_context(self.ctx)
        d, nb = dim, n_blocks
        P = d * (d + 1) // 2
        phim, n_ct, L = ctx.phim, ctx.n_limbs_ct, ctx.num_primes

        def zp(B, k=2):
            return jnp.zeros((B, k, phim, n_ct), jnp.int32)

        def zt(B, k=3):
            return jnp.zeros((B, k, L, phim), jnp.int32)

        ksw_m = self.key_switch.matrix_evals
        aksw = self.auto_key_switch[0] if self.auto_key_switch else None
        pk = self.public_key
        sk = self.secret_key
        zmsg = jnp.zeros((d + 1, phim), jnp.int32)
        zerr = jnp.zeros((d + 1, 2, phim), jnp.int32)
        thunks = [
            # encryption phase: one batch of d+1 per block
            lambda: dev.batched_encrypt_op(pk.pk_evals, zmsg, zmsg, zerr),
            # covariance pair products + block sums
            lambda: dev.batched_tensor_mul_op(zp(P * nb), zp(P * nb)),
            lambda: dev.signed_group_sum_tensored_op(
                zt(P * nb).reshape(P, nb, 3, L, phim),
                jnp.ones((P, nb, 1, L, 1), jnp.int32)),
            lambda: dev.batched_tensor_mul_op(zp(P), zp(P)),
            # keyswitch + rotate-reduce stages (batches P and d)
            lambda: dev.batched_keyswitch_tensored_op(zt(P), ksw_m),
            # *n fused mul+relin, mu scalar negate
            lambda: dev.batched_mul_relin_op(zp(P), zp(P), ksw_m),
            lambda: dev.batched_mul_scalar_op(
                zp(P), jnp.ones(P, jnp.int32), jnp.zeros(P, jnp.bool_)),
            # n^2 single keyswitch chain + noise encrypt + adds
            lambda: scheme.KeySwitch(ctx, ksw_m).apply(
                scheme.Ciphertext(ctx, tprod=jnp.zeros((3, L, phim),
                                                       jnp.int32))),
            lambda: dev.encrypt_op(pk.pk_evals, zmsg[0], zmsg[0], zerr[0]),
            lambda: dev.add_op(zp(1)[0], zp(1)[0]),
            # final fused decryption batch
            lambda: dev.batched_decrypt_op(zp(d + d * d + 2),
                                           sk.sk_evals[:2]),
        ]
        if aksw is not None:
            perm = jnp.asarray(ctx.automorph_perm(self.auto_ks[0]),
                               dtype=jnp.int32)
            thunks += [
                lambda: dev.batched_rotate_reduce_stage_op(
                    zp(P), perm, aksw.matrix_evals),
                lambda: dev.batched_rotate_reduce_stage_op(
                    zp(d), perm, aksw.matrix_evals),
            ]
        return scheme.prewarm_async(thunks)

    def add_data(self, blocks, block_sizes):
        """Statistics.h:29-41, fused into one batched dispatch per block."""
        for row, bs in zip(blocks, block_sizes):
            cts = self.public_key.encrypt_batch(list(row) + [bs], self.source)
            self.data.add_row(cts[:-1])
            self.n_elems.append(cts[-1])

    def _noise(self):
        vals = self.source.uniform_mod_p(self.ctx.total_slots, self.ctx.p)
        vals[0] = 0
        pt = scheme.Plaintext.from_slots(self.ctx, vals, only_usable=False)
        return self.public_key.encrypt(pt, self.source)

    def compute_nth_moment(self, n: int):
        """Statistics.h:48-84: returns (moment: list[Ciphertext], denom)."""
        if n < 1 or n > 2:
            raise ValueError("only moments 1 and 2 are supported")
        cols = self.data.num_cols()
        rows = self.data.num_rows()
        denom = self.n_elems[0]
        for i in range(1, rows):
            denom = denom + self.n_elems[i]
        if n == 2:
            # all squares in one dispatch, then per-column block sums
            pairs = [(self.data.at(i, j), self.data.at(i, j))
                     for j in range(cols) for i in range(rows)]
            moments = scheme.combine_signed_batch(
                scheme.mul_batch(pairs), [1] * len(pairs), rows)
        else:
            moments = []
            for j in range(cols):
                acc = self.data.at(0, j)
                for i in range(1, rows):
                    acc = acc + self.data.at(i, j)
                moments.append(acc)
        # batched keyswitch (n==2) + rotate-and-reduce over all columns
        rotations = list(zip(self.auto_ks, self.auto_key_switch))
        if n == 2:
            moments = scheme.keyswitch_sum_batch(moments, self.key_switch,
                                                 rotations)
        else:
            moments = scheme.sum_batch_only(moments, rotations)
        moments = [mj + self._noise() for mj in moments]
        return moments, denom

    def compute_covariance(self):
        """Statistics.h:86-128: returns (cov: Matrix, mu: list, n, n2)."""
        ksw = self.key_switch
        mu, n_ct = self.compute_nth_moment(1)

        d = self.data.num_cols()
        nb = self.data.num_rows()
        pairs = [(i, j) for i in range(d) for j in range(i, d)]

        # -mu_i*mu_j upper triangle: one batched mul + relin + negate
        mu_prods = scheme.mul_batch([(mu[i], mu[j]) for i, j in pairs])
        mu_vals = scheme.scalar_mul_batch(
            scheme.relin_batch(mu_prods, ksw), [-1] * len(pairs))
        mu_mat = Matrix([[None] * d for _ in range(d)])
        for (i, j), v in zip(pairs, mu_vals):
            mu_mat.set(i, j, v)
            mu_mat.set(j, i, v)

        # X^T X upper triangle block sums, batched (MultByTranspose,
        # Matrix.cpp:150-174)
        data_t = self.data.transpose()
        cov_pairs = [(data_t.at(i, b), data_t.at(j, b))
                     for i, j in pairs for b in range(nb)]
        cov_entries = scheme.combine_signed_batch(
            scheme.mul_batch(cov_pairs), [1] * len(cov_pairs), nb)
        # (keyswitch + rotate-reduce), then (*n, keyswitch) as one fused
        # batched mul+relin
        import jax.numpy as jnp
        from ..device import device_context
        rotations = list(zip(self.auto_ks, self.auto_key_switch))
        summed = scheme.keyswitch_sum_batch(cov_entries, ksw, rotations)
        dev = device_context(self.ctx)
        stack = jnp.stack([c.parts for c in summed])
        nrep = jnp.broadcast_to(n_ct.parts[None], stack.shape)
        prod = dev.batched_mul_relin_op(stack, nrep, ksw.matrix_evals)
        out = Matrix([[None] * d for _ in range(d)])
        for idx, (i, j) in enumerate(pairs):
            c = scheme.Ciphertext(self.ctx, parts=prod[idx])
            c = c + mu_mat.at(i, j)
            c = c + self._noise()
            out.set(i, j, c)
            out.set(j, i, c)

        n2 = ksw.apply(n_ct * n_ct)
        return out, mu, n_ct, n2


# ------------------------------------------------------------ plaintext oracles
def compute_nth_moment_pt(data: Matrix, n: int) -> list[int]:
    """Statistics.h:173-184."""
    return [sum(data.at(i, j) ** n for i in range(data.num_rows()))
            for j in range(data.num_cols())]


def compute_covariance_pt(data: Matrix) -> Matrix:
    """Statistics.h:191-208:  n * (X^T X) - mu mu^T  over exact ints."""
    cov = data.transpose().mult_by_transpose()
    n = data.num_rows()
    cov = Matrix([[cov.at(i, j) * n for j in range(cov.num_cols())]
                  for i in range(cov.num_rows())])
    mu = compute_nth_moment_pt(data, 1)
    mu_mat = Matrix([list(mu)]).transpose().mult_by_transpose()
    return cov - mu_mat


def derive_log_q(n_points: int, dim: int, p: int) -> tuple[int, int]:
    """Test_Statistics.cpp:194-217 parameter derivation: (logQ, xi)."""
    block_size = 1
    val = (p - 1) // 2
    while val > 1:
        block_size <<= 1
        val >>= 1
    n = (p - 1) // 2 - 1
    n_blocks = (n_points + block_size - 1) // block_size
    xi = max(n_blocks, dim)
    lg_q = 6.5 * np.log(n) + np.log(xi)
    return int(np.ceil(lg_q / np.log(2) + 36.1)), xi
