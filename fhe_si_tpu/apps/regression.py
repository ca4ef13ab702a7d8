"""Encrypted ordinary least squares (reference Regression.h:14-216).

Pipeline: batch data columns into plaintext slots, encrypt each cell,
compute X^T y and X^T X homomorphically, rotate-and-reduce slot sums,
adjugate-invert X^T X with a key-switch hook, and mask all slots but the
first with random noise.  theta_i = adj(X^T X) . (X^T y) and det are
returned encrypted; the caller divides by det after decryption (exactly
the reference's contract).
"""
from __future__ import annotations

import numpy as np

from .. import sampling, scheme
from ..context import FheContext
from .matrix import Matrix


def load_data(filename: str):
    """Reference LoadData (Regression.h:14-41): first line 'd n', then n
    lines of d features + 1 label."""
    try:
        with open(filename) as f:
            tokens = f.read().split()
    except OSError as e:
        raise SystemExit(f"Unable to read data file: {e}")
    dim, n = int(tokens[0]), int(tokens[1])
    vals = [int(t) for t in tokens[2:2 + n * (dim + 1)]]
    raw = Matrix()
    labels = []
    for i in range(n):
        row = vals[i * (dim + 1):(i + 1) * (dim + 1)]
        raw.add_row(row[:dim])
        labels.append(row[dim])
    return raw, labels, dim


def batch_data(ctx: FheContext, raw_data: Matrix, labels: list[int]):
    """Reference BatchData (Regression.h:43-66): usableSlots rows per batch,
    one plaintext per (batch, column), plus label plaintexts."""
    batch = ctx.usable_slots
    ptxt_data, ptxt_labels = [], []
    n, d = raw_data.num_rows(), raw_data.num_cols()
    for i in range(0, n, batch):
        hi = min(i + batch, n)
        row = [scheme.Plaintext.from_slots(
                   ctx, [raw_data.at(k, j) % ctx.p for k in range(i, hi)])
               for j in range(d)]
        ptxt_data.append(row)
        ptxt_labels.append(scheme.Plaintext.from_slots(
            ctx, [labels[k] % ctx.p for k in range(i, hi)]))
    return ptxt_data, ptxt_labels


class Regression:
    """Reference Regression class (Regression.h:68-191)."""

    def __init__(self, ctx: FheContext, source: sampling.RandomSource):
        self.ctx = ctx
        self.source = source
        self.secret_key, self.public_key = scheme.keygen(ctx, source)
        self.key_switch = scheme.KeySwitch.for_relinearization(
            self.secret_key, source)
        # automorphism keys for g^(2^i)  (Regression.h:70-81)
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
        self.labels: list[scheme.Ciphertext] = []

    def prewarm_async(self, dim: int, n_blocks: int) -> list:
        """Background compiles of this run's dominant pipeline shapes
        (scheme.prewarm_async; see Statistics.prewarm_async).  Covers the
        X^T y / X^T X product sweep, the keyswitch + rotate-reduce over
        d + d^2 entries, theta assembly, and the d+1 decryption batch;
        the inner cofactor levels of invert_batched have d-dependent
        batch sizes and stay on-demand."""
        import jax.numpy as jnp
        from ..device import device_context
        ctx, dev = self.ctx, device_context(self.ctx)
        d, nb = dim, n_blocks
        tri = d * (d + 1) // 2
        Pr = (d + tri) * nb
        phim, n_ct, L = ctx.phim, ctx.n_limbs_ct, ctx.num_primes

        def zp(B, k=2):
            return jnp.zeros((B, k, phim, n_ct), jnp.int32)

        def zt(B, k=3):
            return jnp.zeros((B, k, L, phim), jnp.int32)

        ksw_m = self.key_switch.matrix_evals
        pk, sk = self.public_key, self.secret_key
        zmsg = jnp.zeros((d + 1, phim), jnp.int32)
        zerr = jnp.zeros((d + 1, 2, phim), jnp.int32)
        thunks = [
            lambda: dev.batched_encrypt_op(pk.pk_evals, zmsg, zmsg, zerr),
            lambda: dev.batched_tensor_mul_op(zp(Pr), zp(Pr)),
            lambda: dev.signed_group_sum_tensored_op(
                zt(Pr).reshape(d + tri, nb, 3, L, phim),
                jnp.ones((d + tri, nb, 1, L, 1), jnp.int32)),
            lambda: dev.batched_keyswitch_tensored_op(zt(d + d * d), ksw_m),
            lambda: dev.batched_tensor_mul_op(zp(d * d), zp(d * d)),
            lambda: dev.batched_keyswitch_tensored_op(zt(d), ksw_m),
            lambda: dev.encrypt_op(pk.pk_evals, zmsg[0], zmsg[0], zerr[0]),
            lambda: dev.add_op(zp(1)[0], zp(1)[0]),
            lambda: dev.batched_decrypt_op(zp(d + 1), sk.sk_evals[:2]),
        ]
        if self.auto_key_switch:
            perm = jnp.asarray(ctx.automorph_perm(self.auto_ks[0]),
                               dtype=jnp.int32)
            aksw = self.auto_key_switch[0]
            thunks.append(lambda: dev.batched_rotate_reduce_stage_op(
                zp(d + d * d), perm, aksw.matrix_evals))
        return scheme.prewarm_async(thunks)

    def add_data(self, ptxt_data, ptxt_labels):
        """Encrypt every batched cell + labels (Regression.h:83-95), fused
        into one batched device dispatch per block row."""
        for row, label in zip(ptxt_data, ptxt_labels):
            cts = self.public_key.encrypt_batch(list(row) + [label], self.source)
            self.data.add_row(cts[:-1])
            self.labels.append(cts[-1])

    def clear(self):
        self.data = Matrix()
        self.labels = []

    def _noise(self) -> scheme.Ciphertext:
        """Random values in every slot but slot 0 (Regression.h:180-190)."""
        vals = self.source.uniform_mod_p(self.ctx.total_slots, self.ctx.p)
        vals[0] = 0
        pt = scheme.Plaintext.from_slots(self.ctx, vals, only_usable=False)
        return self.public_key.encrypt(pt, self.source)

    def regress(self):
        """Regression.h:102-149. Returns (theta: list[Ciphertext], det)."""
        ksw = self.key_switch

        data_t = self.data.transpose()
        d, nb = data_t.num_rows(), data_t.num_cols()
        # X^T y and X^T X (upper triangle) as ONE batched product dispatch
        # (same block-product sums as Matrix.mul_vector/MultByTranspose,
        # Matrix.cpp:81-97, 150-174)
        tri = [(i, j) for i in range(d) for j in range(i, d)]
        pairs = ([(data_t.at(i, b), self.labels[b])
                  for i in range(d) for b in range(nb)]
                 + [(data_t.at(i, b), data_t.at(j, b))
                    for i, j in tri for b in range(nb)])
        sums = scheme.combine_signed_batch(
            scheme.mul_batch(pairs), [1] * len(pairs), nb)
        last = Matrix([[sums[i]] for i in range(d)])
        xtx = Matrix([[None] * d for _ in range(d)])
        for (i, j), ct in zip(tri, sums[d:]):
            xtx.set(i, j, ct)
            xtx.set(j, i, ct)
        # MapAll{keyswitch; SumBatchedData} fused into batched dispatches
        # (bit-identical to per-entry processing)
        entries = ([last.at(i, 0) for i in range(d)]
                   + [xtx.at(i, j) for i in range(d) for j in range(d)])
        rotations = list(zip(self.auto_ks, self.auto_key_switch))
        processed = scheme.keyswitch_sum_batch(entries, ksw, rotations)
        last = Matrix([[processed[i]] for i in range(d)])
        xtx = Matrix([[processed[d + i * d + j] for j in range(d)]
                      for i in range(d)])

        if self.data.num_cols() == 1:
            return [last.at(0, 0)], xtx.at(0, 0)

        # adjugate Invert + theta = adj(X^T X) * X^T y with every cofactor
        # level as one batched dispatch (plaintext-equivalent to the
        # reference's element-at-a-time recursion, Matrix.cpp:182-263)
        reduce_many = lambda cts: scheme.relin_batch(cts, ksw)  # noqa: E731
        inv, det = xtx.invert_batched(
            scheme.mul_batch, scheme.combine_signed_batch, reduce_many,
            scheme.scalar_mul_batch)
        pairs = [(inv.at(i, k), last.at(k, 0))
                 for i in range(d) for k in range(d)]
        sums = scheme.combine_signed_batch(scheme.mul_batch(pairs),
                                           [1] * (d * d), d)
        theta_cts = reduce_many(sums)

        theta = [theta_cts[i] + self._noise() for i in range(d)]
        det = det + self._noise()
        return theta, det


def regress_pt(raw_data: Matrix, labels: list[int]):
    """Plaintext oracle RegressPT (Regression.h:193-214): exact integers."""
    a = raw_data.transpose()
    tmp = a.mul_vector(labels)
    ata = a.mult_by_transpose()
    if raw_data.num_cols() == 1:
        return [tmp.at(0, 0)], ata.at(0, 0)
    inv, det = ata.invert()
    theta_m = inv @ tmp
    return [theta_m.at(i, 0) for i in range(theta_m.num_rows())], det


def derive_log_q(n_points: int, dim: int, p: int) -> tuple[int, int]:
    """Test_Regression.cpp:85-108 parameter derivation: returns (logQ, xi)."""
    block_size = 1
    val = (p - 1) // 2 - 1
    while val > 1:
        block_size <<= 1
        val >>= 1
    n = (p - 1) // 2 - 1
    n_blocks = (n_points + block_size - 1) // block_size
    xi = max(n_blocks, dim)
    lg_q = (4.5 * np.log(n)
            + max(1, dim - 1) * (np.log(1280.0) + 2 * np.log(n) + np.log(xi)))
    return int(np.ceil(lg_q / np.log(2) + 24.7)), xi
