"""DeviceContext: jit-compiled device programs for one FheContext.

Holds every host-precomputed table as a device array and exposes the
scheme's compute pipelines as cached jit closures.  One DeviceContext is
created lazily per FheContext (FheContext.device()); all scheme-level
code (scheme.py) goes through these entry points, so the whole library
has a single compilation surface.

Pipeline map to the reference (file:line into /root/reference):
  from_poly   = Cmodulus::FFT per prime        CModulus.cpp:89-107
  to_poly     = iFFT + intVecCRT big-int CRT   CModulus.cpp:109-132,
                                               DoubleCRT.cpp:349-398
  encrypt     = FHESIPubKey::Encrypt           FHE-SI.cpp:10-36
  decrypt     = FHESISecKey::Decrypt           FHE-SI.cpp:93-119
  tensor_mul  = Ciphertext::operator*=         Ciphertext.cpp:167-192
  scale_down  = Ciphertext::ScaleDown          Ciphertext.cpp:194-218
  keyswitch   = KeySwitchSI::ApplyKeySwitch    FHE-SI.cpp:241-260
  automorph   = DoubleCRT::automorph           DoubleCRT.cpp:439-465
"""
from __future__ import annotations

from functools import cached_property, partial

import jax
import jax.numpy as jnp
import numpy as np

from .context import FheContext, int_to_limbs
from .ops import crt, limbs as lb, modular, ntt


class DeviceContext:
    def __init__(self, ctx: FheContext):
        self.ctx = ctx
        self.phim = ctx.phim
        self.L = ctx.num_primes
        self.n = ctx.n_limbs
        self.log_q = ctx.log_q
        self.digit_bits = ctx.digit_bits
        self.ndigits = ctx.ndigits

        self.q = jnp.asarray(ctx.primes[:, None], dtype=jnp.int32)         # [L, 1]
        self.qinv_f = (1.0 / ctx.primes[:, None]).astype(np.float32)
        self.qinv_f = jnp.asarray(self.qinv_f)
        self.p_mod_q = jnp.asarray((ctx.p % ctx.primes)[:, None], dtype=jnp.int32)
        self.p = jnp.int32(ctx.p)
        self.pinv_f = jnp.float32(1.0 / ctx.p)

        fwd, inv = ctx.ntt_tables
        self.fwd_chunks = jnp.asarray(ntt.chunk_matrix(fwd))
        self.inv_chunks = jnp.asarray(ntt.chunk_matrix(inv))

        gt = ctx.garner_tables
        self.garner = dict(
            invq=jnp.asarray(gt['invq'], dtype=jnp.int32),
            W=jnp.asarray(gt['W'], dtype=jnp.int32),
            Wh=jnp.asarray(gt['Wh'], dtype=jnp.int32),
            P_limbs=jnp.asarray(gt['P_limbs'], dtype=jnp.int32),
            halfP_digits=jnp.asarray(gt['halfP_digits'], dtype=jnp.int32),
        )
        rt = ctx.residue_tables
        self.chunk_tbl = jnp.asarray(rt['chunk_tbl'], dtype=jnp.int32)
        self.wrap = jnp.asarray(rt['wrap'][:, None], dtype=jnp.int32)
        self.p_chunk_tbl = jnp.asarray(rt['p_chunk_tbl'], dtype=jnp.int32)
        self.p_wrap = jnp.int32(rt['p_wrap'])

        self.q_limbs = jnp.asarray(int_to_limbs(ctx.q, ctx.n_limbs))
        self.q_over_p = jnp.asarray(ctx.q_over_p_limbs)
        self.q_over_p_sh10 = jnp.asarray(int_to_limbs((ctx.q // ctx.p) << 10, ctx.n_limbs))

    # ----------------------------------------------------------- primitives
    # NTT backend: 'einsum' (XLA dots, always available) or 'pallas'
    # (fused VMEM kernel, large-phim TPU path).  Selected per-context via
    # use_pallas_ntt; FHE_SI_TPU_PALLAS_NTT=1 opts in globally.
    @cached_property
    def use_pallas_ntt(self) -> bool:
        import os
        return (os.environ.get("FHE_SI_TPU_PALLAS_NTT") == "1"
                and self.phim >= 256)

    def ntt_fwd(self, x):
        """coefficient residues [..., L, phim] -> evaluations."""
        if self.use_pallas_ntt:
            from .ops import pallas_ntt
            return pallas_ntt.modmatmul_pallas(self.fwd_chunks, x,
                                               self.q, self.qinv_f)
        return ntt.modmatmul(self.fwd_chunks, x, self.q, self.qinv_f)

    def ntt_inv(self, x):
        if self.use_pallas_ntt:
            from .ops import pallas_ntt
            return pallas_ntt.modmatmul_pallas(self.inv_chunks, x,
                                               self.q, self.qinv_f)
        return ntt.modmatmul(self.inv_chunks, x, self.q, self.qinv_f)

    def from_poly(self, poly_limbs):
        """[..., phim, n] limbs -> evaluations [..., L, phim]."""
        res = crt.limbs_to_residues(poly_limbs, self.chunk_tbl, self.wrap,
                                    self.q, self.qinv_f)
        return self.ntt_fwd(res)

    def to_poly(self, evals):
        """evaluations [..., L, phim] -> centered limbs [..., phim, n]."""
        res = self.ntt_inv(evals)
        return crt.residues_to_limbs(res, self.garner, self.q, self.qinv_f, self.n)

    def small_to_evals(self, coeffs):
        """Small signed int32 coefficients [..., phim] -> evaluations."""
        res = coeffs[..., None, :] % self.q  # sign of divisor: nonnegative
        return self.ntt_fwd(res)

    def reduce_signed(self, limbs_arr):
        return lb.reduce_mod_q(limbs_arr, self.log_q, False, self.q_limbs)

    # ------------------------------------------------------------ scheme ops
    @cached_property
    def encrypt_op(self):
        @jax.jit
        def run(pk_evals, msg, r, errors):
            """pk_evals [2, L, phim]; msg [phim] in [0,p); r [phim] {0,1};
            errors [2, phim] Gaussian ints.  -> parts limbs [2, phim, n]."""
            r_evals = self.small_to_evals(r)
            e_evals = self.small_to_evals(errors)              # [2, L, phim]
            e_evals = modular.mod_mul(e_evals, self.p_mod_q, self.q, self.qinv_f)
            ct_evals = modular.mod_add(
                modular.mod_mul(pk_evals, r_evals[None], self.q, self.qinv_f),
                e_evals, self.q)
            parts = self.to_poly(ct_evals)                     # [2, phim, n]
            scaled_msg = lb.scale_coeffs_by_bigint(msg, self.q_over_p,
                                                   self.q_over_p_sh10)
            parts = parts.at[0].set(lb.add(parts[0], scaled_msg))
            return self.reduce_signed(parts)
        return run

    @cached_property
    def decrypt_op(self):
        @jax.jit
        def run(parts_limbs, sk_evals):
            """parts [k, phim, n]; sk_evals [k, L, phim] -> msg [phim] mod p."""
            part_evals = self.from_poly(parts_limbs)
            prod = modular.mod_mul(part_evals, sk_evals, self.q, self.qinv_f)
            acc = prod[0]
            for i in range(1, prod.shape[0]):
                acc = modular.mod_add(acc, prod[i], self.q)
            d = self.to_poly(acc)
            y = lb.mul_small(d, 2 * self.p)
            y = lb.add(y, jnp.broadcast_to(self.q_limbs, y.shape))
            y = lb.arith_shift_right(y, self.log_q + 1)
            return crt.limbs_to_mod_small(y, self.p_chunk_tbl, self.p_wrap,
                                          self.p, self.pinv_f)
        return run

    @cached_property
    def add_op(self):
        @jax.jit
        def run(a, b):  # same-part-count limb adds, reduced signed
            return self.reduce_signed(lb.add(a, b))
        return run

    @cached_property
    def add_tensored_op(self):
        @jax.jit
        def run(a, b):
            return modular.mod_add(a, b, self.q)
        return run

    @cached_property
    def tensor_mul_op(self):
        @jax.jit
        def run(a_parts, b_parts):
            """[na, phim, n] x [nb, phim, n] -> tensored evals [na+nb-1, L, phim].
            Left side scaled by p first (Ciphertext.cpp:171)."""
            a_ev = modular.mod_mul(self.from_poly(a_parts), self.p_mod_q,
                                   self.q, self.qinv_f)
            b_ev = self.from_poly(b_parts)
            na, nb = a_ev.shape[0], b_ev.shape[0]
            out = [None] * (na + nb - 1)
            for i in range(na):
                for j in range(nb):
                    prod = modular.mod_mul(a_ev[i], b_ev[j], self.q, self.qinv_f)
                    k = i + j
                    out[k] = prod if out[k] is None else modular.mod_add(
                        out[k], prod, self.q)
            return jnp.stack(out)
        return run

    @cached_property
    def scale_down_op(self):
        @jax.jit
        def run(tprod_evals):
            """[k, L, phim] -> parts limbs [k, phim, n]:
            floor((2x+q)/2q) then signed reduce (Ciphertext.cpp:194-218)."""
            x = self.to_poly(tprod_evals)
            y = lb.shift_left(x, 1)
            y = lb.add(y, jnp.broadcast_to(self.q_limbs, y.shape))
            y = lb.arith_shift_right(y, self.log_q + 1)
            return self.reduce_signed(y)
        return run

    @cached_property
    def byte_decomp_op(self):
        @jax.jit
        def run(parts_limbs):
            """[k, phim, n] -> digit evaluations [k*ndigits, L, phim]."""
            digs = lb.byte_decomp(parts_limbs, self.log_q, self.digit_bits,
                                  self.ndigits, self.q_limbs)  # [k, phim, nd]
            digs = jnp.moveaxis(digs, -1, 1)                   # [k, nd, phim]
            digs = digs.reshape(-1, self.phim)                 # [k*nd, phim]
            res = modular.barrett(digs[:, None, :], self.q, self.qinv_f)
            return self.ntt_fwd(res)
        return run

    @cached_property
    def keyswitch_apply_op(self):
        @jax.jit
        def run(matrix_evals, digit_evals):
            """matrix [2, K, L, phim] x digits [K, L, phim] -> parts [2, phim, n].
            Two DotProducts + toPoly + signed reduce (FHE-SI.cpp:241-260)."""
            prod = modular.mod_mul(matrix_evals, digit_evals[None],
                                   self.q, self.qinv_f)       # [2, K, L, phim]
            K = prod.shape[1]
            acc = prod[:, 0]
            for k in range(1, K):
                acc = modular.mod_add(acc, prod[:, k], self.q)
            return self.reduce_signed(self.to_poly(acc))
        return run

    def automorph_op(self, k: int):
        perm = jnp.asarray(self.ctx.automorph_perm(k), dtype=jnp.int32)

        @jax.jit
        def run_parts(parts_limbs):
            ev = self.from_poly(parts_limbs)
            ev = jnp.take(ev, perm, axis=-1)
            return self.to_poly(ev)  # exact, NOT reduced (Ciphertext.cpp:54-59)

        return run_parts

    def automorph_tensored_op(self, k: int):
        perm = jnp.asarray(self.ctx.automorph_perm(k), dtype=jnp.int32)

        @jax.jit
        def run(evals):
            return jnp.take(evals, perm, axis=-1)

        return run

    @cached_property
    def mul_scalar_op(self):
        @jax.jit
        def run(parts_limbs, scalar_abs, negate):
            """parts * l with l = (-1)^negate * scalar_abs, scalar_abs < 2^20."""
            prod = lb.mul_small(parts_limbs, scalar_abs)
            prod = jnp.where(negate, lb.neg(prod), prod)
            return self.reduce_signed(prod)
        return run

    @cached_property
    def mul_scalar_tensored_op(self):
        @jax.jit
        def run(evals, scalar_mod_q):
            return modular.mod_mul(evals, scalar_mod_q, self.q, self.qinv_f)
        return run

    @cached_property
    def mul_const_op(self):
        @jax.jit
        def run(parts_limbs, const_evals):
            """part *= const poly (Ciphertext.cpp:246-258, non-tensored):
            exact product mod Phi_m then signed reduce."""
            ev = self.from_poly(parts_limbs)
            ev = modular.mod_mul(ev, const_evals[None], self.q, self.qinv_f)
            return self.reduce_signed(self.to_poly(ev))
        return run

    @cached_property
    def mul_const_tensored_op(self):
        @jax.jit
        def run(evals, const_evals):
            return modular.mod_mul(evals, const_evals[None], self.q, self.qinv_f)
        return run

    @cached_property
    def add_const_op(self):
        @jax.jit
        def run(part0_limbs, scaled_const_limbs):
            """part0 += floor(c*2^logQ/p), signed reduce (Ciphertext.cpp:147-161)."""
            return self.reduce_signed(lb.add(part0_limbs, scaled_const_limbs))
        return run

    @cached_property
    def add_const_tensored_op(self):
        @jax.jit
        def run(tprod0_evals, scaled_const_limbs):
            """tProd[0] += DoubleCRT(scaled const)  (Ciphertext.cpp:157-158)."""
            return modular.mod_add(tprod0_evals, self.from_poly(scaled_const_limbs),
                                   self.q)
        return run


    # ------------------------------------------------------------- key setup
    @cached_property
    def keygen_op(self):
        @jax.jit
        def run(s, c0, c1_limbs):
            """FHESISecKey::Init + FHESIPubKey::Init (FHE-SI.cpp:86-91, 42-62).

            s [phim] ternary; c0 [phim] Gaussian; c1_limbs [phim, n] uniform
            signed mod q.  Returns (sk_evals [2,L,phim], pk_evals [2,L,phim],
            pk_limbs [2,phim,n])."""
            s_evals = self.small_to_evals(s)
            ones = jnp.ones((self.L, self.phim), dtype=jnp.int32)
            c1_evals = self.from_poly(c1_limbs)
            pk0_pre = modular.mod_add(
                modular.mod_mul(s_evals, c1_evals, self.q, self.qinv_f),
                self.small_to_evals(c0), self.q)
            pk0_limbs = self.reduce_signed(self.to_poly(pk0_pre))
            pk1_limbs = self.reduce_signed(lb.neg(c1_limbs))
            pk_limbs = jnp.stack([pk0_limbs, pk1_limbs])
            return jnp.stack([ones, s_evals]), self.from_poly(pk_limbs), pk_limbs
        return run

    @cached_property
    def keyswitch_init_op(self):
        @jax.jit
        def run(src_sk_evals, dst_t_evals, A_limbs, e):
            """KeySwitchSI::Init (FHE-SI.cpp:153-209), all digits batched.

            src_sk_evals [ns, L, phim]; dst_t_evals [L, phim];
            A_limbs [ns*ndigits, phim, n]; e [ns*ndigits, phim].
            Returns matrix evals [2, ns*ndigits, L, phim]."""
            s_limbs = self.to_poly(src_sk_evals)          # [ns, phim, n]
            shifted = []
            for i in range(src_sk_evals.shape[0]):
                for j in range(self.ndigits):
                    shifted.append(lb.shift_left(s_limbs[i], self.digit_bits * j))
            s_shift = jnp.stack(shifted)                  # [K, phim, n]
            b_ev = modular.mod_mul(self.from_poly(A_limbs), dst_t_evals[None],
                                   self.q, self.qinv_f)
            b_limbs = self.to_poly(b_ev)
            b_limbs = lb.add(lb.add(b_limbs, lb.from_small_signed(e, self.n)),
                             s_shift)
            row_b = self.reduce_signed(b_limbs)
            row_a = self.reduce_signed(lb.neg(A_limbs))
            matrix_limbs = jnp.stack([row_b, row_a])      # [2, K, phim, n]
            return self.from_poly(matrix_limbs)
        return run

    @cached_property
    def square_evals_op(self):
        @jax.jit
        def run(evals):
            return modular.mod_mul(evals, evals, self.q, self.qinv_f)
        return run

    # ------------------------------------------------------- batched pipelines
    def _mul_relin_one(self, a_parts, b_parts, matrix_evals):
        """Full benchmark op for ONE ciphertext pair: tensor multiply,
        scale down, byte-decompose, key switch (the reference's
        Ciphertext::operator*= + ApplyKeySwitch path)."""
        a_ev = modular.mod_mul(self.from_poly(a_parts), self.p_mod_q,
                               self.q, self.qinv_f)
        b_ev = self.from_poly(b_parts)
        na, nb = a_ev.shape[0], b_ev.shape[0]
        tprod = [None] * (na + nb - 1)
        for i in range(na):
            for j in range(nb):
                pr = modular.mod_mul(a_ev[i], b_ev[j], self.q, self.qinv_f)
                k = i + j
                tprod[k] = pr if tprod[k] is None else modular.mod_add(
                    tprod[k], pr, self.q)
        tprod = jnp.stack(tprod)
        # ScaleDown
        x = self.to_poly(tprod)
        y = lb.shift_left(x, 1)
        y = lb.add(y, jnp.broadcast_to(self.q_limbs, y.shape))
        y = lb.arith_shift_right(y, self.log_q + 1)
        parts = self.reduce_signed(y)
        # ByteDecomp + key switch
        digs = lb.byte_decomp(parts, self.log_q, self.digit_bits,
                              self.ndigits, self.q_limbs)
        digs = jnp.moveaxis(digs, -1, 1).reshape(-1, self.phim)
        dig_ev = self.ntt_fwd(modular.barrett(digs[:, None, :], self.q,
                                              self.qinv_f))
        prod = modular.mod_mul(matrix_evals, dig_ev[None], self.q, self.qinv_f)
        acc = prod[:, 0]
        for k in range(1, prod.shape[1]):
            acc = modular.mod_add(acc, prod[:, k], self.q)
        return self.reduce_signed(self.to_poly(acc))

    @cached_property
    def batched_encrypt_op(self):
        """vmapped encrypt: (pk [2,L,phim], msgs [B,phim], r [B,phim],
        errors [B,2,phim]) -> parts [B,2,phim,n]."""
        def one(pk_evals, msg, r, errors):
            r_evals = self.small_to_evals(r)
            e_evals = modular.mod_mul(self.small_to_evals(errors), self.p_mod_q,
                                      self.q, self.qinv_f)
            ct_evals = modular.mod_add(
                modular.mod_mul(pk_evals, r_evals[None], self.q, self.qinv_f),
                e_evals, self.q)
            parts = self.to_poly(ct_evals)
            scaled = lb.scale_coeffs_by_bigint(msg, self.q_over_p,
                                               self.q_over_p_sh10)
            parts = parts.at[0].set(lb.add(parts[0], scaled))
            return self.reduce_signed(parts)
        return jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))

    @cached_property
    def batched_decrypt_op(self):
        """vmapped decrypt: (parts [B,k,phim,n], sk [k,L,phim]) -> [B,phim]."""
        def one(parts_limbs, sk_evals):
            part_evals = self.from_poly(parts_limbs)
            prod = modular.mod_mul(part_evals, sk_evals, self.q, self.qinv_f)
            acc = prod[0]
            for i in range(1, prod.shape[0]):
                acc = modular.mod_add(acc, prod[i], self.q)
            d = self.to_poly(acc)
            y = lb.mul_small(d, 2 * self.p)
            y = lb.add(y, jnp.broadcast_to(self.q_limbs, y.shape))
            y = lb.arith_shift_right(y, self.log_q + 1)
            return crt.limbs_to_mod_small(y, self.p_chunk_tbl, self.p_wrap,
                                          self.p, self.pinv_f)
        return jax.jit(jax.vmap(one, in_axes=(0, None)))

    @cached_property
    def batched_mul_relin_op(self):
        """vmapped mul+relinearize over a leading batch axis:
        ([B, ka, phim, n], [B, kb, phim, n], [2, K, L, phim]) -> [B, 2, phim, n]."""
        return jax.jit(jax.vmap(self._mul_relin_one, in_axes=(0, 0, None)))

    def _keyswitch_parts_one(self, parts, matrix_evals):
        """ApplyKeySwitch on non-tensored parts (ByteDecomp + dot)."""
        digs = lb.byte_decomp(parts, self.log_q, self.digit_bits,
                              self.ndigits, self.q_limbs)
        digs = jnp.moveaxis(digs, -1, 1).reshape(-1, self.phim)
        dig_ev = self.ntt_fwd(modular.barrett(digs[:, None, :], self.q,
                                              self.qinv_f))
        prod = modular.mod_mul(matrix_evals, dig_ev[None], self.q, self.qinv_f)
        acc = prod[:, 0]
        for k in range(1, prod.shape[1]):
            acc = modular.mod_add(acc, prod[:, k], self.q)
        return self.reduce_signed(self.to_poly(acc))

    @cached_property
    def batched_keyswitch_tensored_op(self):
        """ScaleDown + ApplyKeySwitch over a batch of tensored ciphertexts:
        ([B, k, L, phim], [2, K, L, phim]) -> [B, 2, phim, n]."""
        def one(tprod, matrix):
            x = self.to_poly(tprod)
            y = lb.shift_left(x, 1)
            y = lb.add(y, jnp.broadcast_to(self.q_limbs, y.shape))
            y = lb.arith_shift_right(y, self.log_q + 1)
            parts = self.reduce_signed(y)
            return self._keyswitch_parts_one(parts, matrix)
        return jax.jit(jax.vmap(one, in_axes=(0, None)))

    @cached_property
    def batched_rotate_reduce_stage_op(self):
        """One rotate-and-reduce stage (Regression.h:166-178) over a batch:
        parts [B, 2, phim, n], automorph perm [phim], that rotation's
        key-switch matrix -> parts + keyswitch(automorph(parts))."""
        def one(parts, perm, matrix):
            ev = self.from_poly(parts)
            ev = jnp.take(ev, perm, axis=-1)
            rotated = self.to_poly(ev)        # exact, unreduced (Ciphertext.cpp:54-59)
            switched = self._keyswitch_parts_one(rotated, matrix)
            return self.reduce_signed(lb.add(parts, switched))
        return jax.jit(jax.vmap(one, in_axes=(0, None, None)))


_DEVICE_CACHE: dict[int, DeviceContext] = {}


def device_context(ctx: FheContext) -> DeviceContext:
    dev = _DEVICE_CACHE.get(id(ctx))
    if dev is None:
        dev = DeviceContext(ctx)
        _DEVICE_CACHE[id(ctx)] = dev
    return dev
