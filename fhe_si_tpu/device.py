"""DeviceContext: jit-compiled device programs for one FheContext.

Holds every host-precomputed table as a device array and exposes the
scheme's compute pipelines as cached jit closures.  One DeviceContext is
created lazily per FheContext (device_context(ctx)); all scheme-level
code (scheme.py) goes through these entry points, so the whole library
has a single compilation surface.

The tables are threaded through jit as an explicit pytree argument
(self.C) rather than closed over: closed-over arrays lower to literal
constants inside the HLO module, and at phim ~ 2000 the NTT chunk tables
alone are hundreds of MB — oversized compile payloads (the axon remote
compiler rejects them) and duplicated storage.  As arguments they stay
device-resident parameters; jit caches on shapes only.

Pipeline map to the reference (file:line into /root/reference):
  from_poly   = Cmodulus::FFT per prime        CModulus.cpp:89-107
  to_poly     = iFFT + intVecCRT big-int CRT   CModulus.cpp:109-132,
                                               DoubleCRT.cpp:349-398
                (single-pass redundant-modulus reconstruction; the
                reference's serial incremental CRT has the same value)
  encrypt     = FHESIPubKey::Encrypt           FHE-SI.cpp:10-36
  decrypt     = FHESISecKey::Decrypt           FHE-SI.cpp:93-119
  tensor_mul  = Ciphertext::operator*=         Ciphertext.cpp:167-192
  scale_down  = Ciphertext::ScaleDown          Ciphertext.cpp:194-218
  keyswitch   = KeySwitchSI::ApplyKeySwitch    FHE-SI.cpp:241-260
  automorph   = DoubleCRT::automorph           DoubleCRT.cpp:439-465
"""
from __future__ import annotations

from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from .context import FheContext, int_to_limbs
from .ops import crt, limbs as lb, modular, ntt, ntt_ct
from .ops import ntt_ct_pallas


def _enable_persistent_compile_cache():
    """Persistent XLA compile cache for every entry point (the CLIs used
    to pay full fresh compiles each process — ~60 s at phim~2000).
    Opt out / redirect with FHE_SI_TPU_JAX_CACHE ('' disables)."""
    import os
    path = os.environ.get("FHE_SI_TPU_JAX_CACHE", "/tmp/fhe_si_tpu_jax_cache")
    if not path:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_persistent_compile_cache()


class DeviceContext:
    def __init__(self, ctx: FheContext):
        self.ctx = ctx
        self.phim = ctx.phim
        self.L = ctx.num_primes
        self.n = ctx.n_limbs
        self.n_ct = ctx.n_limbs_ct      # persistent ciphertext-part width
        self.log_q = ctx.log_q
        self.digit_bits = ctx.digit_bits
        self.ndigits = ctx.ndigits
        # Residue lane (trace-time constant): wide = 23-bit primes with
        # 4x6-bit digit machinery (ops/ntt.py, ops/modular.py)
        self.wide = ctx.wide
        # Transform family (trace-time constant): power-of-two m rides
        # the two-level Cooley-Tukey tables (O(L*m) memory) instead of
        # dense O(L*phim^2) DFT matrices — the only family that scales
        # past phim ~ 4k (ops/ntt_ct.py)
        self.use_ct = ctx.use_ct
        self.ct_pallas = False      # set after the CT tables are built

        gt = ctx.garner_tables
        ft = ctx.fast_crt_tables
        rt = ctx.residue_tables
        as32 = lambda a: jnp.asarray(a, dtype=jnp.int32)  # noqa: E731

        def fast_crt_dev(t):
            return dict(
                binv=as32(t['binv']), Bmodr=as32(t['Bmodr']),
                B=as32(t['B']), Bh=as32(t['Bh']),
                B_chunks=jnp.asarray(t['B_chunks']),   # int8 digit planes
                er_mask=as32(t['er_mask']),
                P_limbs=as32(t['P_limbs']),
                P_limbs_sh10=as32(t['P_limbs_sh10']),
                mr=jnp.int32(t['mr']),
                mrinv_f=jnp.float32(1.0 / t['mr']),
                Pinv_r=jnp.int32(t['Pinv_r']))

        # Subset bases (context.ksw_value_primes / lin_value_primes):
        # pipelines whose exact-integer bound is smaller than the tensor
        # product's run their NTTs and reconstruction over only the rows
        # whose product covers that bound.  Exactness is basis-independent,
        # so results stay bit-identical to the full chain
        # (tests/test_ops.py::test_ksw_subset_basis_equals_full and the
        # oracle-parity suites).  Costs extra chunk-table HBM
        # (~rows/L of the full tables per subset).
        # full chunk tables are uploaded ONCE; subset tables are gathered
        # ON DEVICE (jnp.take) — no extra host chunking or tunnel transfer
        if ctx.use_ct:
            ctt = ntt_ct.CtNttTables(ctx.m, ctx.primes, ctx.roots,
                                     wide=ctx.wide)
            self.ct_split = (ctt.N1, ctt.N2)
            self.ct_meta = ctt.meta
            ct_full = ctt.pack()
            fwd_chunks_dev = inv_chunks_dev = None
            # Fused Pallas CT kernels (ops/ntt_ct_pallas.py): the
            # two-stage factorization is bandwidth-bound under XLA (6
            # Karatsuba group tensors per stage hit HBM); the fused
            # kernel keeps them in VMEM.  TPU-only (the CPU test suite
            # rides the XLA path, which is bit-identical —
            # tests/test_ntt_ct_pallas.py); opt out with
            # FHE_SI_TPU_NO_PALLAS=1.
            import os
            self.ct_pallas = (
                os.environ.get("FHE_SI_TPU_NO_PALLAS", "0") != "1"
                and ntt_ct_pallas.supported(ctt.meta, ctx.wide)
                and jax.devices()[0].platform not in ("cpu",))
        else:
            fwd, inv = ctx.ntt_tables
            fwd_chunks_dev = jnp.asarray(ntt.chunk_matrix(fwd, ctx.wide))
            inv_chunks_dev = jnp.asarray(ntt.chunk_matrix(inv, ctx.wide))
            ct_full = None

        def binv_scale(fast_crt_np):
            """Per-row CRT premultiplier: binv on value rows, 1 on the
            redundant row so crt_partials' er stays raw."""
            binv = np.asarray(fast_crt_np['binv'], dtype=np.int64)
            return np.where(binv == 0, 1, binv)

        def prescale_inv(planes, fast_crt_np, q_np):
            """Dense iNTT planes with binv folded in — re-chunked on
            device, so no extra host work or tunnel upload."""
            return ntt.prescale_planes(
                planes,
                as32(binv_scale(fast_crt_np)[:, None, None]),
                as32(q_np[:, None, None]),
                jnp.asarray((1.0 / q_np[:, None, None]).astype(np.float32)))

        def ct_with_crt(pack, fast_crt_np, q_np):
            """CT pack + 't2i_crt': the basis binv folded into the
            inverse inner-DFT planes (the last per-prime matmul of
            ct_inv) — the CT analog of prescale_inv.  The raw 't2i'
            stays for the public ntt_inv / SingleCrt conversions."""
            q_dev = as32(q_np[:, None, None])
            qi = jnp.asarray((1.0 / q_np[:, None, None]).astype(np.float32))
            pack = dict(pack)
            pack['t2i_crt'] = ntt.prescale_planes(
                pack['t2i'], as32(binv_scale(fast_crt_np)[:, None, None]),
                q_dev, qi)
            return pack

        def ct_subset_pack(rows_dev):
            """Row-gather of the full CT pack onto a subset basis."""
            return dict(
                q=jnp.take(ct_full['q'], rows_dev, axis=0),
                qinv_f=jnp.take(ct_full['qinv_f'], rows_dev, axis=0),
                t1=jnp.take(ct_full['t1'], rows_dev, axis=1),
                t2=jnp.take(ct_full['t2'], rows_dev, axis=1),
                t1i=jnp.take(ct_full['t1i'], rows_dev, axis=1),
                t2i=jnp.take(ct_full['t2i'], rows_dev, axis=1),
                tw=jnp.take(ct_full['tw'], rows_dev, axis=1),
                twi=jnp.take(ct_full['twi'], rows_dev, axis=1))

        def subset_tables(rows, fast_crt_np):
            if len(rows) >= ctx.num_primes:
                return None
            rows_dev = jnp.asarray(rows, dtype=jnp.int32)
            q_np = ctx.primes[rows]
            t = dict(
                rows=rows_dev,
                q=as32(q_np[:, None]),
                qinv_f=jnp.asarray(
                    (1.0 / q_np[:, None]).astype(np.float32)),
                chunk_tbl=as32(rt['chunk_tbl'][:, rows]),
                fast_crt=fast_crt_dev(fast_crt_np))
            if ctx.use_ct:
                t['ct'] = ct_with_crt(ct_subset_pack(rows_dev),
                                      fast_crt_np, q_np)
            else:
                t['fwd_chunks'] = jnp.take(fwd_chunks_dev, rows_dev, axis=1)
                # subset iNTTs always feed the subset CRT reconstruction:
                # store them with the subset-basis binv folded in
                t['inv_chunks'] = prescale_inv(
                    jnp.take(inv_chunks_dev, rows_dev, axis=1),
                    fast_crt_np, q_np)
            return t

        ksw_tables = subset_tables(ctx.ksw_rows, ctx.ksw_fast_crt_tables)
        lin_tables = (ksw_tables if np.array_equal(ctx.lin_rows, ctx.ksw_rows)
                      else subset_tables(ctx.lin_rows, ctx.lin_fast_crt_tables))
        self.ksw_subset = ksw_tables is not None
        self.C = dict(
            q=as32(ctx.primes[:, None]),
            qinv_f=jnp.asarray((1.0 / ctx.primes[:, None]).astype(np.float32)),
            p_mod_q=as32((ctx.p % ctx.primes)[:, None]),
            garner=dict(
                invq=as32(gt['invq']), W=as32(gt['W']), Wh=as32(gt['Wh']),
                P_limbs=as32(gt['P_limbs']),
                halfP_digits=as32(gt['halfP_digits'])),
            fast_crt=fast_crt_dev(ft),
            ksw=ksw_tables,
            lin=lin_tables,
            chunk_tbl=as32(rt['chunk_tbl']),
            wrap=as32(rt['wrap'][:, None]),
            # sign-correction wrap for ciphertext-width (n_ct) inputs; the
            # jit pipelines compute these as trace-time constants, but the
            # shard_map pipelines need it as a limb-SHARDED table
            wrap_ct=as32(self._wrap_np(ctx.primes, self.n_ct)[:, None]),
            p_chunk_tbl=as32(rt['p_chunk_tbl']),
            q_limbs=jnp.asarray(int_to_limbs(ctx.q, ctx.n_limbs)),
            q_over_p=jnp.asarray(ctx.q_over_p_limbs),
            q_over_p_sh10=jnp.asarray(
                int_to_limbs((ctx.q // ctx.p) << 10, ctx.n_limbs)),
            q_over_p_sh20=jnp.asarray(
                int_to_limbs((ctx.q // ctx.p) << 20, ctx.n_limbs)),
            # p as limbs for the large-p decrypt tail (mod_p_bounded)
            p_limbs=jnp.asarray(int_to_limbs(ctx.p, 4)),
        )
        if ctx.use_ct:
            # full-chain CT pack; 't2i_crt' carries the full-basis binv
            self.C['ct'] = ct_with_crt(ct_full, ft, ctx.primes)
        else:
            self.C['fwd_chunks'] = fwd_chunks_dev
            self.C['inv_chunks'] = inv_chunks_dev
            # full-chain iNTT with the full-basis binv folded in, for the
            # to_poly sites (raw 'inv_chunks' stays for the public
            # ntt_inv / SingleCrt conversions)
            self.C['inv_chunks_crt'] = prescale_inv(inv_chunks_dev, ft,
                                                    ctx.primes)
        # scalar constants (fine to embed in HLO)
        self.p = jnp.int32(ctx.p)
        self.pinv_f = jnp.float32(1.0 / ctx.p)
        self.p_f = jnp.float32(ctx.p)
        self.p_wrap = jnp.int32(rt['p_wrap'])
        self.large_p = ctx.p >= (1 << 20)

    # ------------------------------------------------------- conveniences
    # Back-compat attribute views used by tests/tools.
    @property
    def q(self):
        return self.C['q']

    @property
    def qinv_f(self):
        return self.C['qinv_f']

    @property
    def fwd_chunks(self):
        return self.C['fwd_chunks']

    @property
    def inv_chunks(self):
        return self.C['inv_chunks']

    @property
    def garner(self):
        return self.C['garner']

    @property
    def fast_crt(self):
        return self.C['fast_crt']

    @property
    def chunk_tbl(self):
        return self.C['chunk_tbl']

    @property
    def wrap(self):
        return self.C['wrap']

    @property
    def p_chunk_tbl(self):
        return self.C['p_chunk_tbl']

    @property
    def q_limbs(self):
        return self.C['q_limbs']

    # ----------------------------------------------------- width constants
    # from_poly's sign correction needs 2^(16*n_in) mod q_l for the STATIC
    # input limb width n_in.  The widths are known at trace time, so these
    # are computed host-side and embedded as tiny [rows, 1] HLO constants —
    # no table plumbing per width.
    @staticmethod
    def _wrap_np(primes_np, n: int) -> np.ndarray:
        return np.array([pow(2, 16 * n, int(q)) for q in primes_np],
                        dtype=np.int64)

    def _lin_primes_np(self) -> np.ndarray:
        """Static primes of the linear-op basis (= _lin_tables rows)."""
        if self.C['lin'] is None:
            return self.ctx.primes
        return self.ctx.primes[self.ctx.lin_rows]

    def _ksw_primes_np(self) -> np.ndarray:
        """Static primes of the keyswitch basis (= _ksw_tables rows)."""
        if self.C['ksw'] is None:
            return self.ctx.primes
        return self.ctx.primes[self.ctx.ksw_rows]

    def _wrap_const(self, primes_np, n: int):
        return jnp.asarray(self._wrap_np(primes_np, n)[:, None],
                           dtype=jnp.int32)

    # ----------------------------------------------------------- primitives
    # (pure functions of (C, ...); public eager wrappers below)
    # A hand-written Pallas fusion of the digit dots + Barrett-Horner
    # recombine was built, wired, parity-tested, and MEASURED SLOWER than
    # the XLA einsum path at every production shape (round 3,
    # BASELINE.md "Pallas postmortem": lift 5.13 vs 3.64 ms, digit stage
    # 8.14-9.0 vs 7.82 ms; larger tiles exceed VMEM).  XLA's own fusion
    # + matmul scheduling is the faster schedule here, so the kernel was
    # deleted rather than carried dark.
    def _ntt_raw(self, chunks, x, q, qinv_f):
        return ntt.modmatmul(chunks, x, q, qinv_f)

    def _fwd_t(self, T, x):
        """Forward transform over a basis-table dict: dense MXU DFT
        matmul or the two-level Cooley-Tukey factorization — selected by
        the table family (static per context)."""
        if 'ct' in T:
            if self.ct_pallas:
                return ntt_ct_pallas.ct_fwd(T['ct'], x, self.ct_meta)
            return ntt_ct.ct_fwd(T['ct'], x, self.ct_meta)
        return self._ntt_raw(T['fwd_chunks'], x, T['q'], T['qinv_f'])

    def _inv_crt_t(self, T, x):
        """Inverse transform with the basis binv prescaled in (feeds the
        single-pass CRT reconstruction with prescaled=True)."""
        if 'ct' in T:
            if self.ct_pallas:
                return ntt_ct_pallas.ct_inv(T['ct'], x, self.ct_meta,
                                            t2i_key='t2i_crt')
            return ntt_ct.ct_inv(T['ct'], x, self.ct_meta,
                                 t2i_key='t2i_crt')
        return self._ntt_raw(T['inv_chunks'], x, T['q'], T['qinv_f'])

    def _full_as_subset(self, C):
        # inv_chunks_crt: subset inv tables are binv-prescaled, so the
        # full-chain fallback must be too (_to_poly_sub reconstructs with
        # prescaled=True)
        t = dict(rows=None, q=C['q'], qinv_f=C['qinv_f'],
                 chunk_tbl=C['chunk_tbl'],
                 fast_crt=C['fast_crt'])
        if self.use_ct:
            t['ct'] = C['ct']
        else:
            t['fwd_chunks'] = C['fwd_chunks']
            t['inv_chunks'] = C['inv_chunks_crt']
        return t

    def _ksw_tables(self, C):
        """The keyswitch-path tables: the subset basis when it saves rows,
        otherwise aliases of the full-chain tables ('rows' None)."""
        return C['ksw'] if C['ksw'] is not None else self._full_as_subset(C)

    def _lin_tables(self, C):
        """Tables for the linear ops (encrypt/decrypt/automorph/const-mul,
        context.lin_value_primes)."""
        return C['lin'] if C['lin'] is not None else self._full_as_subset(C)

    def _lin_tables_for_width(self, C, width: int):
        """Linear-op tables for an input of the given (trace-time) limb
        width.  n_ct-width parts are reduce_signed representatives and
        ride the lin subset (bound context.exact_bounds['auto'/'mulc']);
        WIDER parts are unreduced exact intermediates (one automorph hop,
        bound 'auto_wide'/'mulc_wide') and ride the full chain, whose
        coverage context._check_chain_budget asserts at build."""
        if width <= self.n_ct:
            return self._lin_tables(C), self._lin_primes_np()
        return self._full_as_subset(C), self.ctx.primes

    def _from_poly_sub(self, T, poly_limbs, primes_np):
        # The wrap constant's prime rows MUST match T's rows; the caller
        # states the basis explicitly (pass _lin_primes_np() with
        # _lin_tables(C), _ksw_primes_np() with _ksw_tables(C)) so a
        # mismatched (T, wrap) pair is a visible bug, not a silent one.
        assert len(primes_np) == T['q'].shape[0], \
            "wrap-basis primes do not match the subset tables"
        wrap = self._wrap_const(primes_np, poly_limbs.shape[-1])
        res = crt.limbs_to_residues(poly_limbs, T['chunk_tbl'], wrap,
                                    T['q'], T['qinv_f'], self.wide)
        return self._fwd_t(T, res)

    def _to_poly_sub(self, T, evals):
        res = self._inv_crt_t(T, evals)
        return crt.residues_to_limbs_fast(res, T['fast_crt'], T['q'],
                                          T['qinv_f'], prescaled=True,
                                          wide=self.wide)

    @staticmethod
    def _gather_rows(T, evals_full, axis=-2):
        """Full-chain eval tensors (keys, constants) restricted to the
        subset rows (cheap relative to the NTTs they feed)."""
        if T['rows'] is None:
            return evals_full
        return jnp.take(evals_full, T['rows'], axis=axis)

    def _from_poly(self, C, poly_limbs):
        return self._from_poly_sub(self._full_as_subset(C), poly_limbs,
                                   self.ctx.primes)

    def _to_poly(self, C, evals):
        return self._to_poly_sub(self._full_as_subset(C), evals)

    def _small_to_evals(self, C, coeffs):
        res = coeffs[..., None, :] % C['q']
        return self._fwd_t(self._full_as_subset(C), res)

    def _reduce_signed(self, C, limbs_arr):
        """Signed Reduce mod 2^logQ, emitted at the narrow ciphertext
        width (n_ct): the representative lies in [-q/2, q/2), so the
        wide reconstruction limbs above logQ are dead weight."""
        return lb.reduce_mod_q(limbs_arr, self.log_q, False, C['q_limbs'],
                               out_width=self.n_ct)

    # public eager versions (used by tools/tests; jit-free)
    def ntt_fwd(self, x):
        return self._fwd_t(self._full_as_subset(self.C), x)

    def ntt_inv(self, x):
        """RAW full-chain inverse (no CRT prescale): the public
        Cmodulus::iFFT analog for SingleCrt conversions and tests."""
        if self.use_ct:
            if self.ct_pallas:
                return ntt_ct_pallas.ct_inv(self.C['ct'], x, self.ct_meta)
            return ntt_ct.ct_inv(self.C['ct'], x, self.ct_meta)
        return self._ntt_raw(self.C['inv_chunks'], x, self.C['q'],
                             self.C['qinv_f'])

    def from_poly(self, poly_limbs):
        return self._from_poly(self.C, poly_limbs)

    def to_poly(self, evals):
        return self._to_poly(self.C, evals)

    def small_to_evals(self, coeffs):
        return self._small_to_evals(self.C, coeffs)

    def reduce_signed(self, limbs_arr):
        return self._reduce_signed(self.C, limbs_arr)

    def _wrap(self, fn):
        """jit fn(C, ...) and partially apply the device tables."""
        jitted = jax.jit(fn)
        return lambda *args: jitted(self.C, *args)

    # ------------------------------------------------------------ scheme ops
    def _encrypt(self, C, pk_evals, msg, r, errors):
        # linear subset basis: pk*r + p*e reconstructs exactly there
        # (context.lin_value_primes bound; FHE-SI.cpp:10-36 semantics).
        # RANK-GENERIC: msg/r [..., phim], errors [..., 2, phim] — the
        # batched op passes [B, ...] natively (no vmap) so the
        # transforms run at their flat fast rank.
        T = self._lin_tables(C)
        pk_sub = self._gather_rows(T, pk_evals)
        r_evals = self._fwd_t(T, r[..., None, :] % T['q'])
        e_res = errors[..., None, :] % T['q']
        e_evals = modular.mod_mul(
            self._fwd_t(T, e_res),
            self._gather_rows(T, C['p_mod_q']), T['q'], T['qinv_f'],
            self.wide)
        ct_evals = modular.mod_add(
            modular.mod_mul(pk_sub, r_evals[..., None, :, :], T['q'],
                            T['qinv_f'], self.wide),
            e_evals, T['q'])
        parts = self._to_poly_sub(T, ct_evals)
        nw = parts.shape[-1]     # lin-basis recon width; q/p << 2^(16*nw)
        scaled = lb.scale_coeffs_by_bigint(msg, C['q_over_p'][..., :nw],
                                           C['q_over_p_sh10'][..., :nw],
                                           C['q_over_p_sh20'][..., :nw])
        p0 = lb.add(parts[..., 0, :, :], scaled)
        parts = parts.at[..., 0, :, :].set(p0)
        return self._reduce_signed(C, parts)

    @cached_property
    def encrypt_op(self):
        return self._wrap(self._encrypt)

    @cached_property
    def batched_encrypt_op(self):
        if not self.use_ct:
            return self._wrap(jax.vmap(self._encrypt,
                                       in_axes=(None, None, 0, 0, 0)))
        return self._wrap(self._encrypt)

    def _decrypt(self, C, parts_limbs, sk_evals):
        # linear subset basis: sum_i ct_i*sk_i (sk ternary HWt 64 powers)
        # reconstructs exactly there (FHE-SI.cpp:93-119 semantics).
        # Wider-than-n_ct inputs (unreduced automorph outputs) are
        # re-reduced first: the decrypt rounding floor((2p*d + q)/2q) mod p
        # is invariant under d -> d + t*q (the quotient shifts by exactly
        # t*p), so the output is unchanged and the derived lin-basis bound
        # (context.exact_bounds['dec'], |ct| <= q/2) applies.
        # RANK-GENERIC (parts axis at -3): batched callers pass
        # [B, k, phim, n] directly — native batch dims keep every
        # transform at its flat fast rank (ntt_ct._flatten_lead).
        if parts_limbs.shape[-1] > self.n_ct:
            parts_limbs = self._reduce_signed(C, parts_limbs)
        T = self._lin_tables(C)
        part_evals = self._from_poly_sub(T, parts_limbs, self._lin_primes_np())
        sk_sub = self._gather_rows(T, sk_evals)
        prod = modular.mod_mul(part_evals, sk_sub, T['q'], T['qinv_f'],
                               self.wide)
        acc = prod[..., 0, :, :]
        for i in range(1, prod.shape[-3]):
            acc = modular.mod_add(acc, prod[..., i, :, :], T['q'])
        d = self._to_poly_sub(T, acc)
        nw = d.shape[-1]          # lin recon width; *2p headroom budgeted
        y = lb.mul_small(d, 2 * self.p)
        y = lb.add(y, jnp.broadcast_to(C['q_limbs'][..., :nw], y.shape))
        y = lb.arith_shift_right(y, self.log_q + 1)
        if self.large_p:
            # p >= 2^20: the chunk-dot tables would overflow int32 —
            # quotient-estimate reduction instead (|y| <= K_dec * p)
            return lb.mod_p_bounded(y, C['p_limbs'], self.p_f,
                                    self.ctx.exact_bounds['K_dec'])
        p_wrap = jnp.int32(pow(2, 16 * nw, self.ctx.p))
        return crt.limbs_to_mod_small(y, C['p_chunk_tbl'], p_wrap,
                                      self.p, self.pinv_f)

    @cached_property
    def decrypt_op(self):
        return self._wrap(self._decrypt)

    @cached_property
    def batched_decrypt_op(self):
        # CT: native batch (no vmap) — _decrypt is rank-generic and the
        # transforms flatten leading dims to the fast 3-D shapes
        if not self.use_ct:
            return self._wrap(jax.vmap(self._decrypt,
                                       in_axes=(None, 0, None)))
        return self._wrap(self._decrypt)

    @cached_property
    def batched_reduce_signed_op(self):
        """Signed Reduce mod 2^logQ to the canonical n_ct width for a
        batch of wide parts (decrypt_batch width canonicalization)."""
        return self._wrap(lambda C, parts: self._reduce_signed(C, parts))

    @cached_property
    def add_op(self):
        return self._wrap(
            lambda C, a, b: self._reduce_signed(C, lb.add(a, b)))

    @cached_property
    def add_tensored_op(self):
        return self._wrap(lambda C, a, b: modular.mod_add(a, b, C['q']))

    def _tensor_mul(self, C, a_parts, b_parts):
        # RANK-GENERIC (parts axis at -3 after the lift): batched callers
        # pass [B, k, phim, n] natively
        na, nb = a_parts.shape[-3], b_parts.shape[-3]
        if a_parts.shape[-1] == b_parts.shape[-1]:
            # ONE fused lift for both operands (same transform, bigger
            # flat batch) — then split and scale the a-side by p
            ev = self._from_poly(C, jnp.concatenate([a_parts, b_parts],
                                                    axis=-3))
            a_ev = modular.mod_mul(ev[..., :na, :, :], C['p_mod_q'],
                                   C['q'], C['qinv_f'], self.wide)
            b_ev = ev[..., na:, :, :]
        else:
            a_ev = modular.mod_mul(self._from_poly(C, a_parts), C['p_mod_q'],
                                   C['q'], C['qinv_f'], self.wide)
            b_ev = self._from_poly(C, b_parts)
        out = [None] * (na + nb - 1)
        for i in range(na):
            for j in range(nb):
                pr = modular.mod_mul(a_ev[..., i, :, :], b_ev[..., j, :, :],
                                     C['q'], C['qinv_f'], self.wide)
                k = i + j
                out[k] = pr if out[k] is None else modular.mod_add(
                    out[k], pr, C['q'])
        return jnp.stack(out, axis=-3)

    @cached_property
    def tensor_mul_op(self):
        return self._wrap(self._tensor_mul)

    @cached_property
    def batched_tensor_mul_op(self):
        if not self.use_ct:
            return self._wrap(jax.vmap(self._tensor_mul,
                                       in_axes=(None, 0, 0)))
        return self._wrap(self._tensor_mul)

    @cached_property
    def signed_group_sum_tensored_op(self):
        """Batched det-level accumulation: sum_t s_t * tens_t within
        uniform groups (tensored evals; s in {1, q-1} encodes +/-1)."""
        def run(C, tens, s_mod):
            # tens [G, k, parts, L, phim]; s_mod [G, k, 1, L, 1]
            prod = modular.mod_mul(tens, s_mod, C['q'], C['qinv_f'],
                                   self.wide)
            acc = prod[:, 0]
            for t in range(1, prod.shape[1]):
                acc = modular.mod_add(acc, prod[:, t], C['q'])
            return acc
        return self._wrap(run)

    @cached_property
    def batched_mul_scalar_op(self):
        def one(C, parts_limbs, scalar_abs, negate):
            prod = lb.mul_small(parts_limbs, scalar_abs)
            prod = jnp.where(negate, lb.neg(prod), prod)
            return self._reduce_signed(C, prod)
        return self._wrap(jax.vmap(one, in_axes=(None, 0, 0, 0)))

    def _scale_down(self, C, tprod_evals):
        x = self._to_poly(C, tprod_evals)
        y = lb.shift_left(x, 1)
        y = lb.add(y, jnp.broadcast_to(C['q_limbs'], y.shape))
        y = lb.arith_shift_right(y, self.log_q + 1)
        return self._reduce_signed(C, y)

    @cached_property
    def scale_down_op(self):
        return self._wrap(self._scale_down)

    def _digit_evals(self, C, parts_limbs):
        """Digit residues + NTTs over the keyswitch subset basis (the
        dominant NTT stage: parts*ndigits rows, context.ksw_rows primes).
        RANK-GENERIC: parts_limbs [..., k, phim, n] -> [..., k*nd, Lk,
        phim] — batched callers pass a native batch axis."""
        from .context import MAX_KSW_PARTS
        k = parts_limbs.shape[-3]
        assert k <= MAX_KSW_PARTS, (
            f"keyswitching {k} parts exceeds the "
            f"MAX_KSW_PARTS={MAX_KSW_PARTS} cap the subset basis is "
            "provisioned for (context.exact_bounds['ksw'])")
        K = self._ksw_tables(C)
        lead = parts_limbs.shape[:-3]
        rows = k * self.ndigits
        if self.digit_bits <= 24:
            digs = lb.byte_decomp(parts_limbs, self.log_q, self.digit_bits,
                                  self.ndigits, C['q_limbs'])
            digs = jnp.moveaxis(digs, -1, -2)      # [..., k, nd, phim]
            digs = digs.reshape(lead + (rows, self.phim))
            if self.use_ct:
                # Fast path (round 5): feed the prime-INDEPENDENT digit
                # values straight into the chirped stage-1 matmul — no
                # [rows, Lk, phim] int32 residue broadcast, no separate
                # per-prime Barrett pass (ntt_ct.ct_fwd_digits).
                if self.ct_pallas:
                    return ntt_ct_pallas.ct_fwd_digits(
                        K['ct'], digs, self.ct_meta, self.digit_bits)
                return ntt_ct.ct_fwd_digits(K['ct'], digs, self.ct_meta,
                                            self.digit_bits)
            res = modular.barrett(digs[..., None, :], K['q'], K['qinv_f'])
        else:
            # decompSize >= 4: digits ride 16-bit limb planes; convert
            # to residues with a Horner over planes (x2^16 mod q runs as
            # int32-exact shift hops: 10+6 narrow, 6+6+4 wide)
            digs = lb.byte_decomp_planes(parts_limbs, self.log_q,
                                         self.digit_bits, self.ndigits,
                                         C['q_limbs'])
            # [..., k, phim, nd, planes] -> [..., k*nd, phim, planes]
            digs = jnp.moveaxis(digs, -2, -3)      # [..., k, nd, phim, pl]
            digs = digs.reshape(lead + (rows, self.phim, digs.shape[-1]))
            q, qinv = K['q'], K['qinv_f']
            pl = digs[..., None, :, :]             # [..., rows, 1, phim, pl]
            res = modular.barrett(pl[..., -1], q, qinv)
            for t in range(pl.shape[-1] - 2, -1, -1):
                if self.wide:
                    res = modular.barrett(res << 6, q, qinv)
                    res = modular.barrett(res << 6, q, qinv)
                    res = modular.barrett((res << 4) + pl[..., t], q, qinv)
                else:
                    res = modular.barrett(res << 10, q, qinv)
                    res = modular.barrett((res << 6) + pl[..., t], q, qinv)
        return self._fwd_t(K, res)

    @cached_property
    def byte_decomp_op(self):
        return self._wrap(self._digit_evals)

    def _keyswitch_digits(self, C, matrix_evals, digit_evals):
        """Keyswitch dot + reconstruction over the subset basis.  The
        matrix is stored on the full chain (serialization parity); its
        subset rows are gathered here (cheap relative to the NTTs).
        RANK-GENERIC: digit_evals [..., K, Lk, phim]."""
        K = self._ksw_tables(C)
        mat = (matrix_evals if K['rows'] is None
               else jnp.take(matrix_evals, K['rows'], axis=2))
        acc = modular.mod_dot(mat, digit_evals[..., None, :, :, :],
                              K['q'], K['qinv_f'], axis=-3, wide=self.wide)
        limbs = self._to_poly_sub(K, acc)
        return self._reduce_signed(C, limbs)

    @cached_property
    def keyswitch_apply_op(self):
        return self._wrap(self._keyswitch_digits)

    def _keyswitch_parts_one(self, parts, matrix_evals):
        """Eager helper (used by the sharded app pipelines)."""
        return self._keyswitch_parts(self.C, parts, matrix_evals)

    def _keyswitch_parts(self, C, parts, matrix_evals):
        return self._keyswitch_digits(C, matrix_evals,
                                      self._digit_evals(C, parts))

    @cached_property
    def batched_keyswitch_parts_op(self):
        if not self.use_ct:
            return self._wrap(jax.vmap(self._keyswitch_parts,
                                       in_axes=(None, 0, None)))
        return self._wrap(self._keyswitch_parts)

    # The permutation is passed as a jit ARGUMENT, not closed over: a
    # closed-over device array lowers to an HLO constant, which stalls
    # compilation on a device->host fetch behind the queued work.
    @cached_property
    def _automorph_jit(self):
        def run(C, parts_limbs, perm):
            T, primes = self._lin_tables_for_width(C, parts_limbs.shape[-1])
            ev = self._from_poly_sub(T, parts_limbs, primes)
            ev = jnp.take(ev, perm, axis=-1)
            return self._to_poly_sub(T, ev)  # exact, NOT reduced (Ciphertext.cpp:54-59)
        return self._wrap(run)

    def automorph_op(self, k: int):
        perm = jnp.asarray(self.ctx.automorph_perm(k), dtype=jnp.int32)
        return lambda parts: self._automorph_jit(parts, perm)

    @cached_property
    def _automorph_tensored_jit(self):
        return self._wrap(lambda C, evals, perm: jnp.take(evals, perm, axis=-1))

    def automorph_tensored_op(self, k: int):
        perm = jnp.asarray(self.ctx.automorph_perm(k), dtype=jnp.int32)
        return lambda evals: self._automorph_tensored_jit(evals, perm)

    @cached_property
    def mul_scalar_op(self):
        def run(C, parts_limbs, scalar_abs, negate):
            prod = lb.mul_small(parts_limbs, scalar_abs)
            prod = jnp.where(negate, lb.neg(prod), prod)
            return self._reduce_signed(C, prod)
        return self._wrap(run)

    @cached_property
    def mul_scalar_tensored_op(self):
        return self._wrap(
            lambda C, evals, s_mod: modular.mod_mul(evals, s_mod, C['q'],
                                                    C['qinv_f'], self.wide))

    @cached_property
    def mul_const_op(self):
        def run(C, parts_limbs, const_evals):
            # constant coeffs < p: exact_bounds['mulc'/'mulc_wide']
            T, primes = self._lin_tables_for_width(C, parts_limbs.shape[-1])
            ev = self._from_poly_sub(T, parts_limbs, primes)
            ev = modular.mod_mul(ev, self._gather_rows(T, const_evals)[None],
                                 T['q'], T['qinv_f'], self.wide)
            return self._reduce_signed(C, self._to_poly_sub(T, ev))
        return self._wrap(run)

    @cached_property
    def mul_const_tensored_op(self):
        return self._wrap(
            lambda C, evals, const_evals: modular.mod_mul(
                evals, const_evals[None], C['q'], C['qinv_f'], self.wide))

    @cached_property
    def add_const_op(self):
        return self._wrap(
            lambda C, part0, scaled: self._reduce_signed(
                C, lb.add(part0, scaled)))

    @cached_property
    def add_const_tensored_op(self):
        return self._wrap(
            lambda C, tprod0, scaled: modular.mod_add(
                tprod0, self._from_poly(C, scaled), C['q']))

    # ------------------------------------------------------------- key setup
    def _keygen(self, C, s, c0, c1_limbs):
        s_evals = self._small_to_evals(C, s)
        ones = jnp.ones((self.L, self.phim), dtype=jnp.int32)
        c1_evals = self._from_poly(C, c1_limbs)
        pk0_pre = modular.mod_add(
            modular.mod_mul(s_evals, c1_evals, C['q'], C['qinv_f'],
                            self.wide),
            self._small_to_evals(C, c0), C['q'])
        pk0_limbs = self._reduce_signed(C, self._to_poly(C, pk0_pre))
        pk1_limbs = self._reduce_signed(C, lb.neg(c1_limbs))
        pk_limbs = jnp.stack([pk0_limbs, pk1_limbs])
        return (jnp.stack([ones, s_evals]), self._from_poly(C, pk_limbs),
                pk_limbs)

    @cached_property
    def keygen_op(self):
        return self._wrap(self._keygen)

    def _keyswitch_init(self, C, src_sk_evals, dst_t_evals, A_limbs, e):
        s_limbs = self._to_poly(C, src_sk_evals)
        shifted = []
        for i in range(src_sk_evals.shape[0]):
            for j in range(self.ndigits):
                shifted.append(lb.shift_left(s_limbs[i], self.digit_bits * j))
        s_shift = jnp.stack(shifted)
        b_ev = modular.mod_mul(self._from_poly(C, A_limbs), dst_t_evals[None],
                               C['q'], C['qinv_f'], self.wide)
        b_limbs = self._to_poly(C, b_ev)
        b_limbs = lb.add(lb.add(b_limbs, lb.from_small_signed(e, self.n)),
                         s_shift)
        row_b = self._reduce_signed(C, b_limbs)
        row_a = self._reduce_signed(C, lb.neg(A_limbs))
        return self._from_poly(C, jnp.stack([row_b, row_a]))

    @cached_property
    def keyswitch_init_op(self):
        return self._wrap(self._keyswitch_init)

    @cached_property
    def square_evals_op(self):
        return self._wrap(
            lambda C, evals: modular.mod_mul(evals, evals, C['q'],
                                             C['qinv_f'], self.wide))

    # ------------------------------------------------------- batched pipelines
    def _mul_relin(self, C, a_parts, b_parts, matrix_evals):
        # RANK-GENERIC end to end: the batched op passes [B, k, phim, n]
        # natively (no vmap), so every transform inside runs at the flat
        # fast rank (ntt_ct._flatten_lead merges B into the row axis)
        tprod = self._tensor_mul(C, a_parts, b_parts)
        parts = self._scale_down(C, tprod)
        return self._keyswitch_parts(C, parts, matrix_evals)

    def _mul_relin_one(self, a_parts, b_parts, matrix_evals):
        """Eager full mul+relin for one pair (sharded pipelines use this)."""
        return self._mul_relin(self.C, a_parts, b_parts, matrix_evals)

    # Batch lowering choice (measured, family-dependent): the CT family
    # NEEDS the native batch axis (XLA lowers its stage einsums ~3x
    # worse at rank >= 4, so the transforms flatten the batch into the
    # row axis — tools/profile_digit_layout.py), while the tiny/dense
    # family measures ~3x FASTER under vmap at the dispatch-bound
    # canonical config (m=22: 2.24M vmapped vs 0.76M native, bench r5).
    # The functions are rank-generic either way and bit-identical.
    def _mul_relin_b(self, C, a_parts, b_parts, matrix_evals):
        """Batched mul+relin with the family-appropriate lowering."""
        if self.use_ct:
            return self._mul_relin(C, a_parts, b_parts, matrix_evals)
        return jax.vmap(self._mul_relin,
                        in_axes=(None, 0, 0, None))(C, a_parts, b_parts,
                                                    matrix_evals)

    @cached_property
    def batched_mul_relin_op(self):
        return self._wrap(self._mul_relin_b)

    @cached_property
    def batched_keyswitch_tensored_op(self):
        def run(C, tprod, matrix):
            return self._keyswitch_parts(C, self._scale_down(C, tprod),
                                         matrix)
        if not self.use_ct:
            run_v = lambda C, t, m: jax.vmap(       # noqa: E731
                run, in_axes=(None, 0, None))(C, t, m)
            return self._wrap(run_v)
        return self._wrap(run)

    @cached_property
    def batched_rotate_reduce_stage_op(self):
        def run(C, parts, perm, matrix):
            T, primes = self._lin_tables_for_width(C, parts.shape[-1])
            ev = self._from_poly_sub(T, parts, primes)
            ev = jnp.take(ev, perm, axis=-1)
            rotated = self._to_poly_sub(T, ev)
            switched = self._keyswitch_parts(C, rotated, matrix)
            return self._reduce_signed(C, lb.add(parts, switched))
        if not self.use_ct:
            run_v = lambda C, p, pm, m: jax.vmap(   # noqa: E731
                run, in_axes=(None, 0, None, None))(C, p, pm, m)
            return self._wrap(run_v)
        return self._wrap(run)


_DEVICE_CACHE: dict[int, DeviceContext] = {}


def device_context(ctx: FheContext) -> DeviceContext:
    dev = _DEVICE_CACHE.get(id(ctx))
    if dev is None:
        dev = DeviceContext(ctx)
        _DEVICE_CACHE[id(ctx)] = dev
    return dev
