"""Explicit shard_map SPMD pipelines over a ('dp', 'limb') mesh.

parallel/mesh.py shards the same pipelines with GSPMD (jit + NamedSharding
annotations, compiler-placed collectives).  This module is the explicit
counterpart: the full mul+relin pipeline runs inside jax.shard_map with
the CRT prime axis of every table and the keyswitch matrix sharded over
'limb' and the ciphertext batch over 'dp', so collective placement is
pinned by hand instead of inferred.

Communication structure (the CRT-limb parallelism SURVEY §2 calls the
analog of tensor parallelism):
  - elementwise ciphertext algebra and the per-prime NTT matmuls are
    shard-local (zero communication);
  - the ONLY collectives are `psum` over 'limb' of the three CRT
    reconstruction partials (ops/crt.crt_partials) at each to_poly site —
    scale_down and the keyswitch output — riding ICI;
  - limb-domain coefficient arithmetic after each psum is replicated
    across 'limb' shards (cheap VPU work, avoids a second collective);
  - nothing crosses 'dp' until the optional additive block-reduce
    (Regression.h:102-149 semantics), a single psum of raw limb sums.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import crt, limbs as lb, modular, ntt, ntt_ct


def _prune_tables(C):
    """Drop the Garner tables (invq is [L, L], not limb-shardable; the
    sharded pipeline reconstructs via the single-pass path only), the
    keyswitch subset tables (this pipeline keyswitches on the full chain —
    same exact integers, so results stay bit-identical), and the raw iNTT
    planes (every to_poly here uses the binv-prescaled 'inv_chunks_crt';
    for the CT family the binv rides 't2i_crt' and the raw 't2i' is
    dropped the same way)."""
    C = {k: v for k, v in C.items()
         if k not in ('garner', 'ksw', 'lin', 'inv_chunks')}
    if 'ct' in C:
        C['ct'] = {k: v for k, v in C['ct'].items() if k != 't2i'}
    return C


def table_specs(limb: str = 'limb', use_ct: bool = False):
    """PartitionSpec pytree matching DeviceContext.C minus 'garner'.

    Every table with a prime-chain axis is sharded on it; per-limb and
    scalar constants are replicated.  The CT pack's stage tables carry
    the prime axis at position 1 (int8 digit planes [P, L, n, k]) and
    the twiddles at position 1 of [N1, L, N2] — all per-prime-local, so
    every CT transform runs with zero communication under 'limb'
    sharding, exactly like the dense matmul planes.
    """
    L = P(limb)
    L_ = P(limb, None)
    spec = dict(
        q=L_, qinv_f=L_, p_mod_q=L_,
        fast_crt=dict(
            binv=L, Bmodr=L, B=L_, Bh=L_, er_mask=L,
            B_chunks=P(None, limb, None),
            P_limbs=P(None), P_limbs_sh10=P(None),
            mr=P(), mrinv_f=P(), Pinv_r=P()),
        chunk_tbl=P(None, limb),
        wrap=L_,
        wrap_ct=L_,
        p_chunk_tbl=P(None),
        q_limbs=P(None),
        q_over_p=P(None),
        q_over_p_sh10=P(None),
        q_over_p_sh20=P(None),
        p_limbs=P(None),
    )
    if use_ct:
        pl = P(None, limb, None, None)
        spec['ct'] = dict(q=L_, qinv_f=L_,
                          t1=pl, t2=pl, t1i=pl, t2i_crt=pl,
                          tw=P(None, limb, None), twi=P(None, limb, None))
    else:
        spec['fwd_chunks'] = P(None, limb, None, None)
        spec['inv_chunks_crt'] = P(None, limb, None, None)
    return spec


class ShardedPipelines:
    """shard_map versions of the DeviceContext pipelines for one mesh.

    Requires ctx.num_primes to divide evenly by the 'limb' mesh size
    (FheContext(num_primes_multiple=...) pads the chain).
    """

    def __init__(self, dev, mesh: Mesh, dp: str = 'dp', limb: str = 'limb'):
        if dev.L % mesh.shape[limb]:
            raise ValueError(
                f"num_primes={dev.L} does not shard over {limb}="
                f"{mesh.shape[limb]}; build the context with "
                f"num_primes_multiple={mesh.shape[limb]}")
        self.dev = dev
        self.mesh = mesh
        self.dp = dp
        self.limb = limb
        self.C = _prune_tables(dev.C)
        self.Cspec = table_specs(limb, dev.use_ct)

    # ---------------------------------------------------- shard-local pieces
    def _fwd_local(self, Cl, res):
        """Per-prime-local forward transform on this shard's prime rows:
        dense matmul planes or the CT factorization (both families are
        embarrassingly parallel over the chain axis)."""
        if self.dev.use_ct:
            return ntt_ct.ct_fwd(Cl['ct'], res, self.dev.ct_meta)
        return ntt.modmatmul(Cl['fwd_chunks'], res, Cl['q'], Cl['qinv_f'])

    def _inv_crt_local(self, Cl, evals):
        if self.dev.use_ct:
            return ntt_ct.ct_inv(Cl['ct'], evals, self.dev.ct_meta,
                                 t2i_key='t2i_crt')
        return ntt.modmatmul(Cl['inv_chunks_crt'], evals, Cl['q'],
                             Cl['qinv_f'])

    def _to_poly_psum(self, Cl, evals):
        """Local iNTT + CRT partials, one psum over 'limb', replicated
        tail.  Both partials variants are exact for the FULL chain
        contraction, so the psum of shard-local partials cannot
        overflow; the path choice follows crt.USE_MXU_PARTIALS."""
        wide = self.dev.wide
        res = self._inv_crt_local(Cl, evals)
        if crt.USE_MXU_PARTIALS and not wide:
            acc, sig, er = crt.crt_partials_mxu(res, Cl['fast_crt'], Cl['q'],
                                                Cl['qinv_f'])
        else:
            acc, sig, er = crt.crt_partials(res, Cl['fast_crt'], Cl['q'],
                                            Cl['qinv_f'], prescaled=True,
                                            wide=wide)
        acc, sig, er = jax.lax.psum((acc, sig, er), self.limb)
        return crt.crt_finish(acc, sig, er, Cl['fast_crt'], self.dev.n, wide)

    def _from_poly(self, Cl, poly_limbs):
        """Limb polys at ANY trace-time width -> local residue rows.

        The sharded wrap table covers the canonical ciphertext width
        (n_ct); wider inputs (e.g. pre-change serialized parts at the
        full reconstruction width, or unreduced automorph outputs) get a
        per-width wrap constant sliced to this shard's prime rows — the
        same exact lift (NOT a re-reduction) the jit pipelines apply, so
        results stay bit-identical across pipelines."""
        nw = poly_limbs.shape[-1]
        if nw == self.dev.n_ct:
            wrap = Cl['wrap_ct']
        else:
            full = jnp.asarray(
                self.dev._wrap_np(self.dev.ctx.primes, nw)[:, None],
                dtype=jnp.int32)
            rows = self.dev.L // self.mesh.shape[self.limb]
            i = jax.lax.axis_index(self.limb)
            wrap = jax.lax.dynamic_slice_in_dim(full, i * rows, rows, axis=0)
        res = crt.limbs_to_residues(poly_limbs, Cl['chunk_tbl'],
                                    wrap, Cl['q'], Cl['qinv_f'],
                                    self.dev.wide)
        return self._fwd_local(Cl, res)

    def _mul_relin_local(self, Cl, a_parts, b_parts, matrix_local):
        dev = self.dev
        wide = dev.wide
        a_ev = modular.mod_mul(self._from_poly(Cl, a_parts), Cl['p_mod_q'],
                               Cl['q'], Cl['qinv_f'], wide)
        b_ev = self._from_poly(Cl, b_parts)
        na, nb = a_ev.shape[0], b_ev.shape[0]
        tprod = [None] * (na + nb - 1)
        for i in range(na):
            for j in range(nb):
                pr = modular.mod_mul(a_ev[i], b_ev[j], Cl['q'], Cl['qinv_f'],
                                     wide)
                k = i + j
                tprod[k] = pr if tprod[k] is None else modular.mod_add(
                    tprod[k], pr, Cl['q'])
        tprod = jnp.stack(tprod)

        # ScaleDown (Ciphertext.cpp:194-218): replicated limb tail
        x = self._to_poly_psum(Cl, tprod)
        y = lb.shift_left(x, 1)
        y = lb.add(y, jnp.broadcast_to(Cl['q_limbs'], y.shape))
        y = lb.arith_shift_right(y, dev.log_q + 1)
        parts = lb.reduce_mod_q(y, dev.log_q, False, Cl['q_limbs'],
                                out_width=dev.n_ct)

        # ByteDecomp + digit NTTs (FHE-SI.cpp:241-260): digits replicated,
        # residues/NTT local per prime shard
        digs = lb.byte_decomp(parts, dev.log_q, dev.digit_bits, dev.ndigits,
                              Cl['q_limbs'])
        digs = jnp.moveaxis(digs, -1, 1).reshape(-1, dev.phim)
        if dev.use_ct:
            d_ev = ntt_ct.ct_fwd_digits(Cl['ct'], digs, dev.ct_meta,
                                        dev.digit_bits)
        else:
            dres = modular.barrett(digs[:, None, :], Cl['q'], Cl['qinv_f'])
            d_ev = ntt.modmatmul(Cl['fwd_chunks'], dres, Cl['q'],
                                 Cl['qinv_f'])

        acc = modular.mod_dot(matrix_local, d_ev[None], Cl['q'], Cl['qinv_f'],
                              axis=1, wide=wide)
        out = self._to_poly_psum(Cl, acc)
        return lb.reduce_mod_q(out, dev.log_q, False, Cl['q_limbs'],
                               out_width=dev.n_ct)

    # ------------------------------------------------------------ public ops
    def batched_mul_relin(self):
        """fn(a [B,ka,phim,n_ct], b [B,kb,phim,n_ct], matrix [2,K,L,phim])
        -> [B, 2, phim, n_ct], batch sharded over 'dp', matrix over
        'limb'.  Wider inputs are accepted (lifted exactly, see
        _from_poly); outputs are always emitted at n_ct."""
        dp, limb = self.dp, self.limb

        def step(Cl, a, b, matrix_local):
            return jax.vmap(self._mul_relin_local,
                            in_axes=(None, 0, 0, None))(Cl, a, b, matrix_local)

        sm = jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(self.Cspec, P(dp), P(dp), P(None, None, limb, None)),
            out_specs=P(dp),
            check_vma=False)
        jitted = jax.jit(sm)
        return lambda a, b, matrix: jitted(self.C, a, b, matrix)

    def mul_relin_block_reduce(self):
        """Same, plus the additive block-merge of Regression.h:102-149:
        sum over the whole batch, one psum over 'dp' of raw limb sums.
        Returns fn(...) -> [2, phim, n_ct] replicated."""
        dp, limb = self.dp, self.limb

        def step(Cl, a, b, matrix_local):
            out = jax.vmap(self._mul_relin_local,
                           in_axes=(None, 0, 0, None))(Cl, a, b, matrix_local)
            # raw limb sums stay int32-exact: limbs < 2^16, batch < 2^15
            local = jnp.sum(out, axis=0)
            total = jax.lax.psum(local, dp)
            return lb.reduce_mod_q(lb.normalize(total), self.dev.log_q,
                                   False, Cl['q_limbs'],
                                   out_width=self.dev.n_ct)

        sm = jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(self.Cspec, P(dp), P(dp), P(None, None, limb, None)),
            out_specs=P(),
            check_vma=False)
        jitted = jax.jit(sm)
        return lambda a, b, matrix: jitted(self.C, a, b, matrix)


# -------------------------------------------------- sharded CT transforms
# The two-level Cooley-Tukey factorization with the phi(m) axis sharded
# over a mesh axis (m = 2^k: phim = N and no excluded rows, so every
# reshape is block-local).  Each matmul stage computes its Karatsuba
# shift groups on the locally-owned slice of the contraction axis and
# ONE psum per stage delivers the full groups (linear in x, bounds hold
# for the full contraction — ops/ntt.karatsuba_groups); the twiddle and
# Barrett-Horner run replicated and each shard keeps its contiguous
# output block.  2 psums per transform.  Forward input blocks are
# c2-slices (c = c1 + N1*c2, c1 fast), outputs j1-slices (u = j2 +
# N2*j1, j2 fast) — so S must divide both N1 and N2.

def _ct_groups_psum(chunks_local, x_local, q, qinv_f, axis):
    g = ntt.karatsuba_groups(chunks_local, x_local)
    g = jax.lax.psum(g, axis)
    return ntt.horner_combine(g, q, qinv_f)


def ct_sharded_fwd_local(Tl, x_loc, meta, S: int, axis: str):
    """[..., L, N/S] residues (c2-slice) -> [..., L, N/S] evals
    (j1-slice).  Call inside shard_map; Tl's stage tables are sliced on
    their contraction axis."""
    N1, N2 = meta.N1, meta.N2
    q, qi = Tl['q'], Tl['qinv_f']
    w = Tl['t1'].shape[0] == ntt.N_PLANES_W
    i = jax.lax.axis_index(axis)
    *lead, L, Nl = x_loc.shape
    y = x_loc.reshape(*lead, L, N2 // S, N1)     # local c2 rows, c1 fast
    y = jnp.moveaxis(y, -1, -3)                  # [.., c1, L, c2_loc]
    z = _ct_groups_psum(Tl['t2'], y, q, qi, axis)    # -> [.., c1, L, N2]
    return _ct_sharded_fwd_tail(Tl, z, meta, S, axis, i, w)


def ct_sharded_fwd_digits_local(Tl, d_loc, meta, S: int, axis: str,
                                digit_bits: int):
    """Sharded ct_fwd_digits: PRIME-INDEPENDENT digit values [..., N/S]
    (c2-slice) -> [..., L, N/S] evals (j1-slice).  Stage 1 contracts the
    local c2 slice of the raw digits (ops/ntt.digit_cross_groups — the
    groups are linear, so the psum of local groups is the full
    contraction, still int32-exact by the module-header bounds)."""
    N1, N2 = meta.N1, meta.N2
    q, qi = Tl['q'], Tl['qinv_f']
    w = Tl['t1'].shape[0] == ntt.N_PLANES_W
    i = jax.lax.axis_index(axis)
    *lead, Nl = d_loc.shape
    d = d_loc.reshape(*lead, N2 // S, N1)        # [.., c2_loc, c1]
    d = jnp.swapaxes(d, -1, -2)                  # [.., c1, c2_loc]
    groups, bits = ntt.digit_cross_groups(Tl['t2'], d, digit_bits)
    groups = jax.lax.psum(groups, axis)
    z = ntt.horner_combine(groups, q, qi, bits)  # [.., c1, L, N2]
    return _ct_sharded_fwd_tail(Tl, z, meta, S, axis, i, w)


def _ct_sharded_fwd_tail(Tl, z, meta, S, axis, i, w):
    N1, N2 = meta.N1, meta.N2
    q, qi = Tl['q'], Tl['qinv_f']
    z = modular.mod_mul(z, Tl['tw'], q, qi, w)   # replicated twiddle
    z = jax.lax.dynamic_slice_in_dim(z, i * (N1 // S), N1 // S, axis=-3)
    z = jnp.swapaxes(z, -1, -3)                  # [.., N2, L, c1_loc]
    out = _ct_groups_psum(Tl['t1'], z, q, qi, axis)  # -> [.., j2, L, N1]
    out = jnp.swapaxes(out, -1, -3)              # [.., j1, L, j2]
    *lead, n1, L, n2 = out.shape
    out = jnp.moveaxis(out, -3, -2).reshape(*lead, L, n1 * n2)
    # keep this shard's contiguous j-block (j1-slice, all j2)
    return jax.lax.dynamic_slice_in_dim(out, i * (N1 // S) * N2,
                                        (N1 // S) * N2, axis=-1)


def ct_sharded_inv_local(Tl, e_loc, meta, S: int, axis: str,
                         t2i_key: str = 't2i'):
    """[..., L, N/S] evals (j1-slice) -> [..., L, N/S] coefficients
    (c2-slice).  t2i_key='t2i_crt' folds the CRT binv (device pack)."""
    N1, N2 = meta.N1, meta.N2
    q, qi = Tl['q'], Tl['qinv_f']
    w = Tl['t1i'].shape[0] == ntt.N_PLANES_W
    i = jax.lax.axis_index(axis)
    *lead, L, Nl = e_loc.shape                   # j1-slice: j2 fast
    y = e_loc.reshape(*lead, L, N1 // S, N2)
    y = jnp.moveaxis(y, -2, -3)                  # [.., j1_loc, L, j2]
    y = jnp.swapaxes(y, -1, -3)                  # [.., j2, L, j1_loc]
    z = _ct_groups_psum(Tl['t1i'], y, q, qi, axis)   # -> [.., j2, L, N1]
    z = jnp.swapaxes(z, -1, -3)                  # [.., c1, L, j2]
    z = modular.mod_mul(z, Tl['twi'], q, qi, w)
    z = jax.lax.dynamic_slice_in_dim(z, i * (N2 // S), N2 // S, axis=-1)
    out = _ct_groups_psum(Tl[t2i_key], z, q, qi, axis)  # -> [.., c1, L, N2]
    z = jnp.moveaxis(out, -3, -1)                # [.., L, c2, c1]
    *lead, L, n2, n1 = z.shape
    z = z.reshape(*lead, L, n2 * n1)             # c = c1 + N1*c2
    # keep this shard's contiguous c-block (c2-slice, all c1)
    return jax.lax.dynamic_slice_in_dim(z, i * (N2 // S) * N1,
                                        (N2 // S) * N1, axis=-1)


class CoeffShardedPipelines:
    """The FULL mul+relin pipeline with the phi(m) axis sharded over
    'coeff' (SURVEY §2 axis 2 — the sequence-parallel analog), optionally
    batch-sharded over 'dp'.

    Everything except the four NTT sites is per-coefficient local once
    the data lives on the evaluation/coefficient grid: limbs->residues,
    the eval-domain tensor product, CRT partials + finish, ScaleDown
    limb arithmetic, ByteDecomp, and the keyswitch dot all shard over
    phim with zero communication.  Each NTT contracts the coefficient
    axis, so each shard computes the Karatsuba shift groups on its
    n_in slice (linear in x; bounds hold for the full contraction,
    ops/ntt.karatsuba_groups) and ONE psum over 'coeff' per transform
    delivers the groups; the Barrett-Horner combine runs replicated and
    each shard keeps its output block (reduce-scatter pattern).
    4 psums per mul+relin — the same collective count as the limb
    pipeline, riding ICI.
    """

    def __init__(self, dev, mesh: Mesh, dp: str = 'dp', coeff: str = 'coeff'):
        if dev.phim % mesh.shape[coeff]:
            raise ValueError(
                f"phim={dev.phim} does not shard over {coeff}="
                f"{mesh.shape[coeff]}")
        if dev.use_ct:
            if dev.ct_meta.q_odd != 1:
                raise NotImplementedError(
                    "coeff-sharded CT pipeline covers m = 2^k (the "
                    "excluded-row drop of mixed-radix m is not "
                    "block-local); mixed-radix contexts shard over 'limb' "
                    "(ShardedPipelines)")
            S = mesh.shape[coeff]
            N1, N2 = dev.ct_split
            if N1 % S or N2 % S:
                raise ValueError(
                    f"coeff shards {S} must divide both CT factors "
                    f"{N1}x{N2}")
        self.dev = dev
        self.mesh = mesh
        self.dp = dp if dp in mesh.shape else None
        self.coeff = coeff
        self.S = mesh.shape[coeff]
        self.C = _prune_tables(dev.C)
        cs = P(None, None, None, coeff)     # chunk planes: n_in sharded
        rep = P()
        self.Cspec = dict(
            q=P(None, None), qinv_f=P(None, None), p_mod_q=P(None, None),
            fast_crt=dict(
                binv=P(None), Bmodr=P(None), B=P(None, None),
                Bh=P(None, None), er_mask=P(None),
                B_chunks=P(None, None, None),
                P_limbs=P(None), P_limbs_sh10=P(None),
                mr=rep, mrinv_f=rep, Pinv_r=rep),
            chunk_tbl=P(None, None), wrap=P(None, None),
            wrap_ct=P(None, None), p_chunk_tbl=P(None),
            q_limbs=P(None), q_over_p=P(None), q_over_p_sh10=P(None),
            q_over_p_sh20=P(None), p_limbs=P(None),
        )
        if dev.use_ct:
            # every CT stage table is sliced on its CONTRACTION axis
            # (the last one); twiddles and per-prime constants replicate
            self.Cspec['ct'] = dict(
                q=P(None, None), qinv_f=P(None, None),
                t1=cs, t2=cs, t1i=cs, t2i_crt=cs,
                tw=P(None, None, None), twi=P(None, None, None))
        else:
            self.Cspec['fwd_chunks'] = cs
            self.Cspec['inv_chunks_crt'] = cs

    def _ntt_coeff(self, chunks_local, x_local, q, qinv_f):
        """x sharded on its last (n_in) axis -> output sharded the same
        way: local shift groups, one psum, replicated Horner, local slice."""
        groups = ntt.karatsuba_groups(chunks_local, x_local)
        groups = jax.lax.psum(groups, self.coeff)
        r = ntt.horner_combine(groups, q, qinv_f)
        i = jax.lax.axis_index(self.coeff)
        loc = r.shape[-1] // self.S
        return jax.lax.dynamic_slice_in_dim(r, i * loc, loc, axis=-1)

    def _mul_relin_local(self, Cl, a_parts, b_parts, matrix_local):
        dev = self.dev
        wide = dev.wide
        fc = Cl['fast_crt']
        use_ct = dev.use_ct

        def fwd(res):
            if use_ct:
                return ct_sharded_fwd_local(Cl['ct'], res, dev.ct_meta,
                                            self.S, self.coeff)
            return self._ntt_coeff(Cl['fwd_chunks'], res, Cl['q'],
                                   Cl['qinv_f'])

        def from_poly(parts):       # [k, phim_loc, n_ct] -> [k, L, phim_loc]
            res = crt.limbs_to_residues(parts, Cl['chunk_tbl'],
                                        Cl['wrap_ct'], Cl['q'], Cl['qinv_f'],
                                        wide)
            return fwd(res)

        def to_poly(evals):         # [k, L, phim_loc] -> [k, phim_loc, n]
            if use_ct:
                res = ct_sharded_inv_local(Cl['ct'], evals, dev.ct_meta,
                                           self.S, self.coeff,
                                           t2i_key='t2i_crt')
            else:
                res = self._ntt_coeff(Cl['inv_chunks_crt'], evals, Cl['q'],
                                      Cl['qinv_f'])
            if crt.USE_MXU_PARTIALS and not wide:
                acc, sig, er = crt.crt_partials_mxu(res, fc, Cl['q'],
                                                    Cl['qinv_f'])
            else:
                acc, sig, er = crt.crt_partials(res, fc, Cl['q'],
                                                Cl['qinv_f'], prescaled=True,
                                                wide=wide)
            return crt.crt_finish(acc, sig, er, fc, dev.n, wide)

        a_ev = modular.mod_mul(from_poly(a_parts), Cl['p_mod_q'],
                               Cl['q'], Cl['qinv_f'], wide)
        b_ev = from_poly(b_parts)
        na, nb = a_ev.shape[0], b_ev.shape[0]
        tprod = [None] * (na + nb - 1)
        for i in range(na):
            for j in range(nb):
                pr = modular.mod_mul(a_ev[i], b_ev[j], Cl['q'], Cl['qinv_f'],
                                     wide)
                k = i + j
                tprod[k] = pr if tprod[k] is None else modular.mod_add(
                    tprod[k], pr, Cl['q'])
        tprod = jnp.stack(tprod)

        x = to_poly(tprod)
        y = lb.shift_left(x, 1)
        y = lb.add(y, jnp.broadcast_to(Cl['q_limbs'], y.shape))
        y = lb.arith_shift_right(y, dev.log_q + 1)
        parts = lb.reduce_mod_q(y, dev.log_q, False, Cl['q_limbs'],
                                out_width=dev.n_ct)

        phim_loc = parts.shape[-2]
        digs = lb.byte_decomp(parts, dev.log_q, dev.digit_bits, dev.ndigits,
                              Cl['q_limbs'])
        digs = jnp.moveaxis(digs, -1, 1).reshape(-1, phim_loc)
        if use_ct:
            d_ev = ct_sharded_fwd_digits_local(Cl['ct'], digs, dev.ct_meta,
                                               self.S, self.coeff,
                                               dev.digit_bits)
        else:
            dres = modular.barrett(digs[:, None, :], Cl['q'], Cl['qinv_f'])
            d_ev = self._ntt_coeff(Cl['fwd_chunks'], dres, Cl['q'],
                                   Cl['qinv_f'])

        acc = modular.mod_dot(matrix_local, d_ev[None], Cl['q'], Cl['qinv_f'],
                              axis=1, wide=wide)
        out = to_poly(acc)
        return lb.reduce_mod_q(out, dev.log_q, False, Cl['q_limbs'],
                               out_width=dev.n_ct)

    def batched_mul_relin(self):
        """fn(a [B,ka,phim,n_ct], b [B,kb,phim,n_ct], matrix [2,K,L,phim])
        -> [B, 2, phim, n_ct]: phim sharded over 'coeff' (and the batch
        over 'dp' when the mesh has one).  Bit-identical to the
        single-device pipelines (tests/test_sharding.py)."""
        dp, coeff = self.dp, self.coeff
        bspec = P(dp, None, coeff, None) if dp else P(None, None, coeff, None)

        def step(Cl, a, b, matrix_local):
            return jax.vmap(self._mul_relin_local,
                            in_axes=(None, 0, 0, None))(Cl, a, b, matrix_local)

        sm = jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(self.Cspec, bspec, bspec,
                      P(None, None, None, coeff)),
            out_specs=bspec,
            check_vma=False)
        jitted = jax.jit(sm)
        return lambda a, b, matrix: jitted(self.C, a, b, matrix)


def make_coeff_mesh(n: int, devices=None) -> Mesh:
    """1-D mesh over the polynomial-coefficient axis (the sequence-parallel
    analog, SURVEY §2 axis 2: shard phi(m))."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices[:n]), ('coeff',))


def ct_coeff_sharded_ntt(dev, mesh: Mesh, forward: bool = True):
    """Two-level Cooley-Tukey NTT (ops/ntt_ct.py) with the phi(m) axis
    sharded over 'coeff' — the sequence-parallel hop pattern on the
    large-m transform family (SURVEY §5: NTT butterfly super-stages as
    collectives over ICI).

    The factorization contracts c2 (inner DFT) then c1 (outer DFT), so
    each stage computes its Karatsuba shift groups on the locally-owned
    slice of the contraction axis and ONE psum per stage delivers the
    full groups (the groups are linear in x and bounded for the full
    contraction, ops/ntt.karatsuba_groups); the Barrett-Horner combine
    and the twiddle/chirp elementwise stages run replicated, and each
    shard keeps its contiguous output block (reduce-scatter pattern).
    2 psums per transform.

    Forward input x [B, L, N] is sharded on its last axis: contiguous
    blocks of c = c1 + N1*c2 are c2-slices (c1 fast), so S must divide
    N2; outputs are j1-slices of j = j2 + N2*j1, so S must divide N1.
    The inverse runs the mirror image.  Bit-identical to the unsharded
    dev.ntt_fwd/ntt_inv (tests/test_sharding.py).
    """
    assert dev.use_ct, "ct_coeff_sharded_ntt needs a CT-family context"
    assert dev.ct_meta.q_odd == 1, \
        "coeff-sharded CT transform covers m = 2^k (the excluded-row " \
        "drop of mixed-radix m is not block-local)"
    N1, N2 = dev.ct_split
    S = mesh.shape['coeff']
    assert N1 % S == 0 and N2 % S == 0, \
        f"coeff shards {S} must divide both CT factors {N1}x{N2}"
    T = dev.C['ct']
    meta = dev.ct_meta

    def fwd(Tl, x_loc):
        return ct_sharded_fwd_local(Tl, x_loc, meta, S, 'coeff')

    def inv(Tl, e_loc):
        return ct_sharded_inv_local(Tl, e_loc, meta, S, 'coeff')

    cs = P(None, None, None, 'coeff')            # chunk planes: contraction
    rep4 = P(None, None, None, None)
    Tspec = dict(q=P(None, None), qinv_f=P(None, None),
                 t1=cs if forward else rep4,
                 t2=cs if forward else rep4,
                 t1i=rep4 if forward else cs,
                 t2i=rep4 if forward else cs,
                 tw=P(None, None, None), twi=P(None, None, None))
    Tuse = {k: T[k] for k in Tspec}
    step = fwd if forward else inv
    sm = jax.shard_map(
        step, mesh=mesh,
        in_specs=(Tspec, P(None, None, 'coeff')),
        out_specs=P(None, None, 'coeff'),
        check_vma=False)
    jitted = jax.jit(sm)
    return lambda x: jitted(Tuse, x)


def coeff_sharded_ntt(dev, mesh: Mesh, forward: bool = True):
    """Modular DFT matmul with phi(m) sharded over 'coeff'.

    Each shard contracts its coefficient slice of the transform matrix
    (six local MXU dots, ntt.karatsuba_groups); ONE psum of the five
    int32 shift groups rides ICI (the groups are linear in x and bounded
    for the full contraction, so the reduction is exact); the
    Barrett-Horner combine runs replicated and each shard keeps its own
    output-coefficient block (reduce-scatter pattern).

    Returns jitted fn(x [B, L, phim] sharded on phim) -> same sharding.
    """
    key = 'fwd_chunks' if forward else 'inv_chunks'
    n_shards = mesh.shape['coeff']

    def step(mat, x, q, qinv_f):
        groups = ntt.karatsuba_groups(mat, x)
        groups = jax.lax.psum(groups, 'coeff')
        r = ntt.horner_combine(groups, q, qinv_f)     # full output, replicated
        i = jax.lax.axis_index('coeff')
        loc = r.shape[-1] // n_shards
        return jax.lax.dynamic_slice_in_dim(r, i * loc, loc, axis=-1)

    sm = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(None, None, None, 'coeff'), P(None, None, 'coeff'),
                  P(None, None), P(None, None)),
        out_specs=P(None, None, 'coeff'),
        check_vma=False)
    jitted = jax.jit(sm)
    C = dev.C
    return lambda x: jitted(C[key], x, C['q'], C['qinv_f'])
