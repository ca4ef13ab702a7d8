"""DoubleCrt / SingleCrt: the reference's polynomial-representation API
(DoubleCRT.h:83-365, SingleCRT.h:41-175) over the TPU tensor engine.

The scheme pipelines in device.py operate on raw arrays for speed; this
module provides the *object* API for library users porting code from the
reference — including the index-set machinery (mod-up `add_primes`,
`add_primes_and_scale`, true mod-switching `scale_down_to_set`) that the
scheme layer itself does not need (static full chains).

Representation: evaluations int32[card(index_set), phim]; row r of the
tensor corresponds to the r-th smallest chain index in the set.
Elementwise ops and NTTs run on device; the rare exact big-int steps
(CRT reconstruction over arbitrary subsets) run on host Python ints —
they are setup-path operations, bit-exact by construction.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .context import FheContext
from .device import device_context
from .hostmath import numbth
from .indexmap import IndexSet
from .ops import modular, ntt
from .sampling import RandomSource


def _rows(ctx: FheContext, s: IndexSet) -> np.ndarray:
    return np.array(sorted(s), dtype=np.int64)


class DoubleCrt:
    def __init__(self, ctx: FheContext, evals=None, index_set: IndexSet | None = None):
        self.ctx = ctx
        self.index_set = (index_set if index_set is not None
                          else IndexSet(0, ctx.num_primes - 1))
        rows = _rows(ctx, self.index_set)
        if evals is None:
            evals = jnp.zeros((len(rows), ctx.phim), dtype=jnp.int32)
        self.evals = evals

    # ------------------------------------------------------------- helpers
    def _dev(self):
        return device_context(self.ctx)

    def _q(self):
        rows = _rows(self.ctx, self.index_set)
        dev = self._dev()
        return dev.q[rows], dev.qinv_f[rows]

    def copy(self) -> "DoubleCrt":
        return DoubleCrt(self.ctx, self.evals, self.index_set)

    # ------------------------------------------------------- constructors
    @classmethod
    def from_poly(cls, ctx: FheContext, coeffs, index_set: IndexSet | None = None
                  ) -> "DoubleCrt":
        """DoubleCRT(const ZZX&) (DoubleCRT.cpp:212-257): reduce the integer
        coefficients mod each chain prime, then forward NTT."""
        obj = cls(ctx, index_set=index_set)
        rows = _rows(ctx, obj.index_set)
        res = np.zeros((len(rows), ctx.phim), dtype=np.int64)
        for r, l in enumerate(rows):
            q = int(ctx.primes[l])
            for j, c in enumerate(coeffs[:ctx.phim]):
                res[r, j] = int(c) % q
        obj.evals = obj._ntt_fwd(jnp.asarray(res, jnp.int32))
        return obj

    @classmethod
    def constant(cls, ctx: FheContext, num: int,
                 index_set: IndexSet | None = None) -> "DoubleCrt":
        """operator=(const ZZ&) (DoubleCRT.cpp:333-347)."""
        obj = cls(ctx, index_set=index_set)
        rows = _rows(ctx, obj.index_set)
        vals = np.array([[int(num) % int(ctx.primes[l])] for l in rows],
                        dtype=np.int32)
        obj.evals = jnp.broadcast_to(jnp.asarray(vals), (len(rows), ctx.phim))
        return obj

    def _ntt_fwd(self, res):
        rows = _rows(self.ctx, self.index_set)
        dev = self._dev()
        return ntt.modmatmul(dev.fwd_chunks[:, rows], res,
                             dev.q[rows], dev.qinv_f[rows])

    def _ntt_inv(self, ev):
        rows = _rows(self.ctx, self.index_set)
        dev = self._dev()
        return ntt.modmatmul(dev.inv_chunks[:, rows], ev,
                             dev.q[rows], dev.qinv_f[rows])

    # ------------------------------------------------------------ to poly
    def to_poly(self, index_set: IndexSet | None = None,
                positive: bool = False) -> list[int]:
        """toPoly (DoubleCRT.cpp:349-398): iNTT per prime + exact CRT,
        centered representatives (or positive when requested)."""
        s = self.index_set if index_set is None else (index_set & self.index_set)
        rows_all = _rows(self.ctx, self.index_set)
        keep = [i for i, l in enumerate(rows_all) if l in s]
        if not keep:
            return [0] * self.ctx.phim
        res = np.asarray(self._ntt_inv(self.evals))[keep]
        primes = [int(self.ctx.primes[rows_all[i]]) for i in keep]
        P = 1
        for q in primes:
            P *= q
        out = []
        for j in range(self.ctx.phim):
            x, mod = 0, 1
            for r, q in enumerate(primes):
                # incremental CRT (intVecCRT semantics, NumbTh.cpp:306-338)
                delta = (int(res[r, j]) - x) * numbth.modinv(mod % q, q) % q
                x += mod * delta
                mod *= q
            x %= P
            if x > P // 2:
                x -= P
            if positive and x < 0:
                x += P
            out.append(x)
        return out

    # ---------------------------------------------------------- arithmetic
    def _binop(self, other, fn):
        if isinstance(other, DoubleCrt):
            if self.ctx is not other.ctx:
                raise ValueError("DoubleCrt op: incompatible contexts")
            # match index sets (Op, DoubleCRT.cpp:79-113)
            me, oth = self, other
            if not (me.index_set >= oth.index_set):
                me = me.copy()
                me.add_primes(oth.index_set / me.index_set)
            if me.index_set > oth.index_set:
                oth = oth.copy()
                oth.add_primes(me.index_set / oth.index_set)
            q, qinv = me._q()
            return DoubleCrt(me.ctx, fn(me.evals, oth.evals, q, qinv),
                             me.index_set)
        if isinstance(other, (int, np.integer)):
            rows = _rows(self.ctx, self.index_set)
            n = np.array([[int(other) % int(self.ctx.primes[l])] for l in rows],
                         dtype=np.int32)
            q, qinv = self._q()
            return DoubleCrt(self.ctx, fn(self.evals, jnp.asarray(n), q, qinv),
                             self.index_set)
        # polynomial with integer coefficients
        rhs = DoubleCrt.from_poly(self.ctx, list(other), self.index_set)
        return self._binop(rhs, fn)

    def __add__(self, other):
        return self._binop(other, lambda a, b, q, i: modular.mod_add(a, b, q))

    def __sub__(self, other):
        return self._binop(other, lambda a, b, q, i: modular.mod_sub(a, b, q))

    def __mul__(self, other):
        return self._binop(other, modular.mod_mul)

    def div_by_constant(self, num: int) -> "DoubleCrt":
        """operator/=(const ZZ&) (DoubleCRT.cpp:407-420): multiply by the
        per-prime modular inverse."""
        rows = _rows(self.ctx, self.index_set)
        inv = np.array([[numbth.modinv(int(num) % int(self.ctx.primes[l]),
                                       int(self.ctx.primes[l]))] for l in rows],
                       dtype=np.int32)
        q, qinv = self._q()
        return DoubleCrt(self.ctx,
                         modular.mod_mul(self.evals, jnp.asarray(inv), q, qinv),
                         self.index_set)

    def exp(self, e: int) -> "DoubleCrt":
        """Exp (DoubleCRT.cpp:423-434): elementwise PowerMod via
        square-and-multiply (static loop over the bits of e)."""
        q, qinv = self._q()
        result = jnp.ones_like(self.evals)
        base = self.evals
        ee = int(e)
        while ee:
            if ee & 1:
                result = modular.mod_mul(result, base, q, qinv)
            ee >>= 1
            if ee:
                base = modular.mod_mul(base, base, q, qinv)
        return DoubleCrt(self.ctx, result, self.index_set)

    def automorph(self, k: int) -> "DoubleCrt":
        """automorph (DoubleCRT.cpp:439-465): slot permutation."""
        perm = jnp.asarray(self.ctx.automorph_perm(k), dtype=jnp.int32)
        return DoubleCrt(self.ctx, jnp.take(self.evals, perm, axis=-1),
                         self.index_set)

    # -------------------------------------------------------- index juggling
    def add_primes(self, s1: IndexSet):
        """addPrimes mod-up (DoubleCRT.cpp:142-156): reconstruct the poly,
        fill new rows with its residues."""
        if s1.card() == 0:
            return
        assert s1.is_disjoint(self.index_set)
        poly = self.to_poly()
        new_set = self.index_set | s1
        merged = DoubleCrt.from_poly(self.ctx, poly, new_set)
        # keep existing rows exactly (they are identical anyway); adopt merged
        self.index_set = new_set
        self.evals = merged.evals

    def add_primes_and_scale(self, s1: IndexSet) -> float:
        """addPrimesAndScale (DoubleCRT.cpp:162-208): scale existing rows by
        factor = prod(q_new) * (prod(q_new)^{-1} mod p), zero-fill new rows."""
        import math
        if s1.card() == 0:
            return 0.0
        assert s1.is_disjoint(self.index_set)
        p = self.ctx.p
        factor = 1
        log_factor = 0.0
        for i in s1:
            qi = int(self.ctx.primes[i])
            factor *= qi
            log_factor += math.log(qi)
        prod_inv = numbth.modinv(factor % p, p)
        factor *= prod_inv
        log_factor += math.log(prod_inv)
        scaled = self * factor  # per-prime scalar multiply on current rows
        new_set = self.index_set | s1
        rows_new = _rows(self.ctx, new_set)
        out = np.zeros((len(rows_new), self.ctx.phim), dtype=np.int32)
        old_rows = list(_rows(self.ctx, self.index_set))
        sc = np.asarray(scaled.evals)
        for r, l in enumerate(rows_new):
            if l in self.index_set:
                out[r] = sc[old_rows.index(l)]
        self.index_set = new_set
        self.evals = jnp.asarray(out)
        return log_factor

    def remove_primes(self, s1: IndexSet):
        rows_all = list(_rows(self.ctx, self.index_set))
        keep = [i for i, l in enumerate(rows_all) if l not in s1]
        self.index_set = self.index_set / s1
        self.evals = self.evals[np.array(keep, dtype=np.int64)]

    def scale_down_to_set(self, s: IndexSet):
        """scaleDownToSet true mod-switching (DoubleCRT.cpp:518-558):
        multiply by (diffProd mod p), add the p-divisible correction delta,
        divide by diffProd."""
        intersect = s & self.index_set
        diff = self.index_set / s
        assert intersect.card() > 0 and diff.card() > 0
        p = self.ctx.p
        diff_prod = 1
        for i in diff:
            diff_prod *= int(self.ctx.primes[i])
        scaled = self * (diff_prod % p)
        delta = scaled.to_poly(diff)
        factor = diff_prod * numbth.modinv(diff_prod % p, p)
        mod = diff_prod * p
        new_delta = []
        for c in delta:
            d = c * factor - c
            d %= mod
            if d > mod // 2:
                d -= mod
            new_delta.append(d)
        scaled.remove_primes(diff)
        scaled = scaled + new_delta
        result = scaled.div_by_constant(diff_prod)
        self.index_set = result.index_set
        self.evals = result.evals

    # -------------------------------------------------------------- sampling
    def randomize(self, source: RandomSource):
        """randomize (DoubleCRT.cpp:468-481): uniform residues mod each prime."""
        rows = _rows(self.ctx, self.index_set)
        res = np.stack([source.uniform_mod_p(self.ctx.phim, int(self.ctx.primes[l]))
                        for l in rows])
        self.evals = jnp.asarray(res, jnp.int32)

    def sample_gaussian(self, source: RandomSource, stdev: float | None = None):
        e = source.gaussian_poly(self.ctx.phim, stdev or self.ctx.stdev)
        self.evals = DoubleCrt.from_poly(self.ctx, list(e), self.index_set).evals

    def sample_hwt(self, source: RandomSource, hwt: int = 64):
        e = source.hwt_poly(self.ctx.phim, hwt)
        self.evals = DoubleCrt.from_poly(self.ctx, list(e), self.index_set).evals

    def sample_small(self, source: RandomSource):
        """sampleSmall (NumbTh.cpp:361-375): coeffs in {-1,0,1}, P(0)=1/2."""
        u = source.rng.integers(0, 4, self.ctx.phim)
        e = np.where(u & 1, (u & 2) - 1, 0)
        self.evals = DoubleCrt.from_poly(self.ctx, list(e), self.index_set).evals

    # --------------------------------------------------------------- convert
    def to_single_crt(self, index_set: IndexSet | None = None) -> "SingleCrt":
        s = self.index_set if index_set is None else (index_set & self.index_set)
        rows_all = list(_rows(self.ctx, self.index_set))
        res = np.asarray(self._ntt_inv(self.evals))
        out = SingleCrt(self.ctx, index_set=s)
        for l in s:
            out.map[l] = res[rows_all.index(l)].copy()
        return out

    def __eq__(self, other):
        return (isinstance(other, DoubleCrt) and self.ctx is other.ctx
                and self.index_set == other.index_set
                and bool(jnp.all(self.evals == other.evals)))

    def __repr__(self):
        return f"DoubleCrt(primes={sorted(self.index_set)}, phim={self.ctx.phim})"


class SingleCrt:
    """Per-prime coefficient-domain residues (SingleCRT.h:41-175)."""

    def __init__(self, ctx: FheContext, index_set: IndexSet | None = None):
        self.ctx = ctx
        self.index_set = (index_set if index_set is not None
                          else IndexSet(0, ctx.num_primes - 1))
        self.map: dict[int, np.ndarray] = {
            l: np.zeros(ctx.phim, dtype=np.int64) for l in self.index_set}

    @classmethod
    def from_poly(cls, ctx: FheContext, coeffs,
                  index_set: IndexSet | None = None) -> "SingleCrt":
        obj = cls(ctx, index_set)
        for l in obj.index_set:
            q = int(ctx.primes[l])
            obj.map[l] = np.array([int(c) % q for c in coeffs[:ctx.phim]]
                                  + [0] * max(0, ctx.phim - len(coeffs)),
                                  dtype=np.int64)
        return obj

    def to_poly(self) -> list[int]:
        dc = self.to_double_crt()
        return dc.to_poly()

    def to_double_crt(self) -> DoubleCrt:
        obj = DoubleCrt(self.ctx, index_set=self.index_set)
        rows = _rows(self.ctx, self.index_set)
        res = np.stack([self.map[l] for l in rows])
        obj.evals = obj._ntt_fwd(jnp.asarray(res, jnp.int32))
        return obj

    def __add__(self, other: "SingleCrt") -> "SingleCrt":
        out = SingleCrt(self.ctx, self.index_set)
        for l in self.index_set:
            q = int(self.ctx.primes[l])
            out.map[l] = (self.map[l] + other.map[l]) % q
        return out

    def __sub__(self, other: "SingleCrt") -> "SingleCrt":
        out = SingleCrt(self.ctx, self.index_set)
        for l in self.index_set:
            q = int(self.ctx.primes[l])
            out.map[l] = (self.map[l] - other.map[l]) % q
        return out
