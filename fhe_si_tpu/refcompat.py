"""Bridges between reference-format artifacts and fhe_si_tpu objects.

The reference stores keys as DoubleCRT residues in ITS prime basis
(~60-bit NTL primes, evaluations at (root^2)^{t_j} per bluestein.h:26:
BluesteinFFT(...,root,...) = DFT(...,root^2,...)).  Ciphertexts are
stored in the coefficient domain (ScaleDown before export), so they
convert directly; keys are re-based exactly: interpolate per reference
prime, CRT across the reference chain, then re-encode in our basis.
All re-basing is host-side exact Python-int math (import/export is a
setup-path operation).
"""
from __future__ import annotations

import numpy as np

from . import refserial, scheme
from .context import FheContext
from .device import device_context
from .hostmath import numbth

try:  # jnp only needed for building device-side key objects
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


def context_from_reference(ref: refserial.RefContext) -> FheContext:
    """Build an equivalent fhe_si_tpu context (same scheme parameters; our
    own device prime basis — the chain is an internal exact-arithmetic
    device, SURVEY §1)."""
    return FheContext(m=ref.m, log_q=ref.log_q, p=ref.p,
                      generator=ref.generator, decomp_size=ref.decomp_size)


# ------------------------------------------------------- reference NTT basis
def _ref_eval_points(ref: refserial.RefContext, ctx: FheContext, q: int,
                     root: int) -> list[int]:
    """omega^t for t in (Z/mZ)* ascending, omega = root^2 mod q."""
    omega = root * root % q
    pw = [1] * ref.m
    for i in range(1, ref.m):
        pw[i] = pw[i - 1] * omega % q
    return [pw[int(t)] for t in ctx.zms], pw


def _interpolate_mod_prime(row: np.ndarray, ref: refserial.RefContext,
                           ctx: FheContext, q: int, root: int) -> list[int]:
    """Inverse of the reference FFT for one prime: find deg<phim poly with
    f(omega^{t_j}) = row[j] mod q.  Same closed form as context.ntt_tables:
    zero-extend the evals over all m indices, full inverse DFT, reduce mod
    Phi_m (any filler values at non-primitive indices yield the same class
    mod Phi_m; zeros chosen)."""
    m, phim = ref.m, ctx.phim
    omega = root * root % q
    # inverse DFT: c_k = m^{-1} sum_j y_{t_j} omega^{-k t_j}
    minv = numbth.modinv(m, q)
    pw = [1] * m
    winv = numbth.modinv(omega, q)
    for i in range(1, m):
        pw[i] = pw[i - 1] * winv % q
    full = [0] * m
    for k in range(m):
        acc = 0
        for j, t in enumerate(ctx.zms):
            acc += int(row[j]) * pw[(k * int(t)) % m]
        full[k] = acc % q * minv % q
    # reduce mod Phi_m over Z_q
    phi = [c % q for c in ctx.phim_x]
    for i in range(m - 1, phim - 1, -1):
        c = full[i]
        if c:
            for d in range(phim + 1):
                full[i - phim + d] = (full[i - phim + d] - c * phi[d]) % q
    return full[:phim]


def dcrt_to_poly(dcrt: dict[int, np.ndarray], ref: refserial.RefContext,
                 ctx: FheContext) -> list[int]:
    """Reference DoubleCRT residues -> exact centered coefficients
    (toPoly semantics, DoubleCRT.cpp:349-398, over the reference chain)."""
    polys = []
    primes = []
    for idx in sorted(dcrt):
        q, root = ref.chain[idx]
        polys.append(_interpolate_mod_prime(dcrt[idx], ref, ctx, q, root))
        primes.append(q)
    P = 1
    out = [0] * ctx.phim
    for r, q in enumerate(primes):
        if r == 0:
            out = [c % q for c in polys[0]]
            P = q
            continue
        pinv = numbth.modinv(P % q, q)
        for j in range(ctx.phim):
            delta = (polys[r][j] - out[j]) * pinv % q
            out[j] += P * delta
        P *= q
    half = P // 2
    return [c - P if c % P > half else c % P for c in [v % P for v in out]]


def poly_to_dcrt(coeffs: list[int], ref: refserial.RefContext,
                 ctx: FheContext) -> dict[int, np.ndarray]:
    """Exact coefficients -> reference-basis DoubleCRT residues (the
    reference's FFT, for exporting our keys to its format)."""
    out = {}
    for idx, (q, root) in enumerate(ref.chain):
        points, pw = _ref_eval_points(ref, ctx, q, root)
        red = [int(c) % q for c in coeffs[:ctx.phim]]
        row = np.zeros(ctx.phim, dtype=np.int64)
        for j, t in enumerate(ctx.zms):
            acc = 0
            for k, c in enumerate(red):
                if c:
                    acc += c * pw[(int(t) * k) % ref.m]
            row[j] = acc % q
        out[idx] = row
    return out


# ----------------------------------------------------------- object bridges
def import_ciphertext(buf: bytes, ctx: FheContext) -> scheme.Ciphertext:
    parts = refserial.read_ciphertext(buf)
    from .context import ints_to_limbs
    # reference coefficients are in [0, q) (Reduce-positive before export);
    # they fit the narrow ciphertext width as nonnegative two's complement
    arr = np.stack([
        ints_to_limbs((part + [0] * (ctx.phim - len(part)))[:ctx.phim],
                      ctx.n_limbs_ct)
        for part in parts])
    return scheme.Ciphertext(ctx, parts=jnp.asarray(arr))


def export_ciphertext(ct: scheme.Ciphertext) -> bytes:
    ct = ct.relinearized_view()
    return refserial.write_ciphertext(ct.to_python_parts())


def import_public_key(buf: bytes, ref: refserial.RefContext,
                      ctx: FheContext) -> scheme.FhePublicKey:
    """FHESIPubKey::Import (FHE-SI.cpp:72-78): vector<DoubleCRT> in the
    reference basis -> FhePublicKey with exact re-basing.

    The imported coefficients are re-reduced to the signed representative
    in [-q/2, q/2) (the library invariant for n_ct-width parts).  Encrypt
    outputs are unchanged by the representative choice: pk -> pk + t*q
    shifts pk*r + p*e by t*q*r, which the final Reduce mod 2^logQ
    erases exactly."""
    from .context import ints_to_limbs
    dcrts = refserial.read_key(buf)
    dev = device_context(ctx)
    q = ctx.q
    rows = []
    for d in dcrts:
        poly = dcrt_to_poly(d, ref, ctx)
        half = q // 2
        red = [((v % q) - q if (v % q) >= half else (v % q)) for v in poly]
        rows.append(ints_to_limbs(red, ctx.n_limbs_ct))
    pk_limbs = jnp.asarray(np.stack(rows))
    return scheme.FhePublicKey(ctx, dev.from_poly(pk_limbs), pk_limbs)


def export_public_key(pk: scheme.FhePublicKey,
                      ref: refserial.RefContext) -> bytes:
    """FHESIPubKey::Export (FHE-SI.cpp:72-78) in the reference basis."""
    ctx = pk.ctx
    arr = np.asarray(pk.pk_limbs)
    dcrts = []
    for i in range(arr.shape[0]):
        poly = _limbs_rows_to_ints(arr[i])
        dcrts.append(poly_to_dcrt(poly, ref, ctx))
    return refserial.write_key(dcrts)


def import_keyswitch(buf: bytes, ref: refserial.RefContext,
                     ctx: FheContext) -> scheme.KeySwitch:
    """KeySwitchSI::Import (FHE-SI.cpp:270-276): the 2 x K matrix of
    DoubleCRTs, re-based exactly and re-reduced to the signed
    representative (the derived ksw bound assumes |M| <= q/2; keyswitch
    outputs are invariant to the representative because the final Reduce
    mod 2^logQ erases q-multiples of the digit dot)."""
    from .context import MAX_KSW_PARTS, ints_to_limbs
    rows = refserial.read_keyswitch(buf)
    assert len(rows) == 2, "keyswitch matrix must have 2 rows"
    K = len(rows[0])
    if K > MAX_KSW_PARTS * ctx.ndigits:
        raise ValueError(
            f"imported keyswitch matrix has {K} columns; the subset basis "
            f"is provisioned for MAX_KSW_PARTS={MAX_KSW_PARTS} parts "
            f"({MAX_KSW_PARTS * ctx.ndigits} columns)")
    dev = device_context(ctx)
    q, half = ctx.q, ctx.q // 2
    limbs = np.empty((2, K, ctx.phim, ctx.n_limbs_ct), dtype=np.int32)
    for i in range(2):
        for k in range(K):
            poly = dcrt_to_poly(rows[i][k], ref, ctx)
            red = [((v % q) - q if (v % q) >= half else (v % q))
                   for v in poly]
            limbs[i, k] = ints_to_limbs(red, ctx.n_limbs_ct)
    matrix_evals = dev.from_poly(jnp.asarray(limbs))
    return scheme.KeySwitch(ctx, matrix_evals)


def export_keyswitch(ksw: scheme.KeySwitch,
                     ref: refserial.RefContext) -> bytes:
    """KeySwitchSI::Export (FHE-SI.cpp:270-276) in the reference basis.
    Matrix entries are reduce_signed representatives (|v| <= q/2), so the
    full-chain toPoly reconstruction is trivially exact."""
    ctx = ksw.ctx
    dev = device_context(ctx)
    limbs = np.asarray(dev.to_poly(ksw.matrix_evals))
    out = []
    for i in range(limbs.shape[0]):
        row = []
        for k in range(limbs.shape[1]):
            poly = _limbs_rows_to_ints(limbs[i, k])
            row.append(poly_to_dcrt(poly, ref, ctx))
        out.append(row)
    return refserial.write_keyswitch(out)


def export_ciphertext_matrix(mat) -> bytes:
    """Matrix<Ciphertext> app state (Regression/Statistics blocks) in the
    reference's templated Matrix framing (Serialization.h:58-81):
    ciphertexts are ScaleDown'd before export (Serialization.cpp:109-114
    semantics, via relinearized_view)."""
    rows = []
    for r in range(mat.num_rows()):
        row = []
        for c in range(mat.num_cols()):
            row.append(mat.at(r, c).relinearized_view().to_python_parts())
        rows.append(row)
    return refserial.write_ciphertext_matrix(rows)


def import_ciphertext_matrix(buf: bytes, ctx: FheContext):
    """Inverse of export_ciphertext_matrix -> apps.matrix.Matrix of
    scheme.Ciphertext."""
    from .apps.matrix import Matrix
    from .context import ints_to_limbs
    rows = refserial.read_ciphertext_matrix(buf)
    out = []
    for row in rows:
        out_row = []
        for parts in row:
            arr = np.stack([
                ints_to_limbs((part + [0] * (ctx.phim - len(part)))[:ctx.phim],
                              ctx.n_limbs_ct)
                for part in parts])
            out_row.append(scheme.Ciphertext(ctx, parts=jnp.asarray(arr)))
        out.append(out_row)
    return Matrix(out)


def import_secret_key(buf: bytes, ref: refserial.RefContext,
                      ctx: FheContext) -> scheme.FheSecretKey:
    dcrts = refserial.read_key(buf)
    dev = device_context(ctx)
    evals = []
    for d in dcrts:
        poly = dcrt_to_poly(d, ref, ctx)
        from .context import ints_to_limbs
        # centered values from the reference basis can exceed the narrow
        # ct width; size the limbs to the actual coefficients
        need = max((abs(v).bit_length() for v in poly), default=1) + 2
        nw = min(max(ctx.n_limbs_ct, (need + 15) // 16), ctx.n_limbs)
        limbs = jnp.asarray(ints_to_limbs(poly, nw))
        evals.append(dev.from_poly(limbs))
    return scheme.FheSecretKey(ctx, jnp.stack(evals))


def export_secret_key(sk: scheme.FheSecretKey,
                      ref: refserial.RefContext) -> bytes:
    ctx = sk.ctx
    dev = device_context(ctx)
    dcrts = []
    for i in range(sk.sk_evals.shape[0]):
        limbs = dev.to_poly(sk.sk_evals[i])
        poly = [int(v) for v in _limbs_rows_to_ints(np.asarray(limbs))]
        dcrts.append(poly_to_dcrt(poly, ref, ctx))
    return refserial.write_key(dcrts)


def _limbs_rows_to_ints(limbs: np.ndarray) -> list[int]:
    from .context import limbs_to_int
    return [limbs_to_int(limbs[j]) for j in range(limbs.shape[0])]


def export_reference_context(ctx: FheContext,
                             chain: list[tuple[int, int]] | None = None
                             ) -> bytes:
    """Write an SI-context stream.  With chain=None, exports OUR device
    chain (q, root-of-order-m) — readable by this library; to target the
    actual reference binaries pass a chain of NTL-sized primes with 2m-th
    roots, as they assert p % 2m == 1 (FHEContext.cpp:30-43)."""
    if chain is None:
        chain = [(int(q), int(r))
                 for q, r in zip(ctx.primes, ctx.roots)]
    return refserial.write_context(refserial.RefContext(
        ctx.m, ctx.log_q, ctx.p, ctx.generator, ctx.decomp_size, chain))
