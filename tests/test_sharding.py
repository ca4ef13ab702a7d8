"""Multi-device SPMD: sharded batched mul+relin on the 8-device CPU mesh
must be bit-identical to the single-device result."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_si_tpu import sampling, scheme
from fhe_si_tpu.context import FheContext
from fhe_si_tpu.device import device_context
from fhe_si_tpu.ops import limbs as lb
from fhe_si_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ctx = FheContext(m=22, log_q=80, p=23, generator=7, num_primes_multiple=2)
    dev = device_context(ctx)
    src = sampling.RandomSource(7)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    cts = [pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)),
                      src) for _ in range(8)]
    return ctx, dev, sk, ksw, cts


def test_sharded_equals_single(setup):
    ctx, dev, sk, ksw, cts = setup
    a = jnp.stack([c.parts for c in cts[:4]])
    b = jnp.stack([c.parts for c in cts[4:]])

    # single-device reference: batched op + block reduce
    out_single = dev.batched_mul_relin_op(a, b, ksw.matrix_evals)
    acc = out_single[0]
    for i in range(1, 4):
        acc = dev.reduce_signed(lb.add(acc, out_single[i]))

    m = pmesh.make_mesh(n_dp=4, n_limb=2)
    step = pmesh.sharded_mul_relin(dev, m)
    a_sh = pmesh.shard_batched_parts(m, a)
    b_sh = pmesh.shard_batched_parts(m, b)
    mat_sh = jax.device_put(ksw.matrix_evals, pmesh.limb_sharding(m, 2, 4))
    out_sharded = step(a_sh, b_sh, mat_sh)

    assert np.array_equal(np.asarray(acc), np.asarray(out_sharded))

    # and it decrypts to the sum of the products
    ct = scheme.Ciphertext(ctx, parts=out_sharded)
    got = sk.decrypt(ct).message
    from fhe_si_tpu.hostmath import oracle
    want = np.zeros(ctx.phim, dtype=np.int64)
    for x, y in zip(cts[:4], cts[4:]):
        mx = sk.decrypt(x).message
        my = sk.decrypt(y).message
        want = (want + oracle.plaintext_mul(ctx, mx, my)) % ctx.p
    assert np.array_equal(np.asarray(got), want)


def test_shard_map_pipeline_bit_exact(setup):
    """The explicit shard_map pipeline (psum'd CRT partials) must be
    bit-identical to the single-device batched op."""
    from fhe_si_tpu.parallel.shard import ShardedPipelines

    ctx, dev, sk, ksw, cts = setup
    a = jnp.stack([c.parts for c in cts[:4]])
    b = jnp.stack([c.parts for c in cts[4:]])
    want = np.asarray(dev.batched_mul_relin_op(a, b, ksw.matrix_evals))

    m = pmesh.make_mesh(n_dp=4, n_limb=2)
    sp = ShardedPipelines(dev, m)
    fn = sp.batched_mul_relin()
    a_sh = pmesh.shard_batched_parts(m, a)
    b_sh = pmesh.shard_batched_parts(m, b)
    mat_sh = jax.device_put(ksw.matrix_evals, pmesh.limb_sharding(m, 2, 4))
    got = np.asarray(fn(a_sh, b_sh, mat_sh))
    assert np.array_equal(got, want)

    # block-reduce variant == chained single-device adds
    acc = want[0]
    for i in range(1, 4):
        acc = np.asarray(dev.reduce_signed(lb.add(jnp.asarray(acc),
                                                  jnp.asarray(want[i]))))
    red = sp.mul_relin_block_reduce()
    got_red = np.asarray(red(a_sh, b_sh, mat_sh))
    assert np.array_equal(got_red, acc)


def test_limb_sharded_elementwise(setup):
    """Residue tensors shard over the prime axis with zero collectives for
    elementwise ops."""
    ctx, dev, sk, ksw, cts = setup
    m = pmesh.make_mesh(n_dp=4, n_limb=2)
    ev = dev.from_poly(cts[0].parts)                  # [2, L, phim]
    sharding = pmesh.limb_sharding(m, 1, 3)
    ev_sh = jax.device_put(ev, sharding)
    from fhe_si_tpu.ops import modular
    f = jax.jit(lambda x: modular.mod_mul(x, x, dev.q, dev.qinv_f),
                in_shardings=sharding, out_shardings=sharding)
    out = f(ev_sh)
    want = modular.mod_mul(ev, ev, dev.q, dev.qinv_f)
    assert np.array_equal(np.asarray(out), np.asarray(want))


def test_coeff_sharded_pipeline_bit_exact(setup):
    """The FULL mul+relin pipeline with phi(m) sharded over 'coeff'
    (dp=4 x coeff=2 mesh) must be bit-identical to the single-device
    batched op — the sequence-parallel analog plumbed end-to-end."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fhe_si_tpu.parallel.shard import CoeffShardedPipelines

    ctx, dev, sk, ksw, cts = setup
    a = jnp.stack([c.parts for c in cts[:4]])
    b = jnp.stack([c.parts for c in cts[4:]])
    want = np.asarray(dev.batched_mul_relin_op(a, b, ksw.matrix_evals))

    m = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ('dp', 'coeff'))
    cp = CoeffShardedPipelines(dev, m)
    fn = cp.batched_mul_relin()
    sh = NamedSharding(m, P('dp', None, 'coeff', None))
    a_sh = jax.device_put(a, sh)
    b_sh = jax.device_put(b, sh)
    mat_sh = jax.device_put(ksw.matrix_evals,
                            NamedSharding(m, P(None, None, None, 'coeff')))
    got = np.asarray(fn(a_sh, b_sh, mat_sh))
    assert np.array_equal(got, want)


def test_ct_coeff_sharded_ntt_bit_exact():
    """The two-level Cooley-Tukey NTT with phi(m) sharded over 'coeff'
    (2 psums per transform: one per contracted factor) must match the
    single-device CT transform bit-for-bit, forward and inverse."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from fhe_si_tpu.parallel.shard import ct_coeff_sharded_ntt, make_coeff_mesh

    ctx = FheContext(m=256, log_q=80, p=257, generator=3)
    dev = device_context(ctx)
    assert dev.use_ct and dev.ct_split == (16, 8)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.integers(0, ctx.primes[:, None],
                                 size=(5, ctx.num_primes, ctx.phim)),
                    jnp.int32)
    m = make_coeff_mesh(8)
    sh = jax.sharding.NamedSharding(
        m, jax.sharding.PartitionSpec(None, None, 'coeff'))
    ev_want = np.asarray(dev.ntt_fwd(x))
    got = np.asarray(ct_coeff_sharded_ntt(dev, m, True)(
        jax.device_put(x, sh)))
    assert np.array_equal(got, ev_want)
    inv_want = np.asarray(dev.ntt_inv(jnp.asarray(ev_want)))
    got_inv = np.asarray(ct_coeff_sharded_ntt(dev, m, False)(
        jax.device_put(jnp.asarray(ev_want), sh)))
    assert np.array_equal(got_inv, inv_want)
    assert np.array_equal(got_inv, np.asarray(x))


def test_coeff_sharded_ntt_bit_exact(setup):
    """phi(m)-axis sharded NTT (psum of Karatsuba shift groups) must equal
    the single-device transform bit-for-bit, forward and inverse."""
    from fhe_si_tpu.parallel.shard import coeff_sharded_ntt, make_coeff_mesh
    from fhe_si_tpu.ops import ntt

    ctx, dev, sk, ksw, cts = setup
    assert ctx.phim % 2 == 0
    m = make_coeff_mesh(2)
    x = jnp.stack([dev.from_poly(c.parts) for c in cts[:3]])  # [3,2,L,phim]
    x = x.reshape(-1, dev.L, ctx.phim) % jnp.asarray(dev.q)   # valid residues
    for forward in (True, False):
        key = 'fwd_chunks' if forward else 'inv_chunks'
        want = np.asarray(ntt.modmatmul(dev.C[key], x, dev.q, dev.qinv_f))
        x_sh = jax.device_put(
            x, jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec(
                None, None, 'coeff')))
        got = np.asarray(coeff_sharded_ntt(dev, m, forward)(x_sh))
        assert np.array_equal(got, want)


@pytest.fixture(scope="module")
def ct_setup():
    """Power-of-two-m (CT transform family) context + keys for the
    sharded full-pipeline tests — the round-4 verdict's item 2: the
    scaling family must shard, not just the dense toy."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ctx = FheContext(m=256, log_q=80, p=257, generator=3,
                     num_primes_multiple=2)
    dev = device_context(ctx)
    assert dev.use_ct
    src = sampling.RandomSource(21)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    cts = [pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)),
                      src) for _ in range(8)]
    return ctx, dev, sk, ksw, cts


def test_ct_limb_sharded_pipeline_bit_exact(ct_setup):
    """CT-family FULL mul+relin with the CRT prime axis sharded over
    'limb' (dp=4 x limb=2): every transform is per-prime local, the only
    collectives are the CRT-partial psums — bit-identical to the
    single-device batched op."""
    from fhe_si_tpu.parallel.shard import ShardedPipelines
    from jax.sharding import Mesh

    ctx, dev, sk, ksw, cts = ct_setup
    a = jnp.stack([c.parts for c in cts[:4]])
    b = jnp.stack([c.parts for c in cts[4:]])
    want = np.asarray(dev.batched_mul_relin_op(a, b, ksw.matrix_evals))

    m = pmesh.make_mesh(n_dp=4, n_limb=2)
    sp = ShardedPipelines(dev, m)
    fn = sp.batched_mul_relin()
    a_sh = pmesh.shard_batched_parts(m, a)
    b_sh = pmesh.shard_batched_parts(m, b)
    mat_sh = jax.device_put(ksw.matrix_evals, pmesh.limb_sharding(m, 2, 4))
    got = np.asarray(fn(a_sh, b_sh, mat_sh))
    assert np.array_equal(got, want)


def test_ct_coeff_sharded_pipeline_bit_exact(ct_setup):
    """CT-family FULL mul+relin with phi(m) sharded over 'coeff'
    (dp=2 x coeff=4): stage-wise group psums inside every transform
    (2/transform), everything else per-coefficient local — bit-identical
    to the single-device batched op.  This is the regime that matters:
    only the CT family reaches the phim where sequence-splitting pays."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fhe_si_tpu.parallel.shard import CoeffShardedPipelines

    ctx, dev, sk, ksw, cts = ct_setup
    a = jnp.stack([c.parts for c in cts[:2]])
    b = jnp.stack([c.parts for c in cts[2:4]])
    want = np.asarray(dev.batched_mul_relin_op(a, b, ksw.matrix_evals))

    m = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ('dp', 'coeff'))
    cp = CoeffShardedPipelines(dev, m)
    fn = cp.batched_mul_relin()
    sh = NamedSharding(m, P('dp', None, 'coeff', None))
    a_sh = jax.device_put(a, sh)
    b_sh = jax.device_put(b, sh)
    mat_sh = jax.device_put(ksw.matrix_evals,
                            NamedSharding(m, P(None, None, None, 'coeff')))
    got = np.asarray(fn(a_sh, b_sh, mat_sh))
    assert np.array_equal(got, want)
