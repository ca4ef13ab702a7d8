"""End-to-end application workloads vs plaintext oracles (small config)."""
import numpy as np
import pytest

from fhe_si_tpu import sampling
from fhe_si_tpu.apps import regression as reg
from fhe_si_tpu.apps import statistics as st
from fhe_si_tpu.apps.matrix import Matrix
from fhe_si_tpu.cli import gen_data
from fhe_si_tpu.context import FheContext


def test_matrix_over_ints():
    m = Matrix([[1, 2], [3, 4]])
    assert (m @ m).rows == [[7, 10], [15, 22]]
    assert m.transpose().at(0, 1) == 3
    mt = m.mult_by_transpose()
    assert mt.rows == [[5, 11], [11, 25]]
    adj, det = m.invert()
    assert det == -2
    assert adj.rows == [[4, -2], [-3, 1]]
    # 3x3 determinant
    m3 = Matrix([[2, 0, 1], [1, 3, 2], [1, 1, 1]])
    assert m3.determinant() == 2 * (3 - 2) - 0 + 1 * (1 - 3)
    v = m.mul_vector([1, 1])
    assert v.rows == [[3], [7]]
    assert (m - Matrix([[1, 1], [1, 1]])).rows == [[0, 1], [2, 3]]


def test_matrix_concatenate():
    """Row-wise append semantics of Matrix<T>::Concatenate
    (Matrix.cpp:294-298), including a transposed source."""
    a = Matrix([[1, 2], [3, 4]])
    b = Matrix([[5, 6], [7, 8]])
    c = a.concatenate(b)
    assert c.rows == [[1, 2], [3, 4], [5, 6], [7, 8]]
    assert a.rows == [[1, 2], [3, 4]]  # functional: source untouched
    # a transposed source is read through its logical (i, j) view
    ct = a.concatenate(b.transpose())
    assert ct.rows == [[1, 2], [3, 4], [5, 7], [6, 8]]
    with pytest.raises(AssertionError):
        a.transpose().concatenate(b)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_invert_batched_matches_invert(n):
    """invert_batched over plain ints == the recursive adjugate invert
    (Matrix.cpp:182-263 semantics) for every supported dimension."""
    rng = np.random.default_rng(n)
    m = Matrix(rng.integers(-9, 10, size=(n, n)).tolist())
    adj_ref, det_ref = m.invert()

    def mul_many(pairs):
        return [a * b for a, b in pairs]

    def combine_signed(prods, signs, group):
        return [sum(s * v for s, v in zip(signs[i:i + group],
                                          prods[i:i + group]))
                for i in range(0, len(prods), group)]

    def negate_many(vals, signs):
        return [s * v for s, v in zip(signs, vals)]

    adj, det = m.invert_batched(mul_many, combine_signed,
                                lambda xs: xs, negate_many)
    assert det == det_ref
    assert adj.rows == adj_ref.rows


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "reg.txt")
    gen_data.generate(path, 2, 16, seed=5)
    return path


def test_regression_end_to_end(dataset):
    raw, labels, dim = reg.load_data(dataset)
    p, g = 23, 7
    log_q, xi = reg.derive_log_q(len(labels), dim, p)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g, xi=xi)

    theta_pt, det_pt = reg.regress_pt(raw, labels)

    model = reg.Regression(ctx, sampling.RandomSource(42))
    ptxt_data, ptxt_labels = reg.batch_data(ctx, raw, labels)
    model.add_data(ptxt_data, ptxt_labels)
    theta_enc, det_enc = model.regress()

    for ct, want in zip(theta_enc, theta_pt):
        got = int(model.secret_key.decrypt(ct).decode_slots()[0])
        assert got == want % p
    assert int(model.secret_key.decrypt(det_enc).decode_slots()[0]) == det_pt % p


def test_statistics_end_to_end(dataset):
    data, dim = st.load_data(dataset)
    p, g = 23, 7
    log_q, xi = st.derive_log_q(data.num_rows(), dim, p)
    ctx = FheContext(m=p - 1, log_q=log_q, p=p, generator=g, xi=xi)

    mean_pt = st.compute_nth_moment_pt(data, 1)
    cov_pt = st.compute_covariance_pt(data)
    n_rows = data.num_rows()

    stats = st.Statistics(ctx, sampling.RandomSource(42))
    blocks, sizes = st.batch_data(ctx, data)
    stats.add_data(blocks, sizes)
    cov_enc, mu_enc, n_enc, n2_enc = stats.compute_covariance()

    sk = stats.secret_key
    for ct, want in zip(mu_enc, mean_pt):
        assert int(sk.decrypt(ct).decode_slots()[0]) == want % p
    assert int(sk.decrypt(n_enc).decode_slots()[0]) == n_rows % p
    assert int(sk.decrypt(n2_enc).decode_slots()[0]) == (n_rows % p) ** 2 % p
    for i in range(cov_enc.num_rows()):
        for j in range(cov_enc.num_cols()):
            got = int(sk.decrypt(cov_enc.at(i, j)).decode_slots()[0])
            assert got == cov_pt.at(i, j) % p


def test_regression_block_merge(dataset):
    """nFiles-split data: sufficient statistics are additive across shards
    (README:78-84 'parallel execution' contract)."""
    raw, labels, dim = reg.load_data(dataset)
    half = raw.num_rows() // 2
    a = Matrix(raw.rows[:half])
    b = Matrix(raw.rows[half:])
    ta, _ = reg.regress_pt(a, labels[:half])
    full_t, full_d = reg.regress_pt(raw, labels)
    # additivity check at the sufficient-statistic level
    xtx_a = a.transpose().mult_by_transpose()
    xtx_b = b.transpose().mult_by_transpose()
    xtx = raw.transpose().mult_by_transpose()
    assert (xtx_a + xtx_b).rows == xtx.rows
