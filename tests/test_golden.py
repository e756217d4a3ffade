import numpy as np
import pytest

from spgemm_tpu.models.csr import CSR
from spgemm_tpu.ops import golden


ALGOS = [
    golden.spgemm_spa_bitflag,
    golden.spgemm_dense_row,
    golden.spgemm_esc,
    golden.spgemm_scipy,
]


@pytest.mark.parametrize("algo", ALGOS)
def test_against_dense_matmul(make_random_csr, algo):
    a = make_random_csr(50, 40, 0.1, integer_vals=False)
    b = make_random_csr(40, 60, 0.1, integer_vals=False)
    c = algo(a, b)
    np.testing.assert_allclose(
        c.to_dense(), a.to_dense() @ b.to_dense(), rtol=1e-12
    )


@pytest.mark.parametrize("algo", ALGOS[:3])
def test_mutual_agreement(make_random_csr, algo):
    a = make_random_csr(64, 64, 0.08)
    c_ref = golden.spgemm_scipy(a, a)
    c = algo(a, a)
    # scipy prunes explicit zeros; ours keep structural zeros
    assert golden.drop_explicit_zeros(c).allclose(c_ref, rtol=1e-12)


def test_structural_zeros_kept(make_random_csr):
    # +1 / -1 cancellation: the entry must stay structurally present
    a = CSR.from_dense(np.array([[1.0, -1.0], [0.0, 0.0]]))
    b = CSR.from_dense(np.array([[1.0, 0.0], [1.0, 0.0]]))
    for algo in ALGOS[:3]:
        c = algo(a, b)
        assert c.nnz == 1  # C[0,0] = 1 - 1 = 0, structural
        assert c.data[0] == 0.0


def test_empty_product():
    a = CSR.from_coo(np.zeros(0), np.zeros(0), np.zeros(0), (8, 8))
    for algo in ALGOS:
        c = algo(a, a)
        assert c.nnz == 0 and c.shape == (8, 8)


def test_rectangular_chain(make_random_csr):
    a = make_random_csr(30, 50, 0.1, integer_vals=False)
    b = make_random_csr(50, 20, 0.15, integer_vals=False)
    for algo in ALGOS:
        np.testing.assert_allclose(
            algo(a, b).to_dense(), a.to_dense() @ b.to_dense(), rtol=1e-12
        )


def test_rows_match_oracle(make_random_csr):
    from spgemm_tpu.ops.golden import rows_match_oracle, spgemm_scipy

    a = make_random_csr(80, 80, 0.08)
    c = spgemm_scipy(a, a)
    rows = np.array([0, 3, 17, 42, 79])
    assert rows_match_oracle(c, a, a, rows)
    bad = c.data.copy()
    # corrupt a value inside a sampled row
    lo, hi = int(c.indptr[17]), int(c.indptr[18])
    if hi > lo:
        bad[lo] += 1.0
        from spgemm_tpu.models.csr import CSR
        cbad = CSR(c.indptr, c.indices, bad, c.shape)
        assert not rows_match_oracle(cbad, a, a, rows)
