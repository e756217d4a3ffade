import numpy as np
import pytest

from spgemm_tpu.models.csr import CSR, flop_count_spgemm


def test_from_coo_dedup_and_sort():
    rows = np.array([2, 0, 0, 2, 1])
    cols = np.array([1, 3, 3, 0, 2])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    c = CSR.from_coo(rows, cols, vals, (3, 4))
    assert c.nnz == 4
    dense = c.to_dense()
    expect = np.zeros((3, 4))
    expect[0, 3] = 5.0  # duplicates summed
    expect[1, 2] = 5.0
    expect[2, 0] = 4.0
    expect[2, 1] = 1.0
    np.testing.assert_array_equal(dense, expect)
    # columns sorted within rows
    for i in range(3):
        row = c.indices[c.indptr[i] : c.indptr[i + 1]]
        assert np.all(np.diff(row) > 0)


def test_dense_roundtrip(make_random_csr):
    a = make_random_csr(37, 53, 0.1)
    b = CSR.from_dense(a.to_dense())
    assert a.allclose(b)


def test_transpose_roundtrip(make_random_csr):
    a = make_random_csr(40, 23, 0.15, integer_vals=False)
    att = a.transpose().transpose()
    assert a.allclose(att)
    np.testing.assert_allclose(a.transpose().to_dense(), a.to_dense().T)


def test_transpose_empty():
    a = CSR.from_coo(np.zeros(0), np.zeros(0), np.zeros(0), (5, 7))
    t = a.transpose()
    assert t.shape == (7, 5) and t.nnz == 0


def test_sequential_values():
    a = CSR.from_coo(
        np.array([0, 0, 1]), np.array([0, 1, 1]), np.ones(3), (2, 2)
    )
    s = a.with_sequential_values()
    np.testing.assert_array_equal(s.data, [0.0, 1.0, 2.0])


def test_flop_count():
    # A = [[1,1],[0,1]], B rows have lengths 2 and 1
    a = CSR.from_dense(np.array([[1.0, 1.0], [0.0, 1.0]]))
    b = CSR.from_dense(np.array([[1.0, 1.0], [0.0, 1.0]]))
    # nnzCub = len(row0)+len(row1) for A(0,:) + len(row1) for A(1,1) = 2+1+1
    assert flop_count_spgemm(a, b) == 4


def test_pattern_vs_value_equality(make_random_csr):
    a = make_random_csr(20, 20, 0.2)
    b = a.with_data(a.data + 1.0)
    assert a.pattern_equal(b)
    assert not a.allclose(b)
