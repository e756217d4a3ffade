"""Pallas kernel tests (interpret mode on the CPU test platform)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_tpu.models.tile import csr_to_tiles
from spgemm_tpu.ops import golden
from spgemm_tpu.ops.spgemm import spgemm, spgemm_csr


def test_pallas_backend_matches_xla(make_random_csr):
    a = make_random_csr(120, 120, 0.04)
    c_x, _ = spgemm_csr(a, backend="xla")
    c_p, _ = spgemm_csr(a, backend="pallas")
    assert c_x.pattern_equal(c_p)
    np.testing.assert_allclose(c_x.data, c_p.data, rtol=1e-6)


def test_pallas_vs_oracle(make_random_csr):
    a = make_random_csr(90, 70, 0.06)
    b = make_random_csr(70, 110, 0.06)
    c, _ = spgemm_csr(a, b, backend="pallas")
    ref = golden.spgemm_dense_row(a, b)
    assert c.pattern_equal(ref)
    np.testing.assert_allclose(c.data, ref.data, rtol=1e-6)


def test_pallas_empty_segments(make_random_csr):
    # C tiles whose pair list produces no products must come out zero
    from spgemm_tpu.models.csr import CSR

    a = CSR.from_coo([0], [0], [1.0], (4, 4))
    b = CSR.from_coo([1], [1], [1.0], (4, 4))
    at, bt = csr_to_tiles(a, 2, 2), csr_to_tiles(b, 2, 2)
    res = spgemm(at, bt, backend="pallas")
    assert res.c.nt == 0


def test_pallas_rejects_fp64(make_random_csr):
    a = make_random_csr(32, 32, 0.1)
    with pytest.raises(ValueError, match="float64"):
        spgemm_csr(a, backend="pallas", compute_dtype=jnp.float64)


def test_strip_backend_matches_oracle(make_random_csr):
    a = make_random_csr(150, 150, 0.04)
    c_s, res = spgemm_csr(a, backend="strip")
    ref = golden.spgemm_dense_row(a, a)
    assert c_s.pattern_equal(ref)
    np.testing.assert_allclose(c_s.data, ref.data, rtol=1e-6)


def test_strip_backend_rectangular(make_random_csr):
    a = make_random_csr(100, 70, 0.06)
    b = make_random_csr(70, 120, 0.06)
    c_s, _ = spgemm_csr(a, b, backend="strip", tm=16, tn=16)
    ref = golden.spgemm_dense_row(a, b)
    assert c_s.pattern_equal(ref)
    np.testing.assert_allclose(c_s.data, ref.data, rtol=1e-6)


def test_strip_backend_cancellation():
    from spgemm_tpu.models.csr import CSR
    from spgemm_tpu.ops.spgemm import spgemm

    a = CSR.from_dense(np.array([[1.0, -1.0], [0.0, 2.0]]))
    b = CSR.from_dense(np.array([[1.0, 0.0], [1.0, 0.0]]))
    at, bt = csr_to_tiles(a, 2, 2), csr_to_tiles(b, 2, 2)
    res = spgemm(at, bt, backend="strip")
    ref = golden.spgemm_dense_row(a, b)
    got = res.c.to_csr()
    assert got.pattern_equal(ref)
    np.testing.assert_allclose(got.data, ref.data)
