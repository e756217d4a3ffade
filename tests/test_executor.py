"""Device-resident executor (ops/executor.py)."""

import numpy as np
import pytest

from spgemm_tpu.models.tile import csr_to_tiles
from spgemm_tpu.ops import golden
from spgemm_tpu.ops.executor import StripExecutor


def test_executor_run_compact(make_random_csr):
    a = make_random_csr(90, 90, 0.07)
    at = csr_to_tiles(a, 8, 16)
    bt = csr_to_tiles(a, 16, 16)
    ex = StripExecutor(at, bt, block_rows=4)
    ref = golden.spgemm_dense_row(a, a)
    for _ in range(2):  # repeated dispatch, resident operands
        c = ex.run_compact().to_csr()
        assert c.pattern_equal(ref)
        np.testing.assert_allclose(c.data, ref.data, rtol=1e-5)


def test_executor_update_values(make_random_csr, rng):
    a = make_random_csr(64, 64, 0.08)
    at = csr_to_tiles(a, 8, 16)
    bt = csr_to_tiles(a, 16, 16)
    ex = StripExecutor(at, bt, block_rows=4)
    ex.run_compact()

    # same pattern, new values
    a2 = a.copy_with_values(rng.integers(1, 9, a.nnz).astype(np.float64)) \
        if hasattr(a, "copy_with_values") else None
    if a2 is None:
        from spgemm_tpu.models.csr import CSR
        a2 = CSR(a.indptr, a.indices,
                 rng.integers(1, 9, a.nnz).astype(np.float64), a.shape)
    at2 = csr_to_tiles(a2, 8, 16)
    ex.update_values(at2)
    # NB: B still holds the old values — compare against A2 @ A1
    ref = golden.spgemm_dense_row(a2, a)
    c = ex.run_compact().to_csr()
    assert c.pattern_equal(ref)
    np.testing.assert_allclose(c.data, ref.data, rtol=1e-5)

    # structure mismatch rejected
    a3 = make_random_csr(64, 64, 0.2)
    with pytest.raises(ValueError, match="same tile structure"):
        ex.update_values(csr_to_tiles(a3, 8, 16))


def test_time_numeric(make_random_csr):
    a = make_random_csr(64, 64, 0.1)
    at = csr_to_tiles(a, 8, 16)
    bt = csr_to_tiles(a, 16, 16)
    ex = StripExecutor(at, bt, block_rows=4)
    ms, rtt = ex.time_numeric(loop=2, repeats=1)
    assert ms >= 0 and rtt >= 0
