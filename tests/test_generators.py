"""Synthetic matrix generators (spgemm_tpu.utils.generators) — shape,
determinism, and regime sanity."""

import numpy as np

from spgemm_tpu.utils.generators import (banded, block_diag, power_law,
                                         random_uniform, rmat)


def test_shapes_and_determinism():
    for gen, kw in [(banded, dict(band=4)), (block_diag, {}),
                    (random_uniform, {}), (power_law, {}), (rmat, {})]:
        a = gen(np.random.default_rng(3), 256, **kw)
        b = gen(np.random.default_rng(3), 256, **kw)
        assert a.shape == (256, 256)
        assert a.nnz > 0
        assert a.nnz == b.nnz
        assert np.array_equal(a.indices, b.indices)
        # CSR invariants
        assert a.indptr[0] == 0 and a.indptr[-1] == a.nnz
        assert (np.diff(a.indptr) >= 0).all()


def test_regimes():
    rng = np.random.default_rng(5)
    bd = banded(rng, 512, 8)
    assert (np.abs(bd.rows_expanded() - bd.indices) <= 8).all()
    rm = rmat(rng, 512, 8)
    deg = np.diff(rm.indptr)
    # scale-free: the max degree dwarfs the mean
    assert deg.max() > 8 * max(1, deg.mean())
    pl = power_law(rng, 512)
    assert np.diff(pl.indptr).max() > 32


def test_rmat_values_ones():
    a = rmat(np.random.default_rng(1), 128, 4, values="ones")
    # duplicate edges sum, so values are positive integers
    assert (a.data >= 1).all()
    assert np.array_equal(a.data, np.round(a.data))
