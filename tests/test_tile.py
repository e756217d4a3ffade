import numpy as np
import pytest

from spgemm_tpu.models.csr import CSR
from spgemm_tpu.models.tile import TileMat, csr_to_tiles, tiles_to_csr


@pytest.mark.parametrize("tm,tn", [(16, 16), (16, 32), (8, 8), (32, 16), (5, 7)])
def test_roundtrip_random(make_random_csr, tm, tn):
    a = make_random_csr(100, 130, 0.05, integer_vals=False)
    t = csr_to_tiles(a, tm, tn)
    back = tiles_to_csr(t)
    assert a.allclose(back)


def test_roundtrip_ragged_edges(make_random_csr):
    # matrix dims not multiples of tile dims
    a = make_random_csr(37, 41, 0.2)
    t = csr_to_tiles(a, 16, 16)
    assert t.gm == 3 and t.gn == 3
    assert a.allclose(tiles_to_csr(t))


def test_empty_matrix():
    a = CSR.from_coo(np.zeros(0), np.zeros(0), np.zeros(0), (64, 64))
    t = csr_to_tiles(a, 16, 16)
    assert t.nt == 0 and t.nnz == 0
    assert tiles_to_csr(t).nnz == 0


def test_tile_structure_invariants(make_random_csr):
    a = make_random_csr(128, 128, 0.03)
    t = csr_to_tiles(a, 16, 16)
    # tiles sorted row-major, unique
    key = t.trow.astype(np.int64) * t.gn + t.tcol
    assert np.all(np.diff(key) > 0)
    # tptr consistent with trow
    assert np.array_equal(
        np.diff(t.tptr), np.bincount(t.trow, minlength=t.gm)
    )
    # per-tile nnz sums to nnz
    assert t.tnnz_ptr[-1] == t.nnz == a.nnz
    # intra-tile codes row-major sorted within each tile
    tid = t.tile_ids_expanded()
    for ti in range(min(t.nt, 50)):
        codes = t.rc[tid == ti]
        assert np.all(np.diff(codes) > 0)
    # rowptr diffs equal per-row counts
    counts = np.bincount(
        tid * t.tm + t.rc // t.tn, minlength=t.nt * t.tm
    ).reshape(t.nt, t.tm)
    assert np.array_equal(np.diff(t.rowptr, axis=1), counts)


def test_mask_matches_occupancy(make_random_csr):
    a = make_random_csr(80, 100, 0.08)
    for tn in (16, 32, 48, 64):
        t = csr_to_tiles(a, 16, tn)
        occ = t.occ()
        dense_pattern = (a.to_dense() != 0) | (a.to_dense() == 0)  # all stored
        # reconstruct global occupancy from per-tile occ
        got = np.zeros((t.gm * t.tm, t.gn * t.tn), dtype=np.uint8)
        for i in range(t.nt):
            r0, c0 = t.trow[i] * t.tm, t.tcol[i] * t.tn
            got[r0 : r0 + t.tm, c0 : c0 + t.tn] |= occ[i]
        expect = np.zeros_like(got)
        rows = a.rows_expanded()
        expect[rows, a.indices] = 1
        np.testing.assert_array_equal(got, expect)


def test_dense_blocks(make_random_csr):
    a = make_random_csr(64, 64, 0.1, integer_vals=False)
    t = csr_to_tiles(a, 16, 16)
    d = t.dense()
    ad = a.to_dense()
    for i in range(t.nt):
        r0, c0 = t.trow[i] * 16, t.tcol[i] * 16
        np.testing.assert_array_equal(d[i], ad[r0 : r0 + 16, c0 : c0 + 16])


def test_explicit_zero_is_structural():
    # a stored 0.0 must appear in mask/occ and survive the roundtrip
    a = CSR.from_coo(
        np.array([0, 1]), np.array([1, 2]), np.array([0.0, 5.0]), (4, 4),
        sum_duplicates=False,
    )
    t = csr_to_tiles(a, 4, 4)
    assert t.nnz == 2
    assert t.occ()[0, 0, 1] == 1
    back = tiles_to_csr(t)
    assert back.nnz == 2
    np.testing.assert_array_equal(back.data, [0.0, 5.0])


def test_csc_view(make_random_csr):
    a = make_random_csr(96, 96, 0.05)
    t = csr_to_tiles(a, 16, 16)
    cptr, perm = t.csc_view()
    assert cptr[-1] == t.nt
    for j in range(t.gn):
        ids = perm[cptr[j] : cptr[j + 1]]
        assert np.all(t.tcol[ids] == j)
        assert np.all(np.diff(t.trow[ids]) > 0)


def test_transpose_tiles(make_random_csr):
    a = make_random_csr(60, 90, 0.07, integer_vals=False)
    t = csr_to_tiles(a, 16, 32)
    tt = t.transpose_tiles()
    assert (tt.tm, tt.tn) == (32, 16)
    assert tt.shape == (90, 60)
    expect = a.transpose()
    assert expect.allclose(tiles_to_csr(tt))
    # structural: masks match a direct conversion of A^T
    direct = csr_to_tiles(expect, 32, 16)
    np.testing.assert_array_equal(tt.mask, direct.mask)
    np.testing.assert_array_equal(tt.rc, direct.rc)


def test_memory_model(make_random_csr):
    a = make_random_csr(128, 128, 0.05)
    t = csr_to_tiles(a, 16, 16)
    assert t.total_bytes() == sum(t.memory_bytes().values())
    assert t.total_bytes() > 0


def test_occ_matches_mask(make_random_csr):
    at = csr_to_tiles(make_random_csr(70, 90, 0.1), 16, 16)
    np.testing.assert_array_equal(at.occ(), at.occ_from_mask())
