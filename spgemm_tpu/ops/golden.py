"""Golden-model SpGEMM references (host, exact, fp64).

Re-implementations of the reference's three independent CPU algorithms —
used as oracles for every device path, with the improvement that we also
compare *values* (the reference's cuSPARSE check skips values,
`external/cusparse/spgemm_cusparse.h:282`):

* `spgemm_spa_bitflag`  — bit-flag sparse-accumulator symbolic pass
  (`src/spgemm_serialref_spa_new.h:7-105`): one uint32 flag word per 32
  columns, popcount for counts, bit-scan for sorted column emission.
* `spgemm_dense_row`    — dense-row accumulator numeric SpGEMM
  (`src/external/cusparse/spgemm_serialref_spa.h:7-119`).
* `spgemm_esc`          — expand / sort / compress
  (`src/external/cusparse/spgemm_serialref_esc.h:7-154`).
* `spgemm_scipy`        — scipy.sparse product, the stand-in for the
  reference's external cuSPARSE oracle (`spgemm_cusparse.h:99`).

All operate on / return `CSR` and keep C's explicit zeros (an entry is
structural if any a_ik * b_kj term exists, even when the sum cancels),
matching cuSPARSE/TileSpGEMM structural semantics.
"""

from __future__ import annotations

import numpy as np

from spgemm_tpu.models.csr import CSR, INDEX_DTYPE


def _check_dims(a: CSR, b: CSR) -> None:
    if a.n != b.m:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")


def spgemm_spa_bitflag(a: CSR, b: CSR) -> CSR:
    """Bit-flag SPA: symbolic pattern via 32-wide flag words, then a dense
    accumulator pass for values. Vectorized per row with NumPy bit ops."""
    _check_dims(a, b)
    m, n = a.m, b.n
    nwords = n // 32 + 1
    indptr = np.zeros(m + 1, dtype=INDEX_DTYPE)
    out_cols: list[np.ndarray] = []
    out_vals: list[np.ndarray] = []
    acc = np.zeros(n, dtype=np.float64)
    for i in range(m):
        ks = a.indices[a.indptr[i] : a.indptr[i + 1]]
        flags = np.zeros(nwords, dtype=np.uint32)
        acc[:] = 0.0
        for k, av in zip(ks, a.data[a.indptr[i] : a.indptr[i + 1]]):
            cols = b.indices[b.indptr[k] : b.indptr[k + 1]]
            np.bitwise_or.at(
                flags, cols // 32, np.uint32(1) << (cols % 32).astype(np.uint32)
            )
            acc[cols] += av * b.data[b.indptr[k] : b.indptr[k + 1]]
        # emit set bits in ascending column order (bit-scan, vectorized)
        shifts = np.arange(32, dtype=np.uint32)
        bits = ((flags[:, None] >> shifts) & 1).astype(bool).reshape(-1)[:n]
        cols_i = np.flatnonzero(bits).astype(INDEX_DTYPE)
        indptr[i + 1] = indptr[i] + cols_i.size
        out_cols.append(cols_i)
        out_vals.append(acc[cols_i].copy())
    indices = (
        np.concatenate(out_cols) if out_cols else np.zeros(0, INDEX_DTYPE)
    )
    data = np.concatenate(out_vals) if out_vals else np.zeros(0)
    return CSR(indptr, indices, data, (m, n))


def spgemm_dense_row(a: CSR, b: CSR) -> CSR:
    """Dense-row accumulator: per output row, a width-n value array plus a
    boolean structural-flag array (two-pass count/fill collapsed into one
    vectorized pass per row)."""
    _check_dims(a, b)
    m, n = a.m, b.n
    indptr = np.zeros(m + 1, dtype=INDEX_DTYPE)
    out_cols: list[np.ndarray] = []
    out_vals: list[np.ndarray] = []
    acc = np.zeros(n, dtype=np.float64)
    flag = np.zeros(n, dtype=bool)
    for i in range(m):
        lo, hi = a.indptr[i], a.indptr[i + 1]
        acc[:] = 0.0
        flag[:] = False
        for k, av in zip(a.indices[lo:hi], a.data[lo:hi]):
            cols = b.indices[b.indptr[k] : b.indptr[k + 1]]
            acc[cols] += av * b.data[b.indptr[k] : b.indptr[k + 1]]
            flag[cols] = True
        cols_i = np.flatnonzero(flag).astype(INDEX_DTYPE)
        indptr[i + 1] = indptr[i] + cols_i.size
        out_cols.append(cols_i)
        out_vals.append(acc[cols_i].copy())
    indices = (
        np.concatenate(out_cols) if out_cols else np.zeros(0, INDEX_DTYPE)
    )
    data = np.concatenate(out_vals) if out_vals else np.zeros(0)
    return CSR(indptr, indices, data, (m, n))


def spgemm_esc(a: CSR, b: CSR) -> CSR:
    """Expand-sort-compress, fully vectorized: expand all nnzCub partial
    products, lexsort by (row, col), segmented-sum equal keys."""
    _check_dims(a, b)
    m, n = a.m, b.n
    blen = (b.indptr[1:] - b.indptr[:-1]).astype(np.int64)
    counts = blen[a.indices]  # products contributed per A nonzero
    total = int(counts.sum())
    if total == 0:
        return CSR(np.zeros(m + 1, INDEX_DTYPE), np.zeros(0, INDEX_DTYPE),
                   np.zeros(0), (m, n))
    a_rows = a.rows_expanded()
    rows = np.repeat(a_rows, counts)
    reps = np.repeat(b.indptr[a.indices].astype(np.int64), counts)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    bpos = reps + offs
    cols = b.indices[bpos].astype(np.int64)
    vals = np.repeat(a.data, counts) * b.data[bpos]
    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    key, vals = key[order], vals[order]
    uniq = np.empty(total, dtype=bool)
    uniq[0] = True
    np.not_equal(key[1:], key[:-1], out=uniq[1:])
    seg = np.cumsum(uniq) - 1
    out_vals = np.zeros(int(seg[-1]) + 1)
    np.add.at(out_vals, seg, vals)
    ukey = key[uniq]
    out_rows = ukey // n
    out_cols = (ukey % n).astype(INDEX_DTYPE)
    indptr = np.zeros(m + 1, dtype=INDEX_DTYPE)
    np.cumsum(np.bincount(out_rows, minlength=m), out=indptr[1:])
    return CSR(indptr, out_cols, out_vals, (m, n))


def spgemm_scipy(a: CSR, b: CSR) -> CSR:
    """scipy.sparse oracle (the cuSPARSE analogue). Note scipy prunes
    explicit zeros in C, so pattern comparisons against tiled results must
    go through `canonical_pattern` below or tolerate pruned zeros."""
    import scipy.sparse as sp

    _check_dims(a, b)
    sa = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    sb = sp.csr_matrix((b.data, b.indices, b.indptr), shape=b.shape)
    sc = (sa @ sb).tocsr()
    sc.sort_indices()
    return CSR(
        sc.indptr.astype(INDEX_DTYPE),
        sc.indices.astype(INDEX_DTYPE),
        sc.data.astype(np.float64),
        sc.shape,
    )


def drop_explicit_zeros(c: CSR) -> CSR:
    """Drop stored zeros — for comparing against zero-pruning oracles."""
    keep = c.data != 0.0
    rows = c.rows_expanded()[keep]
    indptr = np.zeros(c.m + 1, dtype=INDEX_DTYPE)
    np.cumsum(np.bincount(rows, minlength=c.m), out=indptr[1:])
    return CSR(indptr, c.indices[keep], c.data[keep], c.shape)
