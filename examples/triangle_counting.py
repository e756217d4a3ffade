#!/usr/bin/env python
"""Triangle counting via SpGEMM — one of TileSpGEMM's motivating
applications (PPoPP'22 paper, §1): for an undirected graph with
adjacency A, the triangle count is sum(A .* A^2) / 6.

Usage: python examples/triangle_counting.py [n_nodes] [avg_degree]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from spgemm_tpu.models.csr import CSR
from spgemm_tpu.ops.spgemm import spgemm_csr


def random_graph(n: int, deg: int, seed: int = 0) -> CSR:
    rng = np.random.default_rng(seed)
    m = n * deg // 2
    r = rng.integers(0, n, m)
    c = rng.integers(0, n, m)
    keep = r != c
    r, c = r[keep], c[keep]
    # symmetrize, unit weights
    rows = np.concatenate([r, c])
    cols = np.concatenate([c, r])
    return CSR.from_coo(rows, cols, np.ones(rows.size), (n, n))


def count_triangles(adj: CSR) -> int:
    # binarize (duplicate edges summed by from_coo)
    adj = CSR(adj.indptr, adj.indices, np.ones(adj.nnz), adj.shape)
    a2, res = spgemm_csr(adj, tm=16, tn=128)
    print(f"  A^2: nnz={a2.nnz}  backend={res.stats['backend']}  "
          f"numeric={res.timings_ms.get('numeric_ms', 0):.2f} ms")
    # sum(A .* A^2), vectorized: A and A^2 rows are column-sorted, so one
    # global searchsorted over (row, col) keys aligns every A entry with
    # its A^2 slot (if present)
    n64 = np.int64(adj.n)
    key_a = adj.rows_expanded().astype(np.int64) * n64 + adj.indices
    key_2 = a2.rows_expanded().astype(np.int64) * n64 + a2.indices
    pos = np.searchsorted(key_2, key_a)
    pos = np.clip(pos, 0, max(0, key_2.size - 1))
    match = key_2.size > 0
    total = float(a2.data[pos][key_2[pos] == key_a].sum()) if match else 0.0
    return int(round(total / 6))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    adj = random_graph(n, deg)
    print(f"graph: {n} nodes, {adj.nnz} directed edges")
    t = count_triangles(adj)
    print(f"triangles: {t}")
    # verify against a dense reference for small graphs
    if n <= 4000:
        d = (adj.to_dense() > 0).astype(np.float64)
        ref = int(round(np.sum(d * (d @ d)) / 6))
        print(f"dense reference: {ref}  ({'OK' if ref == t else 'MISMATCH'})")


if __name__ == "__main__":
    main()
