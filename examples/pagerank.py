#!/usr/bin/env python
"""PageRank on an R-MAT scale-free graph — the unstructured-workload
showcase: a power-law web-graph adjacency has ~1 nonzero per 16x128
tile, the regime the tiled kernels cannot serve (and the reference
serves with nsparse hash tables). The iteration runs on the gather SpMM
(`ops/spmm.spmm_gather`: X row gathers + one-hot row contraction, raw
CSR, no tiles), and the two-hop reachability count at the end uses the
ESC SpGEMM engine.

Usage: python examples/pagerank.py [n] [avg_degree]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from spgemm_tpu.ops.esc import spgemm_esc
    from spgemm_tpu.ops.spmm import spmm_gather
    from spgemm_tpu.utils.generators import rmat

    g = rmat(np.random.default_rng(7), n, deg, values="ones")
    print(f"R-MAT graph: n={n} edges={g.nnz} "
          f"max out-degree={int(np.diff(g.indptr).max())}")

    # column-stochastic transition matrix P = A^T D^-1 (rows normalized
    # by their WEIGHT sum — R-MAT multi-edges carry summed weights)
    row_sum = np.zeros(n)
    np.add.at(row_sum, g.rows_expanded(), g.data)
    dangling = row_sum == 0
    p = type(g)(g.indptr, g.indices,
                g.data / np.maximum(row_sum, 1e-300)[g.rows_expanded()],
                g.shape).transpose()

    d, tol = 0.85, 1e-8
    x = np.full((n, 1), 1.0 / n, np.float32)
    t0 = time.perf_counter()
    for it in range(100):
        leak = d * float(x[dangling].sum())   # dangling-node mass
        x_new = d * spmm_gather(p, x) + (leak + 1 - d) / n
        delta = float(np.abs(x_new - x).sum())
        x = x_new
        if delta < tol:
            break
    dt = time.perf_counter() - t0
    top = np.argsort(-x[:, 0])[:5]
    print(f"converged in {it + 1} iterations ({dt:.2f} s)")
    print("top-5 ranks:", ", ".join(
        f"v{int(v)}={x[v, 0]:.2e}" for v in top))

    # two-hop reachability pattern via the ESC SpGEMM engine
    t0 = time.perf_counter()
    c2, tms, plan = spgemm_esc(g, g)
    print(f"two-hop pairs (A^2 pattern): {c2.nnz} "
          f"(products {plan.num_products}, numeric "
          f"{tms['numeric_ms']:.1f} ms)")

    # sanity: PageRank sums to 1
    assert abs(float(x.sum()) - 1.0) < 1e-3
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
