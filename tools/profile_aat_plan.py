"""Profile the ESC plan-build A2 vs AAT asymmetry (VERDICT r3 weak #6 /
task #8: rmat8192 AAT plan_ms was 10x its A2 twin, 3061 vs 293 ms, with
the same F). Host-only. Prints the per-stage TSC split of each build
plus the structural statistics that differ between B=A and B=A^T
(per-C-row product counts, distinct-dest widths, dup ratios, B-row nnz
spread) so the cost can be pinned to a stage AND a property.

Usage: python tools/profile_aat_plan.py [rmat8192] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from spgemm_tpu.utils.generators import (banded, block_diag, power_law,
                                         random_uniform, rmat)


def stats(a, b, label):
    ra = np.diff(a.indptr)
    rb = np.diff(b.indptr)
    f_row = np.zeros(a.m, np.int64)
    np.add.at(f_row, np.repeat(np.arange(a.m), ra), rb[a.indices])
    import scipy.sparse as sp

    sa = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    sb = sp.csr_matrix((b.data, b.indices, b.indptr), shape=b.shape)
    c = (sa @ sb).tocsr()
    width = np.diff(c.indptr)
    f = int(f_row.sum())
    print(f"{label}: F={f} nnzC={c.nnz} dup={f/max(c.nnz,1):.2f} "
          f"max_row_F={f_row.max()} max_row_width={width.max()} "
          f"Brow_nnz max={rb.max()} p99={np.percentile(rb, 99):.0f}")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "rmat8192"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = int("".join(ch for ch in name if ch.isdigit()))
    kind = name[: -len(str(n))]
    rng = np.random.default_rng(7)  # run_suite's seed, same matrix
    gen = dict(banded=banded, blockdiag=block_diag, random=random_uniform,
               powerlaw=power_law, rmat=rmat)[kind]
    a = gen(rng, n)

    from spgemm_tpu.utils.native import esc_scan_symbolic_native
    import spgemm_tpu.utils.native as nv

    bt = a.transpose()
    for label, b in (("A2 ", a), ("AAT", bt)):
        stats(a, b, label)
        best, split = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = esc_scan_symbolic_native(a, b, keep_sources=False)
            dt = time.perf_counter() - t0
            del res
            if best is None or dt < best:
                best, split = dt, dict(nv.last_scan_build_stages)
        tot = sum(split.values()) or 1
        print(f"{label}: build best {1e3*best:8.1f} ms   "
              + "  ".join(f"{k}={1e3*best*v/tot:.0f}ms"
                          for k, v in split.items()), flush=True)


if __name__ == "__main__":
    main()
