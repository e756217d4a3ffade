"""Profile the ESC scan-plan build phase-by-phase (host-only, no TPU).

VERDICT r2 Missing #1: rmat65536 paid ~79 s of planning for 20 ms of
device numeric. Round 3 rebuilt the native symbolic around this host's
measured memory behavior (random 4 B writes ~7 M/s vs sequential
~10 GB/s; hugepage first-touch 2.2 GB/s vs 0.8): one fused product walk
(esc_scan_sym1) + a sequential-write fill (esc_scan_fill2, per-row radix
for heavy rows). This script times the wrapper's stages.

Usage: python tools/profile_esc_plan.py [rmat65536|random65536|...] [--sources]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from spgemm_tpu.utils.generators import (banded, block_diag, power_law,
                                         random_uniform, rmat)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "rmat65536"
    keep_sources = "--sources" in sys.argv
    n = int("".join(ch for ch in name if ch.isdigit()))
    kind = name[: -len(str(n))]
    rng = np.random.default_rng(1234)
    gen = dict(banded=banded, blockdiag=block_diag, random=random_uniform,
               powerlaw=power_law, rmat=rmat)[kind]
    a = gen(rng, n)
    print(f"{name}: m={a.m} nnzA={a.nnz} keep_sources={keep_sources}")

    from spgemm_tpu.utils.native import esc_scan_symbolic_native

    t0 = time.perf_counter()
    res = esc_scan_symbolic_native(a, a, keep_sources=keep_sources)
    t1 = time.perf_counter()
    assert res is not None, "native library unavailable"
    (c_indptr, c_indices, flops, qv, meta, win_rowptr, asrc, bsrc,
     max_run) = res
    print(f"native symbolic total:  {1e3*(t1-t0):9.1f} ms  "
          f"F={flops}  nnzC={int(c_indptr[-1])}  R={qv.shape[0]}  "
          f"({flops/max(t1-t0,1e-9)/1e6:.1f} M prod/s)")

    # second build: buffers warm in the allocator, steady-state rate.
    # Release the first build's planes first — holding them would force
    # the rebuild onto FRESH pool carves that pay first-touch backing
    # inside the timed region (the same effect de7cf00 fixed in
    # bench.py's convert loop).
    del res, qv, meta, asrc, bsrc, c_indptr, c_indices, win_rowptr
    t2 = time.perf_counter()
    res2 = esc_scan_symbolic_native(a, a, keep_sources=keep_sources)
    t3 = time.perf_counter()
    del res2
    print(f"rebuild (warm):         {1e3*(t3-t2):9.1f} ms  "
          f"({flops/max(t3-t2,1e-9)/1e6:.1f} M prod/s)")

    # per-stage breakdown of the warm rebuild (TSC tick fractions from
    # esc_scan_build's out_stats[2:7], scaled onto wall time)
    import spgemm_tpu.utils.native as _nv
    stages = _nv.last_scan_build_stages
    if stages and sum(stages.values()):
        tot = sum(stages.values())
        print("stage split:            "
              + "  ".join(f"{k}={100*v/tot:.0f}% (~{(t3-t2)*v/tot:.2f}s)"
                          for k, v in stages.items()))

    from spgemm_tpu.ops.esc import build_esc_scan_plan

    t4 = time.perf_counter()
    plan = build_esc_scan_plan(a, a, keep_sources=keep_sources)
    t5 = time.perf_counter()
    print(f"build_esc_scan_plan:    {1e3*(t5-t4):9.1f} ms  "
          f"passes={plan.passes}")


if __name__ == "__main__":
    main()
