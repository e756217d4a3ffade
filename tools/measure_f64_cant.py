"""Measure the double-double (f64) scan engine at cant scale on the real
TPU, validating exactness first — the source of benchdata/f64_results.txt's
headline figure (reference f64 baseline: 52.63 GFLOPS, BASELINE.md).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_f64_cant.py
(uploads ~2.7 GB of planes through the tunnel — minutes of wall; the
kernel timing itself is chained + RTT-subtracted.)
"""

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

spec = importlib.util.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bm)


def main():
    a = bm.make_cantlike(62451, 64)
    from spgemm_tpu.ops import golden
    from spgemm_tpu.ops.esc import (build_esc_scan_plan, choose_group_rows,
                                    esc_scan_dd, time_esc_scan,
                                    time_esc_scan_dd)

    g = choose_group_rows(a, a)
    print(f"choose_group_rows -> {g}", flush=True)
    # provision the pool so the plan build below is measured warm (the
    # one-time ~11 s/GB host-backing cost is environmental, see README)
    from spgemm_tpu.utils.native import esc_plan_request_bytes, pool_prewarm

    t0 = time.perf_counter()
    pool_prewarm(5 << 30, parts=6,
                 part_cap=esc_plan_request_bytes(a, a, group_rows=g))
    print(f"pool prewarm: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    plan = build_esc_scan_plan(a, a, keep_sources=True, group_rows=g)
    print(f"plan build: {time.perf_counter()-t0:.1f}s F={plan.num_products} "
          f"passes={plan.passes} R={plan.qv.shape[0]}", flush=True)
    c = esc_scan_dd(plan, a.data, a.data, interpret=False)
    ref = golden.spgemm_scipy(a, a)
    got = golden.drop_explicit_zeros(c)
    exact = got.pattern_equal(ref) and np.array_equal(got.data, ref.data)
    print(f"dd exact: {exact}", flush=True)
    ms, _ = time_esc_scan_dd(plan, a.data, a.data, loop=30, repeats=2)
    print(f"f64 DD (G={g}): {ms:.3f} ms = "
          f"{2*plan.num_products/(ms*1e6):.1f} f64-GFLOPS", flush=True)
    ms32, _ = time_esc_scan(plan, loop=30, repeats=2)
    print(f"f32 scan (G={g}): {ms32:.3f} ms = "
          f"{2*plan.num_products/(ms32*1e6):.1f} GFLOPS", flush=True)


if __name__ == "__main__":
    main()
