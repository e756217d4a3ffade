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

    # Ozaki-slice engine (ops/ozaki.py) — the structured-f64 path. The
    # cant-like value model is small integers, so S=1: one int8 MXU
    # matmul per slab pair, bit-exact f64.
    from spgemm_tpu.models.tile import csr_to_tiles
    from spgemm_tpu.ops.ozaki import (build_ozaki_plan, ozaki_compact,
                                      ozaki_numeric)

    at = csr_to_tiles(a, 16, 128)
    bt = csr_to_tiles(a, 128, 128)
    t0 = time.perf_counter()
    oplan = build_ozaki_plan(at, bt)
    print(f"ozaki plan: {time.perf_counter()-t0:.1f}s S={oplan.sa}x"
          f"{oplan.sb} pairs={oplan.num_pairs} ntC={oplan.nt_c}", flush=True)
    (h, m, l, cnt), tms = ozaki_numeric(oplan)
    c_oz = ozaki_compact(oplan, h, m, l, cnt, a.shape).to_csr()
    oz_trim = golden.drop_explicit_zeros(c_oz)
    okoz = (ref.pattern_equal(oz_trim)
            and np.array_equal(ref.data, oz_trim.data))
    print(f"ozaki exact: {okoz}", flush=True)
    # amortized device time (chained, RTT-subtracted)
    from spgemm_tpu.ops.ozaki import time_ozaki

    nnz_cub = 2 * plan.num_products
    for mode in ("scatter", "cumsum"):
        os.environ["SPGEMM_OZAKI_COMBINE"] = mode
        try:
            msoz, _ = time_ozaki(oplan, loop=20, repeats=2)
            print(f"ozaki f64 (S={oplan.sa}x{oplan.sb}, {mode}): "
                  f"{msoz:.3f} ms = {nnz_cub/(msoz*1e6):.1f} f64-GFLOPS",
                  flush=True)
        except Exception as ex:  # noqa: BLE001 — record, keep measuring
            print(f"ozaki {mode} failed: {str(ex)[:160]}", flush=True)
    os.environ.pop("SPGEMM_OZAKI_COMBINE", None)
    print("note: f64 backend='auto' routes this matrix (integer values, "
          "2^24 bound holds) to the f32-exact strip path — the f64 "
          "headline for the reference's value model is bench.py's strip "
          "GFLOPS itself; the rows above are the general-f64 engines.",
          flush=True)


if __name__ == "__main__":
    main()
