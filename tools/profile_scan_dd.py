"""Isolate the double-double scan kernel's bottleneck on hardware.

VERDICT r3 weak #2 / task #4: the DD kernel regressed to 16.845 ms =
31.3 f64-GFLOPS at cant scale (round 2: 14.346 / 36.8) while the
modelled ~92 never materialized. `passes` and `block_rows` are already
static kwargs of esc_scan_dd_pallas, so this driver sweeps them on the
SAME resident planes to split the time into DMA vs VPU(roll/2Sum)
shares before any kernel rework:

  * passes=0 keeps every DMA stream and the gather/G-reduce epilogue
    but drops all 7 roll+2Sum doubling passes -> the pure-streaming
    floor of the current 3-in/2-out shape;
  * the passes sweep's slope is the per-pass VPU cost;
  * the block_rows sweep shows whether the halved DD block (SCAN_BLK//2,
    a VMEM-fit choice) broke double-buffer overlap.

The f32 scan on the same plan is the cross-reference (its 3-stream
rate is the one the round-3 model extrapolated from).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_scan_dd.py [n]
(one ~3.4 GB plane upload through the tunnel, then chained timings)
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 62451
    a = bm.make_cantlike(n, 64)

    import jax
    import jax.numpy as jnp

    from spgemm_tpu.ops.esc import (META16, SCAN_BLK, build_esc_scan_plan,
                                    choose_group_rows, esc_scan_dd_pallas,
                                    esc_scan_pallas, meta16_plane,
                                    scan_dd_planes)
    from spgemm_tpu.utils.native import esc_plan_request_bytes, pool_prewarm
    from spgemm_tpu.utils.timing import chained_device_ms

    g = choose_group_rows(a, a)
    pool_prewarm(5 << 30, parts=6,
                 part_cap=esc_plan_request_bytes(a, a, group_rows=g))
    t0 = time.perf_counter()
    plan = build_esc_scan_plan(a, a, keep_sources=True, group_rows=g)
    print(f"plan: {time.perf_counter()-t0:.1f}s F={plan.num_products} "
          f"R={plan.qv.shape[0]} G={g} passes={plan.passes}", flush=True)
    r, wn = plan.qv.shape
    in_gb = r * wn * (4 + 4 + 2) / 1e9     # qh + ql + meta16
    out_gb = (r // g) * wn * 8 / 1e9       # s + e planes
    flops = 2 * plan.num_products
    print(f"traffic: in={in_gb:.2f} GB out={out_gb:.2f} GB", flush=True)

    hi, lo = scan_dd_planes(plan, a.data, a.data)
    mt = meta16_plane(plan.meta, cache_on=plan) if META16 else plan.meta
    t0 = time.perf_counter()
    qh = jax.device_put(jnp.asarray(hi))
    ql = jax.device_put(jnp.asarray(lo))
    meta = jax.device_put(jnp.asarray(mt))
    qv = jax.device_put(jnp.asarray(plan.qv))
    jax.block_until_ready((qh, ql, meta, qv))
    print(f"upload: {time.perf_counter()-t0:.1f}s", flush=True)
    probe = jax.device_put(jnp.zeros(8, jnp.float32))

    def time_dd(passes, blk, loop=30):
        @jax.jit
        def chain(qh, ql, meta):
            def body(i, acc):
                s, e = esc_scan_dd_pallas(
                    qh + acc * 1e-30, ql, meta, passes=passes,
                    block_rows=blk, group_rows=g)
                return acc + jnp.sum(s[-1, -8:]) + jnp.sum(e[-1, -8:])
            return jax.lax.fori_loop(0, loop, body, jnp.float32(0))
        ms, rtt = chained_device_ms(chain, probe, qh, ql, meta,
                                    repeats=2, loop=loop)
        gbs = (in_gb + out_gb) / (ms / 1e3)
        print(f"dd passes={passes} blk={blk:5d}: {ms:7.3f} ms  "
              f"{flops/(ms*1e6):6.1f} f64-GFLOPS  {gbs:6.0f} GB/s",
              flush=True)
        return ms

    def time_f32(blk, loop=30):
        @jax.jit
        def chain(qv, meta):
            def body(i, acc):
                y = esc_scan_pallas(qv + acc * 1e-30, meta,
                                    passes=plan.passes, block_rows=blk,
                                    group_rows=g)
                return acc + jnp.sum(y[-1, -8:])
            return jax.lax.fori_loop(0, loop, body, jnp.float32(0))
        ms, rtt = chained_device_ms(chain, probe, qv, meta,
                                    repeats=2, loop=loop)
        f32_gb = r * wn * 6 / 1e9 + out_gb / 2
        print(f"f32 passes={plan.passes} blk={blk:5d}: {ms:7.3f} ms  "
              f"{flops/(ms*1e6):6.1f} GFLOPS  "
              f"{f32_gb/(ms/1e3):6.0f} GB/s", flush=True)
        return ms

    time_f32(SCAN_BLK)
    base = time_dd(plan.passes, SCAN_BLK // 2)
    for p in (0, 1, 3, 5):
        time_dd(p, SCAN_BLK // 2)
    for blk in (SCAN_BLK // 4, SCAN_BLK):
        try:
            time_dd(plan.passes, blk)
        except Exception as e:  # VMEM overflow at SCAN_BLK is plausible
            print(f"dd blk={blk}: FAILED ({str(e)[:100]})", flush=True)
    print(f"baseline(current): {base:.3f} ms = "
          f"{flops/(base*1e6):.1f} f64-GFLOPS "
          f"(r2 bar: 14.346 ms / 36.8)", flush=True)


if __name__ == "__main__":
    main()
