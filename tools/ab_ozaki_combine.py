"""A/B the ozaki XLA-slab combine modes (scatter vs scatter-free
permute+cumsum) across structurally distinct shapes on hardware.

VERDICT r3 weak #5 / task #7: the cumsum path existed "for
scatter-hostile shapes" with a single cant-scale measurement showing
scatter 2.9x faster; this driver measures the crossover (or records its
absence) across the structured regimes the ozaki XLA engine serves, so
combine_mode can be an evidence-backed rule instead of an env knob.
Output is appended to benchdata/ozaki_combine_ab.txt by hand.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_ozaki_combine.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from spgemm_tpu.models.tile import csr_to_tiles
    from spgemm_tpu.ops.ozaki import build_ozaki_plan, time_ozaki
    from spgemm_tpu.utils.generators import banded, block_diag, random_uniform

    rng = np.random.default_rng(7)
    shapes = {
        # (matrix, value model): banded = long thin segments, blockdiag =
        # many small segments, banded-gaussian = S=8x8 (64 pair matmuls,
        # the combine runs once per pair GROUP so its share shrinks)
        "banded8192_int": banded(rng, 8192, 64),
        "blockdiag8192_int": block_diag(rng, 8192),
        "banded16384_int": banded(rng, 16384, 64),
    }
    g = banded(rng, 8192, 64)
    g.data = rng.standard_normal(g.nnz)
    shapes["banded8192_gauss"] = g
    bd = block_diag(rng, 16384)
    shapes["blockdiag16384_int"] = bd

    for name, a in shapes.items():
        at = csr_to_tiles(a, 16, 128)
        bt = csr_to_tiles(a, 128, 128)
        t0 = time.perf_counter()
        try:
            plan = build_ozaki_plan(at, bt)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: plan failed ({str(ex)[:90]})", flush=True)
            continue
        flops = 2 * int(np.sum(np.diff(a.indptr)[a.indices]))
        print(f"{name}: S={plan.sa}x{plan.sb} pairs={plan.num_pairs} "
              f"ntC={plan.base.nt_c} plan={time.perf_counter()-t0:.1f}s",
              flush=True)
        row = {}
        for mode in ("scatter", "cumsum"):
            os.environ["SPGEMM_OZAKI_COMBINE"] = mode
            try:
                ms, _ = time_ozaki(plan, loop=20, repeats=2)
                row[mode] = ms
                print(f"  {mode:8s}: {ms:8.3f} ms = "
                      f"{flops/(ms*1e6):7.1f} f64-GFLOPS", flush=True)
            except Exception as ex:  # noqa: BLE001
                print(f"  {mode}: failed ({str(ex)[:90]})", flush=True)
        os.environ.pop("SPGEMM_OZAKI_COMBINE", None)
        if len(row) == 2:
            print(f"  -> scatter/cumsum = {row['cumsum']/row['scatter']:.2f}x"
                  f" ({'scatter wins' if row['scatter'] <= row['cumsum'] else 'CUMSUM WINS'})",
                  flush=True)


if __name__ == "__main__":
    main()
