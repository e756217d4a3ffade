"""Sweep strip-kernel configs on the real chip and report per-config
numeric ms. Usage: python tools/profile_strip.py [tm,tn,block_rows ...]
Defaults sweep a small grid. Uses the bench.py cant-like matrix.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

from spgemm_tpu.models.tile import csr_to_tiles  # noqa: E402
from spgemm_tpu.ops.gustavson import build_strip_args  # noqa: E402
from spgemm_tpu.ops.pallas_kernels import gustavson_strip_pallas  # noqa: E402

LOOP = 50


def run(a, tm, tn, block_rows):
    at = csr_to_tiles(a, tm, tn)
    bt = at if tm == tn else csr_to_tiles(a, tn, tn)
    sargs = build_strip_args(at, bt, block_rows=block_rows)
    dev = jax.device_put(sargs.device_args())
    jax.block_until_ready(dev)
    kwargs = sargs.kernel_kwargs()

    @jax.jit
    def loop(av, *rest):
        def body(i, acc):
            cv, _ = gustavson_strip_pallas(av + acc * 1e-30, *rest, **kwargs)
            return acc + jnp.sum(cv)
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    float(trivial(dev[2]))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(dev[2]))
        rtts.append((time.perf_counter() - t0) * 1e3)
    rtt = min(rtts)

    try:
        float(loop(*dev))
    except Exception as e:
        print(f"tm={tm} tn={tn} br={block_rows}: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}")
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*dev))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    ms = max(0.0, best - rtt) / LOOP
    n_blocks = max(1, -(-sargs.gm // block_rows))
    a_mb = (sargs.a_val.nbytes + sargs.a_occ.nbytes) / 1e6
    b_mb = (sargs.b_val.nbytes + sargs.b_occ.nbytes) / 1e6
    c_mb = n_blocks * sargs.max_cblock * tm * tn * 6 / 1e6
    print(f"tm={tm:3d} tn={tn:3d} br={block_rows:3d}: numeric={ms:6.2f} ms  "
          f"ntA={at.nt} ntC={sargs.nt_c} max_b={sargs.max_b} "
          f"max_ablock={sargs.max_ablock} max_cblock={sargs.max_cblock} "
          f"A={a_mb:.0f}MB B={b_mb:.0f}MB C={c_mb:.0f}MB "
          f"gm={sargs.gm} blocks={n_blocks}")


def main():
    a = bench.make_cantlike(bench.ROWS, bench.BAND)
    cfgs = []
    for arg in sys.argv[1:]:
        tm, tn, br = map(int, arg.split(","))
        cfgs.append((tm, tn, br))
    if not cfgs:
        cfgs = [(16, 128, 32), (16, 128, 64), (16, 128, 128),
                (32, 128, 32), (32, 128, 64), (64, 128, 16), (8, 128, 64)]
    for tm, tn, br in cfgs:
        run(a, tm, tn, br)


if __name__ == "__main__":
    main()
