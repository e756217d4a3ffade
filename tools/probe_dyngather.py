#!/usr/bin/env python
"""Third hardware probe: Mosaic's tpu.dynamic_gather via Pallas
jnp.take_along_axis — the candidate local-shuffle primitive for the
unstructured SpGEMM engine. Checks which shapes/axes compile and how
fast they run.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_dyngather.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgemm_tpu.utils.timing import chained_device_ms

LOOP = 20


def make_gather_kernel(shape, axis, blk_rows):
    """Pallas kernel: out = take_along_axis(x, idx, axis) blockwise."""
    R, C = shape

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    grid = (R // blk_rows,)
    bs = lambda mem: pl.BlockSpec((blk_rows, C), lambda i: (i, 0),
                                  memory_space=mem)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bs(pltpu.VMEM), bs(pltpu.VMEM)],
        out_specs=bs(pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )


def try_case(name, shape, axis, blk_rows, idx_max, out):
    rng = np.random.default_rng(0)
    R, C = shape
    x = rng.random(shape, dtype=np.float32)
    idx = rng.integers(0, idx_max, shape).astype(np.int32)
    want = np.take_along_axis(x, idx, axis=axis)
    xd = jax.device_put(jnp.asarray(x))
    id_ = jax.device_put(jnp.asarray(idx))
    try:
        fn = jax.jit(make_gather_kernel(shape, axis, blk_rows))
        got = np.asarray(fn(xd, id_))
        ok = np.array_equal(got, want)
        # timing
        probe = jax.device_put(jnp.zeros(8, jnp.float32))

        @jax.jit
        def chain(x, i):
            def step(s, acc):
                return acc + jnp.sum(
                    fn(x + acc * 1e-30, i)[-1, -8:])
            return jax.lax.fori_loop(0, LOOP, step, jnp.float32(0))

        ms, _ = chained_device_ms(chain, probe, xd, id_, loop=LOOP)
        rate = R * C / (ms * 1e-3) / 1e9
        line = (f"{name:44s} ok={ok}  {ms:8.3f} ms  {rate:8.2f} G elem/s")
    except Exception as e:  # noqa: BLE001
        line = f"{name:44s} FAILED: {str(e).splitlines()[0][:90]}"
    print(line, flush=True)
    out.append(line)


def main():
    out = [f"device: {jax.devices()[0]}"]
    print(out[0], flush=True)
    # lane gather (axis=1): within-row shuffle
    try_case("lane gather (8192,128) blk=512 idx<128",
             (8192, 128), 1, 512, 128, out)
    try_case("lane gather (8192,256) blk=512 idx<256",
             (8192, 256), 1, 512, 256, out)
    try_case("lane gather (8192,512) blk=512 idx<512",
             (8192, 512), 1, 512, 512, out)
    try_case("lane gather (8192,1024) blk=256 idx<1024",
             (8192, 1024), 1, 256, 1024, out)
    try_case("lane gather big (131072,128) blk=1024",
             (131072, 128), 1, 1024, 128, out)
    try_case("lane gather big (65536,256) blk=1024",
             (65536, 256), 1, 1024, 256, out)
    # sublane gather (axis=0): within-column shuffle across blk rows
    try_case("sublane gather (8192,128) blk=8 idx<8",
             (8192, 128), 0, 8, 8, out)
    try_case("sublane gather (8192,128) blk=32 idx<32",
             (8192, 128), 0, 32, 32, out)
    try_case("sublane gather (8192,128) blk=512 idx<512",
             (8192, 128), 0, 512, 512, out)

    os.makedirs("benchdata", exist_ok=True)
    with open("benchdata/probe_dyngather.txt", "w") as f:
        f.write("\n".join(out) + "\n")
    print("-> benchdata/probe_dyngather.txt")


if __name__ == "__main__":
    main()
