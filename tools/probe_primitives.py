#!/usr/bin/env python
"""Hardware probe: throughput of the primitive operations an unstructured
SpGEMM engine could be built from (element gather, row gather, sort,
scatter-add/segment-sum, cumsum, masked-matmul segment reduce).

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_primitives.py

Each op is timed amortized (chained dispatches, RTT subtracted) at the
random8192-suite scale (~8M products) so the numbers translate directly
into engine-design decisions. Results land in benchdata/probe_primitives.txt.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spgemm_tpu.utils.timing import chained_device_ms

LOOP = 20
F = 8 * 1024 * 1024          # product-stream length (~random8192 flops)
TAB = 2 * 1024 * 1024        # value-table length (~nnz)
ROWS = 65536                 # row-gather table height
RW = 128                     # row width (lanes)


def report(name, ms, elems, out):
    rate = elems / (ms * 1e-3) / 1e9 if ms > 0 else float("inf")
    line = f"{name:34s} {ms:9.3f} ms   {rate:8.2f} G elem/s"
    print(line, flush=True)
    out.append(line)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    out = [f"device: {dev}  F={F} TAB={TAB}"]

    put = functools.partial(jax.device_put, device=dev)
    table = put(jnp.asarray(rng.random(TAB, dtype=np.float32)))
    idx = put(jnp.asarray(rng.integers(0, TAB, F).astype(np.int32)))
    rowtab = put(jnp.asarray(rng.random((ROWS, RW), dtype=np.float32)))
    ridx = put(jnp.asarray(rng.integers(0, ROWS, F // RW).astype(np.int32)))
    keys = put(jnp.asarray(rng.integers(0, 1 << 30, F).astype(np.int32)))
    vals = put(jnp.asarray(rng.random(F, dtype=np.float32)))
    seg_sorted = put(jnp.asarray(np.sort(
        rng.integers(0, F // 2, F)).astype(np.int32)))
    probe = put(jnp.zeros(8, jnp.float32))
    jax.block_until_ready((table, idx, rowtab, ridx, keys, vals, seg_sorted))

    def chained(body):
        @jax.jit
        def chain(*args):
            def step(i, acc):
                return acc + body(acc, *args)
            return jax.lax.fori_loop(0, LOOP, step, jnp.float32(0))
        return chain

    # 1. element gather (F indices from a TAB-element table)
    ms, rtt = chained_device_ms(
        chained(lambda acc, t, ix: jnp.sum(
            jnp.take(t + acc * 1e-30, ix, indices_are_sorted=False,
                     unique_indices=False))),
        probe, table, idx, loop=LOOP)
    out.append(f"rtt {rtt:.2f} ms")
    report("element gather (take)", ms, F, out)

    # 2. row gather ((F/128) rows of 128 lanes)
    ms, _ = chained_device_ms(
        chained(lambda acc, t, ix: jnp.sum(
            jnp.take(t + acc * 1e-30, ix, axis=0))),
        probe, rowtab, ridx, loop=LOOP)
    report("row gather (take axis=0, 128w)", ms, F, out)

    # 3a. sort keys only
    ms, _ = chained_device_ms(
        chained(lambda acc, k: jnp.sum(
            jax.lax.sort(k + acc.astype(jnp.int32) * 0)[-8:]
        ).astype(jnp.float32)),
        probe, keys, loop=LOOP)
    report("sort int32 keys", ms, F, out)

    # 3b. sort key+val
    def kv_body(acc, k, v):
        ks, vs = jax.lax.sort_key_val(k + acc.astype(jnp.int32) * 0, v)
        return jnp.sum(vs[-8:])
    ms, _ = chained_device_ms(chained(kv_body), probe, keys, vals, loop=LOOP)
    report("sort_key_val int32/f32", ms, F, out)

    # 4. segment_sum with sorted ids (scatter-add lowering)
    def seg_body(acc, v, s):
        return jnp.sum(jax.ops.segment_sum(
            v + acc * 1e-30, s, num_segments=F // 2,
            indices_are_sorted=True)[-8:])
    ms, _ = chained_device_ms(chained(seg_body), probe, vals, seg_sorted,
                              loop=LOOP)
    report("segment_sum sorted ids", ms, F, out)

    # 4b. unsorted scatter-add
    def scat_body(acc, v, s):
        return jnp.sum(jax.ops.segment_sum(
            v + acc * 1e-30, s, num_segments=F // 2,
            indices_are_sorted=False)[-8:])
    ms, _ = chained_device_ms(chained(scat_body), probe, vals, idx // 2,
                              loop=LOOP)
    report("segment_sum unsorted ids", ms, F, out)

    # 5. cumsum f32
    ms, _ = chained_device_ms(
        chained(lambda acc, v: jnp.cumsum(v + acc * 1e-30)[-1]),
        probe, vals, loop=LOOP)
    report("cumsum f32", ms, F, out)

    # 6. masked-matmul segment reduce: products (G, W) reduced into
    # (G, 128) outputs via a 0/1 membership mask built from seg ids,
    # contracted on the MXU. W products per 128 outputs.
    W = 512
    G = F // W
    pmat = put(jnp.asarray(rng.random((G, W), dtype=np.float32)))
    # seg id of each product within its group, in [0, 128)
    sid = put(jnp.asarray(np.sort(
        rng.integers(0, 128, (G, W)), axis=1).astype(np.int32)))
    jax.block_until_ready((pmat, sid))

    def mm_body(acc, p, s):
        oid = jax.lax.broadcasted_iota(jnp.int32, (1, W, 128), 2)
        mask = (s[:, :, None] == oid).astype(jnp.bfloat16)
        outs = jax.lax.dot_general(
            (p + acc * 1e-30).astype(jnp.bfloat16)[:, None, :], mask,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(outs[:, 0, -8:])
    ms, _ = chained_device_ms(chained(mm_body), probe, pmat, sid, loop=LOOP)
    report("masked-matmul seg reduce W=512", ms, F, out)

    # 7. gather via one-hot matmul within 2048-element windows:
    # permute F values with block-local indices using the MXU.
    BW = 2048
    NB = F // BW
    lidx = put(jnp.asarray(rng.integers(0, BW, F).astype(np.int32)
                           .reshape(NB, BW)))
    vblk = put(jnp.asarray(rng.random((NB, BW), dtype=np.float32)))
    jax.block_until_ready((lidx, vblk))

    def oh_body(acc, v, ix):
        src = jax.lax.broadcasted_iota(jnp.int32, (1, BW, BW), 1)
        oh = (ix[:, None, :] == src).astype(jnp.bfloat16)  # (NB, BW, BW)
        res = jax.lax.dot_general(
            (v + acc * 1e-30).astype(jnp.bfloat16)[:, None, :], oh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(res[:, 0, -8:])
    ms, _ = chained_device_ms(chained(oh_body), probe, vblk, lidx, loop=LOOP)
    report("one-hot matmul gather BW=2048", ms, F, out)

    os.makedirs("benchdata", exist_ok=True)
    with open("benchdata/probe_primitives.txt", "w") as f:
        f.write("\n".join(out) + "\n")
    print("-> benchdata/probe_primitives.txt")


if __name__ == "__main__":
    main()
