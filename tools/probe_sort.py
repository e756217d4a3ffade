#!/usr/bin/env python
"""Second hardware probe: sort/argsort with *non-foldable* loop-carried
dependencies (probe_primitives' int perturbation `acc*0` constant-folded,
letting XLA hoist the sort out of the chain), plus gather variants.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_sort.py
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

LOOP = 10
F = 8 * 1024 * 1024


def report(name, ms, elems, out):
    rate = elems / (ms * 1e-3) / 1e9 if ms > 0 else float("inf")
    line = f"{name:40s} {ms:9.3f} ms   {rate:8.2f} G elem/s"
    print(line, flush=True)
    out.append(line)


def dep(acc):
    # runtime-zero int32 XLA cannot constant-fold (acc is loop-carried f32)
    return (acc > jnp.float32(1e30)).astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    out = [f"device: {dev}  F={F}"]
    print(out[0], flush=True)
    put = functools.partial(jax.device_put, device=dev)

    keys = put(jnp.asarray(rng.integers(0, 1 << 30, F).astype(np.int32)))
    vals = put(jnp.asarray(rng.random(F, dtype=np.float32)))
    probe = put(jnp.zeros(8, jnp.float32))
    jax.block_until_ready((keys, vals))

    def chained(body):
        @jax.jit
        def chain(*args):
            def step(i, acc):
                return acc + body(acc, *args)
            return jax.lax.fori_loop(0, LOOP, step, jnp.float32(0))
        return chain

    ms, rtt = chained_device_ms(
        chained(lambda acc, k: jnp.sum(
            jax.lax.sort(k + dep(acc))[-8:]).astype(jnp.float32)),
        probe, keys, loop=LOOP)
    out.append(f"rtt {rtt:.2f} ms")
    report("sort int32 (real dep)", ms, F, out)

    def kv_body(acc, k, v):
        _, vs = jax.lax.sort_key_val(k + dep(acc), v)
        return jnp.sum(vs[-8:])
    ms, _ = chained_device_ms(chained(kv_body), probe, keys, vals, loop=LOOP)
    report("sort_key_val int32/f32 (real dep)", ms, F, out)

    # 3-array sort: key + two payloads (what a full device ESC would need)
    def kv2_body(acc, k, v):
        res = jax.lax.sort((k + dep(acc), v, v * 2.0), num_keys=1)
        return jnp.sum(res[1][-8:])
    ms, _ = chained_device_ms(chained(kv2_body), probe, keys, vals, loop=LOOP)
    report("sort key + 2 payloads", ms, F, out)

    # smaller sorts (1M)
    F1 = 1024 * 1024
    k1 = put(keys[:F1])
    ms, _ = chained_device_ms(
        chained(lambda acc, k: jnp.sum(
            jax.lax.sort(k + dep(acc))[-8:]).astype(jnp.float32)),
        probe, k1, loop=LOOP)
    report("sort int32 1M (real dep)", ms, F1, out)

    # batched small sorts along last axis (segment-local sorts)
    kb = put(keys.reshape(F // 2048, 2048))
    ms, _ = chained_device_ms(
        chained(lambda acc, k: jnp.sum(
            jax.lax.sort(k + dep(acc), dimension=1)[:, -1]
        ).astype(jnp.float32)),
        probe, kb, loop=LOOP)
    report("batched sort 4096x2048 axis=1", ms, F, out)

    # cumsum with real dep (re-check; 1e-30 add was already unfoldable)
    ms, _ = chained_device_ms(
        chained(lambda acc, v: jnp.cumsum(v + acc * 1e-30)[-1]),
        probe, vals, loop=LOOP)
    report("cumsum f32 (recheck)", ms, F, out)

    # element gather, but from a VMEM-sized table (16K)
    tab_s = put(vals[:16384])
    idx = put(jnp.asarray(rng.integers(0, 16384, F).astype(np.int32)))
    ms, _ = chained_device_ms(
        chained(lambda acc, t, ix: jnp.sum(
            jnp.take(t + acc * 1e-30, ix))),
        probe, tab_s, idx, loop=LOOP)
    report("element gather small table 16K", ms, F, out)

    # take_along_axis within rows: (G, 2048) values, (G, 2048) local idx
    G = F // 2048
    vb = put(vals.reshape(G, 2048))
    lix = put(jnp.asarray(rng.integers(0, 2048, F).astype(np.int32)
                          .reshape(G, 2048)))
    ms, _ = chained_device_ms(
        chained(lambda acc, v, ix: jnp.sum(
            jnp.take_along_axis(v + acc * 1e-30, ix, axis=1)[:, -1])),
        probe, vb, lix, loop=LOOP)
    report("take_along_axis rows of 2048", ms, F, out)

    # row gather with 8-wide rows (narrow): products keyed by A-nnz
    rt8 = put(vals[: 2 * 1024 * 1024].reshape(-1, 8))
    ri = put(jnp.asarray(
        rng.integers(0, rt8.shape[0], F // 8).astype(np.int32)))
    ms, _ = chained_device_ms(
        chained(lambda acc, t, ix: jnp.sum(
            jnp.take(t + acc * 1e-30, ix, axis=0))),
        probe, rt8, ri, loop=LOOP)
    report("row gather 8-wide", ms, F, out)

    with open("benchdata/probe_sort.txt", "w") as f:
        f.write("\n".join(out) + "\n")
    print("-> benchdata/probe_sort.txt")


if __name__ == "__main__":
    main()
