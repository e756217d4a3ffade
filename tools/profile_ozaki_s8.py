"""Profile the Ozaki S=8x8 (general f64 values) engine at cant scale on
the real TPU: which stage binds — the 64 int8 MXU matmuls, the per-group
seg_sum combine, or the triple-float accumulation. Drives VERDICT r3
task #2 (general-value f64 >= 52.63 GFLOPS at cant scale).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_ozaki_s8.py
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

import jax
import jax.numpy as jnp


def main():
    a = bm.make_cantlike(62451, 64)
    rng = np.random.default_rng(0)
    from spgemm_tpu.models.csr import CSR
    a = CSR(a.indptr, a.indices, rng.standard_normal(a.nnz), a.shape)

    from spgemm_tpu.models.tile import csr_to_tiles
    from spgemm_tpu.ops import ozaki as oz
    from spgemm_tpu.utils.timing import chained_device_ms

    import os as _os
    _tm = int(_os.environ.get('OZ_TM', '16'))
    at = csr_to_tiles(a, _tm, 128)
    bt = csr_to_tiles(a, 128, 128)
    t0 = time.perf_counter()
    plan = oz.build_ozaki_plan(at, bt)
    print(f"plan: {time.perf_counter()-t0:.1f}s S={plan.sa}x{plan.sb} "
          f"pairs={plan.num_pairs} ntC={plan.nt_c}", flush=True)
    base = plan.base
    F = 2 * base.num_products if hasattr(base, 'num_products') else None
    # products = pairs * tk * density... use the strip plan's product
    # count instead: flops = 2 * sum over pairs of tile-pair products.
    # GustavsonPlan carries it:
    for attr in ("num_products", "flops", "products"):
        if hasattr(base, attr):
            print("base", attr, getattr(base, attr), flush=True)

    arrs = [jax.device_put(x) for x in (
        plan.a_sl, plan.b_sl, plan.a_occ, plan.b_occ,
        jnp.asarray(base.seg), jnp.asarray(plan.perm),
        jnp.asarray(plan.bounds))]
    jax.block_until_ready(arrs)
    kw = dict(gk=base.gk, max_a=base.max_a, max_b=base.max_b,
              tm=base.tm, tn=base.tn, nt_c=base.nt_c,
              sa=plan.sa, sb=plan.sb)

    def mm_only(a_sl, b_sl, ao, bo, seg, perm, bounds):
        out = jnp.zeros((), jnp.int32)
        for p in range(plan.sa + plan.sb - 1):
            m = None
            for s in range(max(0, p - plan.sb + 1), min(plan.sa - 1, p) + 1):
                d = jax.lax.dot_general(
                    a_sl[s], b_sl[p - s],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.HIGHEST)
                m = d if m is None else m + d
            out = out + jnp.sum(m[:, :1, :1])
        return out.astype(jnp.float32)

    def mm_scatter(a_sl, b_sl, ao, bo, seg, perm, bounds):
        stride = base.nt_c + 1
        tm, tn = base.tm, base.tn
        gk, max_a, max_b = base.gk, base.max_a, base.max_b
        out = jnp.zeros((), jnp.int32)
        for p in range(plan.sa + plan.sb - 1):
            m = None
            for s in range(max(0, p - plan.sb + 1), min(plan.sa - 1, p) + 1):
                d = jax.lax.dot_general(
                    a_sl[s], b_sl[p - s],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.HIGHEST)
                m = d if m is None else m + d
            pairs = (m.reshape(gk, max_a, tm, max_b, tn)
                      .transpose(0, 1, 3, 2, 4).reshape(-1, tm, tn))
            acc = jnp.zeros((stride, tm, tn), jnp.int32)
            mp = acc.at[seg].add(pairs)[:base.nt_c]
            out = out + jnp.sum(mp[:1])
        return out.astype(jnp.float32)

    def full(a_sl, b_sl, ao, bo, seg, perm, bounds):
        h, _m, _l, c = oz.ozaki_core(a_sl, b_sl, ao, bo, seg, perm,
                                     bounds, combine="scatter", **kw)
        return jnp.sum(h[:1]) + jnp.sum(c[:1]).astype(jnp.float32)

    loop = 10
    for name, fn in (("mm_only", mm_only), ("mm_scatter", mm_scatter),
                     ("full", full)):
        @jax.jit
        def chain(a_sl, b_sl, ao, bo, seg, perm, bounds, fn=fn):
            def body(i, acc):
                dep = (acc * jnp.float32(1e-30)).astype(jnp.int8)
                return acc + fn(a_sl + dep, b_sl, ao, bo, seg, perm, bounds)
            return jax.lax.fori_loop(0, loop, body, jnp.float32(0))
        ms, rtt = chained_device_ms(chain, jax.device_put(
            jnp.zeros(8, jnp.float32)), *arrs, repeats=2, loop=loop)
        print(f"{name:12s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
