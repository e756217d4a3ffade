#!/usr/bin/env python
"""Hardware verification drive: exercises the public API end to end on
the REAL TPU against an independent numpy dense matmul (not the library's
own oracles). Run:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_tpu.py

Exit 0 = all checks pass. This is the script the project verify skill
(.claude/skills/verify) runs; keep it current as the API grows.
"""

import sys

import numpy as np

import jax
print("devices:", jax.devices())

from spgemm_tpu.io.mmio import read_mtx
from spgemm_tpu.ops.spgemm import spgemm_csr

a, _sym = read_mtx("/root/reference/UnitTest/CSR2TILE/banded_36x36.mtx")
ad = a.to_dense()
ref_sq = ad @ ad
ref_aat = ad @ ad.T

fails = 0
for backend in ("strip", "gustavson", "dense", "esc", "xla"):
    c, res = spgemm_csr(a, backend=backend)
    got = c.to_dense()
    ok = np.allclose(got, ref_sq, rtol=1e-5, atol=1e-8)
    print(f"A^2  backend={backend:10s} nnzC={c.nnz} ok={ok}")
    fails += not ok

    c2, _ = spgemm_csr(a, aat=True, backend=backend)
    ok2 = np.allclose(c2.to_dense(), ref_aat, rtol=1e-5, atol=1e-8)
    print(f"AAT  backend={backend:10s} nnzC={c2.nnz} ok={ok2}")
    fails += not ok2

# a bigger random problem on the strip path (the bench kernel)
rng = np.random.default_rng(0)
from spgemm_tpu.models.csr import CSR
m, nnz = 700, 9000
ar = CSR.from_coo(rng.integers(0, m, nnz), rng.integers(0, m, nnz),
                  rng.normal(size=nnz), (m, m))
ard = ar.to_dense()
c3, _ = spgemm_csr(ar, tm=16, tn=128, backend="strip")
ok3 = np.allclose(c3.to_dense(), ard @ ard, rtol=1e-4, atol=1e-6)
print(f"random 700x700 strip ok={ok3}")
fails += not ok3

# the same random problem through the digit-ESC engine (auto picks it
# for unstructured patterns), plus a skewed power-law-ish matrix with a
# heavy row wider than one 2048-slot group
c3e, res3e = spgemm_csr(ar, backend="esc")
ok3e = np.allclose(c3e.to_dense(), ard @ ard, rtol=1e-4, atol=1e-6)
print(f"random 700x700 esc ok={ok3e}")
fails += not ok3e
# EscExecutor: resident-operand serving loop — run, value refresh
# (native fused gather-multiply), and the in-kernel-multiply variant
from spgemm_tpu.ops.esc import build_esc_scan_plan as _besp
from spgemm_tpu.ops.executor import EscExecutor

pex = _besp(ar, ar, keep_sources=True)
for mode in ("premul", "mul"):
    exq = EscExecutor(pex, mode=mode)
    cex = exq.run_csr()
    okx = np.allclose(cex.to_dense(), ard @ ard, rtol=1e-4, atol=1e-6)
    new_vals = rng.standard_normal(ar.nnz)
    exq.update_values(new_vals, ar.data)
    ar2d = CSR(ar.indptr, ar.indices, new_vals, ar.shape).to_dense()
    cex2 = exq.run_csr()
    okx2 = np.allclose(cex2.to_dense(), ar2d @ ard, rtol=1e-4, atol=1e-6)
    print(f"esc executor mode={mode} run ok={okx} refresh ok={okx2}")
    fails += (not okx) + (not okx2)

# f64 double-double scan engine: exact on integer values
from spgemm_tpu.ops.esc import build_esc_scan_plan, esc_scan_dd
ai = CSR.from_coo(rng.integers(0, 700, 9000), rng.integers(0, 700, 9000),
                  rng.integers(1, 10, 9000).astype(np.float64), (700, 700))
pdd = build_esc_scan_plan(ai, ai)
cdd = esc_scan_dd(pdd, ai.data, ai.data, interpret=False)
okdd = np.array_equal(cdd.to_dense(), ai.to_dense() @ ai.to_dense())
print(f"f64 double-double scan exact ok={okdd}")
fails += not okdd

hr = np.concatenate([np.zeros(2500, np.int64), rng.integers(1, 600, 4000)])
hc = np.concatenate([rng.choice(3000, 2500, replace=False),
                     rng.integers(0, 3000, 4000)])
heavy = CSR.from_coo(hr, hc, rng.normal(size=hr.size), (600, 3000))
tall = CSR.from_coo(rng.integers(0, 3000, 9000),
                    rng.integers(0, 3000, 9000),
                    rng.normal(size=9000), (3000, 3000))
ch, resh = spgemm_csr(heavy, b=tall, backend="esc")
okh = np.allclose(ch.to_dense(), heavy.to_dense() @ tall.to_dense(),
                  rtol=1e-4, atol=1e-6)
print(f"heavy-row 600x3000 esc ok={okh} backend={resh.stats['backend']}")
fails += not okh

# error paths
try:
    spgemm_csr(CSR.from_coo([0], [1], [1.0], (2, 3)))
    print("ERROR: non-square A^2 accepted"); fails += 1
except ValueError as e:
    print("non-square A^2 rejected:", e)
try:
    spgemm_csr(ar, b=ar, aat=True)
    print("ERROR: b+aat accepted"); fails += 1
except ValueError as e:
    print("b+aat rejected:", e)
try:
    import jax.numpy as jnp
    spgemm_csr(ar, compute_dtype=jnp.float64, backend="strip")
    print("ERROR: fp64 without x64 accepted on a tiled backend")
    fails += 1
except ValueError as e:
    print("fp64 w/o x64 rejected (tiled backends):", e)
# the ESC double-double path needs no x64 (f32 device arithmetic)
cdd0, rdd0 = spgemm_csr(ar, compute_dtype=jnp.float64, backend="esc")
okdd0 = np.allclose(cdd0.to_dense(), ard @ ard, rtol=1e-12, atol=1e-12)
print(f"fp64 via esc double-double (no x64) ok={okdd0}")

# r3: f64 through backend="auto" on a STRUCTURED matrix with integer
# values routes to the f32-exact fast path (provable 2^24 bound) and
# must be BIT-exact; the explicit ozaki backend (S=1: ONE int8 MXU
# matmul per slab pair) must also be exact and must compile on real
# Mosaic/XLA:TPU (int8 x int8 -> int32 dot_general)
sr = np.repeat(np.arange(512), 65)
sc = sr + np.tile(np.arange(-32, 33), 512)
sk = (sc >= 0) & (sc < 512)
astr = CSR.from_coo(sr[sk], sc[sk],
                    ((sr[sk] * 3 + sc[sk]) % 9 + 1).astype(np.float64),
                    (512, 512))
cda, rda = spgemm_csr(astr, compute_dtype=jnp.float64, backend="auto")
okda = ("f64-exact-int" in str(rda.stats["backend"])
        and np.array_equal(cda.to_dense(),
                           astr.to_dense() @ astr.to_dense()))
print(f"fp64 auto->f32-exact structured ok={okda} "
      f"(backend={rda.stats['backend']})")
fails += not okda
cdo, rdo = spgemm_csr(astr, compute_dtype=jnp.float64, backend="ozaki")
okdo = (str(rdo.stats["backend"]).startswith("ozaki")
        and np.array_equal(cdo.to_dense(),
                           astr.to_dense() @ astr.to_dense()))
print(f"fp64 explicit ozaki (S=1 int8 matmul) ok={okdo} "
      f"(backend={rdo.stats['backend']})")
fails += not okdo
# scatter-free combine on real hardware: permute + WRAPPING int32
# cumsum + boundary diffs must equal the scatter path exactly (an XLA
# slab engine A/B — force the xla kernel, the combine knob is inert on
# the fused strip route)
import os as _os

_os.environ["SPGEMM_OZAKI_KERNEL"] = "xla"
try:
    cdx, _ = spgemm_csr(astr, compute_dtype=jnp.float64, backend="ozaki")
    _os.environ["SPGEMM_OZAKI_COMBINE"] = "cumsum"
    cdc, _ = spgemm_csr(astr, compute_dtype=jnp.float64, backend="ozaki")
    okdc = np.array_equal(cdc.to_dense(), cdx.to_dense())
finally:
    _os.environ.pop("SPGEMM_OZAKI_COMBINE", None)
    _os.environ.pop("SPGEMM_OZAKI_KERNEL", None)
print(f"ozaki cumsum combine == scatter on hw ok={okdc}")
fails += not okdc
# r4: the fused strip kernel (int8 MXU dots + VMEM group accumulators +
# in-kernel triple-float) must route, run on real Mosaic, and be
# bit-exact on the integer model / f64-class on gaussian values
okst = ("ozaki-strip" in str(rdo.stats["backend"])
        and np.array_equal(cdx.to_dense(), cdo.to_dense()))
print(f"ozaki fused strip kernel == xla slab engine (S=1, exact) "
      f"ok={okst} (backend={rdo.stats['backend']})")
fails += not okst
# Mosaic must not algebraically fold the in-kernel TwoSum (the fused
# kernel's triple-float compensation depends on IEEE-exact rounding of
# (a + b) - a); a folded compile would return err == 0 here
import jax as _jax
from jax.experimental import pallas as _pl


def _twosum_probe(x_ref, o_ref):
    x = x_ref[...]
    y = x * jnp.float32(2.0 ** -30)
    s = x + y
    bb = s - x
    o_ref[...] = (x - (s - bb)) + (y - bb)


_tp = _pl.pallas_call(
    _twosum_probe,
    out_shape=_jax.ShapeDtypeStruct((8, 128), jnp.float32),
)(jnp.full((8, 128), 1.0, jnp.float32))
oktf = bool(np.all(np.asarray(_tp) == np.float32(2.0 ** -30)))
print(f"mosaic TwoSum not folded (err == 2^-30) ok={oktf}")
fails += not oktf
# general-significand f64 through ozaki (S=8x8, 64 slice pairs; also
# checks the XLA TwoSum combine is not algebraically folded on TPU)
rngo = np.random.default_rng(42)
astg = CSR.from_coo(sr[sk], sc[sk], rngo.standard_normal(int(sk.sum())),
                    (512, 512))
cdg, rdg = spgemm_csr(astg, compute_dtype=jnp.float64, backend="auto")
refg = astg.to_dense() @ astg.to_dense()
okdg = (str(rdg.stats["backend"]).startswith("ozaki")
        and np.allclose(cdg.to_dense(), refg, rtol=1e-12, atol=1e-12))
print(f"fp64 ozaki general values ok={okdg} "
      f"(backend={rdg.stats['backend']})")
fails += not okdg
fails += not okdd0

# SpMM strip kernel on hardware
from spgemm_tpu.models.tile import csr_to_tiles
from spgemm_tpu.ops.spmm import spmm, spmv
t = csr_to_tiles(ar, 16, 128)
xk = rng.standard_normal((ar.n, 64)).astype(np.float32)
y = np.asarray(spmm(t, xk))
ok = np.allclose(y, ard.astype(np.float32) @ xk, rtol=1e-4, atol=1e-5)
print("spmm strip 700x700 k=64 ok=", ok)
yv = np.asarray(spmv(t, xk[:, 0]))
okv = np.allclose(yv, ard.astype(np.float32) @ xk[:, 0], rtol=1e-4, atol=1e-5)
print("spmv ok=", okv)
fails += (not ok) + (not okv)

# rectangular A @ B on hardware through the strip kernel
br = CSR.from_coo(rng.integers(0, 300, 5000), rng.integers(0, 900, 5000),
                  rng.normal(size=5000), (300, 900))
arect = CSR.from_coo(rng.integers(0, 700, 8000), rng.integers(0, 300, 8000),
                     rng.normal(size=8000), (700, 300))
from spgemm_tpu.ops.spgemm import spgemm
from spgemm_tpu.models.tile import tiles_to_csr
atr = csr_to_tiles(arect, 16, 128)
btr = csr_to_tiles(br, 128, 128)
res = spgemm(atr, btr, backend="strip")
okr = np.allclose(tiles_to_csr(res.c).to_dense(),
                  arect.to_dense() @ br.to_dense(), rtol=1e-4, atol=1e-6)
print("rect 700x300 @ 300x900 strip ok=", okr, res.stats["backend"])
fails += not okr

# distributed paths on a single-device mesh (multi-chip logic, D=1)
from spgemm_tpu.parallel.dist import (make_mesh, spgemm_sharded,
                                      spgemm_sharded_ring,
                                      spgemm_sharded_strip)
mesh1 = make_mesh(1)
tsm = csr_to_tiles(ar, 16, 16)
for fn, tag in ((spgemm_sharded, "sharded"), (spgemm_sharded_ring, "ring")):
    cs = fn(tsm, tsm, mesh1)
    from spgemm_tpu.models.tile import tiles_to_csr as t2c
    okd = np.allclose(t2c(cs).to_dense(), ard @ ard, rtol=1e-4, atol=1e-6)
    print(f"dist {tag} (mesh=1) ok= {okd}")
    fails += not okd
# sharded strip (per-shard symbolic + device compaction) with the
# production 16x128 tiles on hardware
from spgemm_tpu.models.tile import tiles_to_csr as t2c
cs = spgemm_sharded_strip(t, csr_to_tiles(ar, 128, 128), mesh1)
okd = np.allclose(t2c(cs).to_dense(), ard @ ard, rtol=1e-4, atol=1e-6)
print(f"dist strip (mesh=1) ok= {okd}")
fails += not okd
# sharded ESC (zero-collective unstructured shard)
from spgemm_tpu.parallel.dist import spgemm_sharded_esc
ce = spgemm_sharded_esc(ar, ar, mesh1)
oke = np.allclose(ce.to_dense(), ard @ ard, rtol=1e-4, atol=1e-6)
print(f"dist esc (mesh=1) ok= {oke}")
fails += not oke

# r3: device combine tail path (windows taller than COMBINE_K rows) and
# meta16-vs-meta32 kernel identity, both on hardware
from spgemm_tpu.ops.esc import (COMBINE_K, esc_scan_pallas, meta16_plane,
                                esc_scan_numeric_combined,
                                esc_scan_trim_combined)
bn = 384
boffs = np.arange(-40, 41)
br = np.repeat(np.arange(bn), boffs.size)
bc = br + np.tile(boffs, bn)
bkeep = (bc >= 0) & (bc < bn)
bval = ((br[bkeep] * 7 + bc[bkeep] * 13) % 9 + 1).astype(np.float64)
bdup = CSR.from_coo(br[bkeep], bc[bkeep], bval, (bn, bn))
pdup = build_esc_scan_plan(bdup, bdup)
assert (np.diff(pdup.win_rowptr) > COMBINE_K).any()
rr, tt = esc_scan_numeric_combined(pdup, interpret=False)
cdup = esc_scan_trim_combined(pdup, rr, tt)
okc = np.array_equal(cdup.to_dense(), bdup.to_dense() @ bdup.to_dense())
print(f"device combine (tall windows) exact ok={okc}")
fails += not okc
import jax.numpy as _jnp
o32 = esc_scan_pallas(_jnp.asarray(pdup.qv), _jnp.asarray(pdup.meta),
                      passes=pdup.passes, interpret=False)
o16 = esc_scan_pallas(_jnp.asarray(pdup.qv),
                      _jnp.asarray(meta16_plane(pdup.meta)),
                      passes=pdup.passes, interpret=False)
okm = np.array_equal(np.asarray(o32), np.asarray(o16))
print(f"meta16 == meta32 kernel output ok={okm}")
fails += not okm

print("FAILS:", fails)
sys.exit(1 if fails else 0)
