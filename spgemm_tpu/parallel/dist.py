"""Multi-chip SpGEMM over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md 2.7); this module is the
framework's distributed extension per the north-star spec
(BASELINE.json): **A tile-rows partitioned across devices, B tiles
all-gathered over ICI, C tiles owner-computed** — SPMD via
jax.shard_map, with XLA inserting the collectives.

Partitioning: C tile-row i is owned by the device owning A tile-row i,
so every pair (A(i,k), B(k,j)) lands on the owner of its output tile —
no cross-device reduction is needed (contrast with an A-column split
which would psum). Devices exchange only B tiles (one all-gather), which
rides ICI and overlaps with the first pair chunks under XLA's scheduler.

Host-side planning (plan_row_partition) balances devices by *pair count*
(compute load), not tile count, then pads every per-device array to the
max so shapes are identical across shards — the SPMD analogue of the
reference's size-binned kernel dispatch.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from spgemm_tpu.models.csr import INDEX_DTYPE
from spgemm_tpu.models.tile import TileMat, cdiv
from spgemm_tpu.ops.symbolic import PairSchedule, build_pair_schedule


@dataclasses.dataclass
class DistPlan:
    """Host-side SPMD execution plan for one (A, B, mesh-size) triple."""

    ndev: int
    # per-device padded arrays, all stacked on axis 0 (the mesh axis)
    a_val: np.ndarray    # (D, ntA_max, tm, tk)
    a_occ: np.ndarray
    b_val: np.ndarray    # (D, ntB_max, tk, tn)  (sharded; all-gathered on device)
    b_occ: np.ndarray
    pa: np.ndarray       # (D, P_max) local A tile index
    pb: np.ndarray       # (D, P_max) index into the all-gathered padded B
    seg: np.ndarray      # (D, P_max) local C segment, padding -> S_max
    s_max: int           # local segments per device (excl. dummy)
    # bookkeeping to reassemble C on host
    seg_counts: np.ndarray   # (D,) real segments per device
    ctrow: np.ndarray        # (ntC,) global candidate C tile coords
    ctcol: np.ndarray
    schedule: PairSchedule


def plan_row_partition(
    a: TileMat, b: TileMat, ndev: int, dtype=np.float32
) -> DistPlan:
    """Partition A tile-rows (and C tile-rows with them) over `ndev`
    devices, balancing total pair count per device."""
    sched = build_pair_schedule(a, b)

    # pairs per C tile-row -> contiguous row ranges with ~equal pairs
    pairs_per_seg = np.diff(sched.pair_ptr).astype(np.int64)
    seg_row = sched.ctrow  # sorted ascending
    pairs_per_row = np.zeros(a.gm, dtype=np.int64)
    np.add.at(pairs_per_row, seg_row, pairs_per_seg)
    cum = np.cumsum(pairs_per_row)
    total = int(cum[-1]) if cum.size else 0
    # row range for device d: rows with cum in (d*total/D, (d+1)*total/D]
    bounds = np.searchsorted(cum, np.arange(1, ndev) * (total / ndev))
    row_start = np.concatenate([[0], bounds + 1]) if ndev > 1 else np.array([0])
    row_end = np.concatenate([bounds + 1, [a.gm]]) if ndev > 1 else np.array([a.gm])

    # A tiles are sorted by tile-row: device ranges are contiguous slices
    a_lo = a.tptr[row_start].astype(np.int64)
    a_hi = a.tptr[row_end].astype(np.int64)
    ntA_max = max(1, int((a_hi - a_lo).max()) if a.nt else 1)

    # B tiles: even contiguous shard; devices all-gather at run time
    ntB_shard = max(1, cdiv(max(b.nt, 1), ndev))
    ntB_pad = ntB_shard * ndev

    ad, ao = a.dense(dtype), a.occ().astype(np.float32)
    bd, bo = b.dense(dtype), b.occ().astype(np.float32)

    a_val = np.zeros((ndev, ntA_max) + ad.shape[1:], dtype=dtype)
    a_occ = np.zeros((ndev, ntA_max) + ao.shape[1:], dtype=np.float32)
    for d in range(ndev):
        n = a_hi[d] - a_lo[d]
        a_val[d, :n] = ad[a_lo[d] : a_hi[d]]
        a_occ[d, :n] = ao[a_lo[d] : a_hi[d]]

    b_val = np.zeros((ndev, ntB_shard) + bd.shape[1:], dtype=dtype)
    b_occ = np.zeros((ndev, ntB_shard) + bo.shape[1:], dtype=np.float32)
    flatb = np.zeros((ntB_pad,) + bd.shape[1:], dtype=dtype)
    flato = np.zeros((ntB_pad,) + bo.shape[1:], dtype=np.float32)
    flatb[: b.nt] = bd
    flato[: b.nt] = bo
    for d in range(ndev):
        b_val[d] = flatb[d * ntB_shard : (d + 1) * ntB_shard]
        b_occ[d] = flato[d * ntB_shard : (d + 1) * ntB_shard]

    # segments (C tiles) per device: contiguous because ctrow is sorted
    seg_dev = np.searchsorted(row_start[1:], seg_row, side="right") \
        if ndev > 1 else np.zeros(sched.nt_c, dtype=np.int64)
    seg_counts = np.bincount(seg_dev, minlength=ndev)
    seg_off = np.concatenate([[0], np.cumsum(seg_counts)[:-1]])
    s_max = max(1, int(seg_counts.max()) if sched.nt_c else 1)

    pair_dev = seg_dev[sched.seg] if sched.num_pairs else np.zeros(0, np.int64)
    p_counts = np.bincount(pair_dev, minlength=ndev)
    p_max = max(1, int(p_counts.max()) if sched.num_pairs else 1)

    pa = np.zeros((ndev, p_max), dtype=np.int32)
    pb = np.zeros((ndev, p_max), dtype=np.int32)
    seg = np.full((ndev, p_max), s_max, dtype=np.int32)  # padding -> dummy
    for d in range(ndev):
        sel = pair_dev == d
        n = int(sel.sum())
        pa[d, :n] = sched.pa[sel] - a_lo[d]
        pb[d, :n] = sched.pb[sel]           # global == all-gathered index
        seg[d, :n] = sched.seg[sel] - seg_off[d]

    return DistPlan(
        ndev=ndev,
        a_val=a_val, a_occ=a_occ, b_val=b_val, b_occ=b_occ,
        pa=pa, pb=pb, seg=seg, s_max=s_max,
        seg_counts=seg_counts, ctrow=sched.ctrow, ctcol=sched.ctcol,
        schedule=sched,
    )


def _device_fn(a_val, a_occ, b_val, b_occ, pa, pb, seg, *, s_max, acc_dtype):
    """Per-shard body: all-gather B over ICI, then local pair products."""
    b_val_g = jax.lax.all_gather(b_val[0], "x", axis=0, tiled=True)
    b_occ_g = jax.lax.all_gather(b_occ[0], "x", axis=0, tiled=True)

    prod = jax.lax.dot_general(
        a_val[0][pa[0]], b_val_g[pb[0]],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    cnt = jax.lax.dot_general(
        a_occ[0][pa[0]], b_occ_g[pb[0]],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    tm, tn = prod.shape[1], prod.shape[2]
    c_val = jnp.zeros((s_max + 1, tm, tn), acc_dtype)
    c_cnt = jnp.zeros((s_max + 1, tm, tn), jnp.float32)
    c_val = c_val.at[seg[0]].add(prod)
    c_cnt = c_cnt.at[seg[0]].add(cnt)
    return c_val[None, :-1], c_cnt[None, :-1]


def spgemm_sharded_pairs(
    a: TileMat,
    b: TileMat,
    mesh: Mesh,
    *,
    acc_dtype=jnp.float32,
) -> TileMat:
    """Pair-gather distributed SpGEMM (simple, used as a cross-check for
    the gustavson SPMD path)."""
    ndev = mesh.devices.size
    plan = plan_row_partition(a, b, ndev)

    fn = jax.jit(
        jax.shard_map(
            functools.partial(
                _device_fn, s_max=plan.s_max, acc_dtype=acc_dtype
            ),
            mesh=mesh,
            in_specs=(P("x"),) * 7,
            out_specs=(P("x"), P("x")),
            check_vma=False,
        )
    )
    c_val_d, c_cnt_d = fn(
        jnp.asarray(plan.a_val), jnp.asarray(plan.a_occ),
        jnp.asarray(plan.b_val), jnp.asarray(plan.b_occ),
        jnp.asarray(plan.pa), jnp.asarray(plan.pb), jnp.asarray(plan.seg),
    )
    # reassemble: device d's first seg_counts[d] segments are real
    c_val = np.asarray(c_val_d, dtype=np.float64).reshape(
        ndev, plan.s_max, a.tm, b.tn
    )
    c_cnt = np.asarray(c_cnt_d).reshape(ndev, plan.s_max, a.tm, b.tn)
    keep_val = np.concatenate(
        [c_val[d, : plan.seg_counts[d]] for d in range(ndev)]
    ) if plan.ctrow.size else np.zeros((0, a.tm, b.tn))
    keep_cnt = np.concatenate(
        [c_cnt[d, : plan.seg_counts[d]] for d in range(ndev)]
    ) if plan.ctrow.size else np.zeros((0, a.tm, b.tn))

    from spgemm_tpu.ops.spgemm import _compact_to_tilemat

    return _compact_to_tilemat(
        plan.ctrow, plan.ctcol, keep_val, keep_cnt,
        (a.m, b.n), a.tm, b.tn,
    )


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]).reshape(n), ("x",))


# --- Gustavson SPMD path (the production formulation) ---------------------


@dataclasses.dataclass
class GustavsonDistPlan:
    ndev: int
    gk: int
    max_a: int          # max A tiles per (device, k)
    max_b: int
    tm: int
    tn: int
    s_max: int
    a3_val: np.ndarray  # (D, gk, max_a*tm, tk)
    a3_occ: np.ndarray
    b3_val: np.ndarray  # (D, gk_shard, tk, max_b*tn) sharded over k
    b3_occ: np.ndarray
    seg: np.ndarray     # (D, gk*max_a*max_b) local segments, pad -> s_max
    seg_counts: np.ndarray
    ctrow: np.ndarray   # global C tile coords (concatenated device order)
    ctcol: np.ndarray


def plan_gustavson_partition(
    a: TileMat, b: TileMat, ndev: int, dtype=np.float32
) -> GustavsonDistPlan:
    """Row-partition A (balanced by pair count) and build one Gustavson
    plan per device; B slabs are built once and sharded over k."""
    from spgemm_tpu.models.tile import cdiv
    from spgemm_tpu.ops.gustavson import build_gustavson_plan

    # balance rows by pairs (reuse the expansion logic cheaply)
    k = a.tcol.astype(np.int64)
    bptr = b.tptr.astype(np.int64)
    pair_per_tile = bptr[k + 1] - bptr[k]
    pairs_per_row = np.zeros(a.gm, dtype=np.int64)
    np.add.at(pairs_per_row, a.trow, pair_per_tile)
    cum = np.cumsum(pairs_per_row)
    total = int(cum[-1]) if cum.size else 0
    bounds = np.searchsorted(cum, np.arange(1, ndev) * (total / ndev))
    row_start = np.concatenate([[0], bounds + 1]) if ndev > 1 else np.array([0])
    row_end = np.concatenate([bounds + 1, [a.gm]]) if ndev > 1 else np.array([a.gm])

    plans = []
    for d in range(ndev):
        a_d = a.slice_tile_rows(int(row_start[d]), int(row_end[d]))
        plans.append(build_gustavson_plan(a_d, b, dtype=dtype))

    gk = plans[0].gk
    tm, tk, tn = a.tm, a.tn, b.tn
    max_a = max(1, max(p.max_a for p in plans))
    max_b = max(1, max(p.max_b for p in plans))
    s_max = max(1, max(p.nt_c for p in plans))

    a3_val = np.zeros((ndev, gk, max_a * tm, tk), dtype=dtype)
    a3_occ = np.zeros_like(a3_val)
    seg = np.full((ndev, gk * max_a * max_b), s_max, dtype=np.int32)
    ctrow_parts, ctcol_parts = [], []
    for d, p in enumerate(plans):
        a3_val[d, :, : p.max_a * tm] = p.a3_val
        a3_occ[d, :, : p.max_a * tm] = p.a3_occ
        # remap seg slots (gk, p.max_a, p.max_b) -> (gk, max_a, max_b)
        src = p.seg.reshape(gk, p.max_a, p.max_b)
        dst = seg[d].reshape(gk, max_a, max_b)
        dst[:, : p.max_a, : p.max_b] = np.where(
            src == p.nt_c, s_max, src
        )
        ctrow_parts.append(p.ctrow + int(row_start[d]))
        ctcol_parts.append(p.ctcol)

    # B slabs: shared across devices; shard over k (pad gk to D multiple)
    bp = plans[0]
    gk_shard = cdiv(gk, ndev)
    b3_val = np.zeros((ndev, gk_shard, tk, max_b * tn), dtype=dtype)
    b3_occ = np.zeros_like(b3_val)
    bsrc_v = np.zeros((gk_shard * ndev, tk, max_b * tn), dtype=dtype)
    bsrc_o = np.zeros_like(bsrc_v)
    bsrc_v[:gk, :, : bp.max_b * tn] = bp.b3_val
    bsrc_o[:gk, :, : bp.max_b * tn] = bp.b3_occ
    for d in range(ndev):
        b3_val[d] = bsrc_v[d * gk_shard : (d + 1) * gk_shard]
        b3_occ[d] = bsrc_o[d * gk_shard : (d + 1) * gk_shard]

    return GustavsonDistPlan(
        ndev=ndev, gk=gk, max_a=max_a, max_b=max_b, tm=tm, tn=tn,
        s_max=s_max,
        a3_val=a3_val, a3_occ=a3_occ, b3_val=b3_val, b3_occ=b3_occ,
        seg=seg,
        seg_counts=np.array([p.nt_c for p in plans]),
        ctrow=np.concatenate(ctrow_parts) if plans else np.zeros(0, np.int32),
        ctcol=np.concatenate(ctcol_parts) if plans else np.zeros(0, np.int32),
    )


def spgemm_sharded(
    a: TileMat,
    b: TileMat,
    mesh: Mesh,
    *,
    acc_dtype=jnp.float32,
) -> TileMat:
    """Distributed C = A @ B over all devices of `mesh` (one axis "x"):
    A tile-rows partitioned per device (pair-count balanced), B slabs
    sharded over the inner dimension and all-gathered over ICI inside the
    shard_map body, C tiles owner-computed with the Gustavson slab
    formulation (no cross-device reduction)."""
    from spgemm_tpu.ops.gustavson import gustavson_core

    ndev = mesh.devices.size
    plan = plan_gustavson_partition(a, b, ndev)
    gk_pad = plan.b3_val.shape[1] * ndev

    def device_fn(a3v, a3o, b3v, b3o, seg):
        b3v_g = jax.lax.all_gather(b3v[0], "x", axis=0, tiled=True)[: plan.gk]
        b3o_g = jax.lax.all_gather(b3o[0], "x", axis=0, tiled=True)[: plan.gk]
        cv, cc = gustavson_core(
            a3v[0], a3o[0], b3v_g, b3o_g, seg[0],
            gk=plan.gk, max_a=plan.max_a, max_b=plan.max_b,
            tm=plan.tm, tn=plan.tn, nt_c=plan.s_max,
            acc_dtype=acc_dtype,
        )
        return cv[None], cc[None]

    fn = jax.jit(
        jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P("x"),) * 5,
            out_specs=(P("x"), P("x")),
            check_vma=False,
        )
    )
    c_val_d, c_cnt_d = fn(
        jnp.asarray(plan.a3_val), jnp.asarray(plan.a3_occ),
        jnp.asarray(plan.b3_val), jnp.asarray(plan.b3_occ),
        jnp.asarray(plan.seg),
    )
    c_val = np.asarray(c_val_d, dtype=np.float64)
    c_cnt = np.asarray(c_cnt_d)
    keep_val = np.concatenate(
        [c_val[d, : plan.seg_counts[d]] for d in range(ndev)]
    ) if plan.ctrow.size else np.zeros((0, plan.tm, plan.tn))
    keep_cnt = np.concatenate(
        [c_cnt[d, : plan.seg_counts[d]] for d in range(ndev)]
    ) if plan.ctrow.size else np.zeros((0, plan.tm, plan.tn))

    from spgemm_tpu.ops.spgemm import _compact_to_tilemat

    return _compact_to_tilemat(
        plan.ctrow, plan.ctcol, keep_val, keep_cnt,
        (a.m, b.n), a.tm, b.tn,
    )


# --- Distributed strip path (Pallas kernel under shard_map) ----------------


@dataclasses.dataclass
class StripDistPlan:
    ndev: int
    blocks_max: int      # grid blocks per device (padded)
    gm_max: int          # tile-rows per device (padded)
    blk_lo: np.ndarray   # (D,) first block owned by each device
    # per-device stacked operands (mesh axis 0)
    a_val: np.ndarray
    a_occ: np.ndarray
    b_val: np.ndarray    # sharded over k; all-gathered on device
    b_occ: np.ndarray
    aptr: np.ndarray
    ak: np.ndarray
    slots: np.ndarray
    args: "object"       # the global StripArgs (symbolic results)


def plan_strip_partition(
    a: TileMat, b: TileMat, ndev: int, *, block_rows: int = 32,
    dtype=np.float32,
) -> StripDistPlan:
    """Build ONE global strip plan, then slice it per device along block
    boundaries (pair-count balanced). B slabs are sharded over k and
    all-gathered over ICI at run time."""
    from spgemm_tpu.ops.gustavson import build_strip_args

    # cached-B kernel variant: per-device slices share one global B layout
    args = build_strip_args(a, b, block_rows=block_rows, dtype=dtype,
                            window=False)
    n_blocks = max(1, cdiv(args.gm, block_rows))

    # pairs per block -> contiguous block ranges with ~equal pairs
    bptr = b.tptr.astype(np.int64)
    pair_per_tile = bptr[a.tcol.astype(np.int64) + 1] - bptr[a.tcol]
    pairs_per_row = np.zeros(args.gm, dtype=np.int64)
    np.add.at(pairs_per_row, a.trow, pair_per_tile)
    pairs_per_block = np.add.reduceat(
        pairs_per_row, np.arange(0, args.gm, block_rows)
    ) if args.gm else np.zeros(1, np.int64)
    cum = np.cumsum(pairs_per_block)
    total = int(cum[-1]) if cum.size else 0
    bounds = np.searchsorted(cum, np.arange(1, ndev) * (total / ndev))
    blk_lo = np.concatenate([[0], bounds + 1]) if ndev > 1 else np.array([0])
    blk_hi = np.concatenate([bounds + 1, [n_blocks]]) if ndev > 1 \
        else np.array([n_blocks])
    blk_lo = np.minimum(blk_lo, n_blocks)
    blk_hi = np.minimum(np.maximum(blk_hi, blk_lo), n_blocks)

    blocks_max = max(1, int((blk_hi - blk_lo).max()))
    gm_max = blocks_max * block_rows
    aptr64 = args.aptr.astype(np.int64)
    row_lo = np.minimum(blk_lo * block_rows, args.gm)
    row_hi = np.minimum(blk_hi * block_rows, args.gm)
    a_lo, a_hi = aptr64[row_lo], aptr64[row_hi]
    nt_max = max(1, int((a_hi - a_lo).max()))
    nt_pad = nt_max + args.max_ablock

    tm, tk = args.tm, args.tk
    a_val = np.zeros((ndev, nt_pad, tm, tk), dtype=args.a_val.dtype)
    a_occ = np.zeros((ndev, nt_pad, tm, tk), dtype=args.a_occ.dtype)
    aptr = np.zeros((ndev, gm_max + 1), dtype=np.int32)
    ak = np.zeros((ndev, nt_pad), dtype=np.int32)
    slots = np.full((ndev, nt_pad * args.max_b), args.max_cblock,
                    dtype=np.int32)
    for d in range(ndev):
        n = int(a_hi[d] - a_lo[d])
        a_val[d, :n] = args.a_val[a_lo[d] : a_hi[d]]
        a_occ[d, :n] = args.a_occ[a_lo[d] : a_hi[d]]
        ak[d, :n] = args.ak[a_lo[d] : a_hi[d]]
        nrows = int(row_hi[d] - row_lo[d])
        aptr[d, : nrows + 1] = (aptr64[row_lo[d] : row_hi[d] + 1]
                                - a_lo[d]).astype(np.int32)
        aptr[d, nrows + 1 :] = aptr[d, nrows]
        mb = args.max_b
        slots[d, : n * mb] = args.slots[a_lo[d] * mb : a_hi[d] * mb]

    # B slabs sharded over k (padded to a D multiple)
    gk = args.b_val.shape[0]
    gk_shard = cdiv(gk, ndev)
    bsh = args.b_val.shape[1:]
    b_val = np.zeros((ndev, gk_shard) + bsh, dtype=args.b_val.dtype)
    b_occ = np.zeros((ndev, gk_shard) + bsh, dtype=args.b_occ.dtype)
    flat_v = np.zeros((gk_shard * ndev,) + bsh, dtype=args.b_val.dtype)
    flat_o = np.zeros((gk_shard * ndev,) + bsh, dtype=args.b_occ.dtype)
    flat_v[:gk] = args.b_val
    flat_o[:gk] = args.b_occ
    for d in range(ndev):
        b_val[d] = flat_v[d * gk_shard : (d + 1) * gk_shard]
        b_occ[d] = flat_o[d * gk_shard : (d + 1) * gk_shard]

    return StripDistPlan(
        ndev=ndev, blocks_max=blocks_max, gm_max=gm_max, blk_lo=blk_lo,
        a_val=a_val, a_occ=a_occ, b_val=b_val, b_occ=b_occ,
        aptr=aptr, ak=ak, slots=slots, args=args,
    )


def spgemm_sharded_strip(
    a: TileMat,
    b: TileMat,
    mesh: Mesh,
    *,
    block_rows: int = 32,
    acc_dtype=jnp.float32,
    interpret: bool | None = None,
) -> TileMat:
    """Distributed C = A @ B running the production Pallas strip kernel
    per shard: A blocks partitioned per device, B slabs all-gathered over
    ICI inside the shard_map body, C owner-computed in the block-padded
    layout (SURVEY.md §2.7's north-star decomposition)."""
    from spgemm_tpu.ops.pallas_kernels import gustavson_strip_pallas
    from spgemm_tpu.ops.spgemm import _compact_to_tilemat

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ndev = mesh.devices.size
    plan = plan_strip_partition(a, b, ndev, block_rows=block_rows)
    args = plan.args
    from spgemm_tpu.ops.gustavson import check_strip_feasible

    check_strip_feasible(args, interpret,
                         slot_entries=int(plan.slots.shape[1]))
    gk = args.b_val.shape[0]

    kernel_kwargs = dict(
        gm=plan.gm_max, max_b=args.max_b, max_ablock=args.max_ablock,
        max_cblock=args.max_cblock, block_rows=block_rows,
        acc_dtype=acc_dtype, interpret=interpret,
    )

    def device_fn(av, ao, bv, bo, aptr, ak, slots):
        bv_g = jax.lax.all_gather(bv[0], "x", axis=0, tiled=True)[:gk]
        bo_g = jax.lax.all_gather(bo[0], "x", axis=0, tiled=True)[:gk]
        cv, cc = gustavson_strip_pallas(
            av[0], ao[0], bv_g, bo_g, aptr[0], ak[0], slots[0],
            **kernel_kwargs,
        )
        return cv[None], cc[None]

    fn = jax.jit(
        jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P("x"),) * 7,
            out_specs=(P("x"), P("x")),
            check_vma=False,
        )
    )
    c_val_d, c_cnt_d = fn(
        jnp.asarray(plan.a_val), jnp.asarray(plan.a_occ),
        jnp.asarray(plan.b_val), jnp.asarray(plan.b_occ),
        jnp.asarray(plan.aptr), jnp.asarray(plan.ak),
        jnp.asarray(plan.slots),
    )
    # reassemble: candidate q lives on device d(q) at its block-padded
    # position rebased to that device's first block
    c_val = np.asarray(c_val_d)
    c_cnt = np.asarray(c_cnt_d, dtype=np.float32)
    if args.nt_c:
        cblk = args.ctrow.astype(np.int64) // block_rows
        dev_of = np.searchsorted(plan.blk_lo, cblk, side="right") - 1
        pos = args.gather_idx - plan.blk_lo[dev_of] * args.max_cblock
        keep_val = c_val[dev_of, pos]
        keep_cnt = c_cnt[dev_of, pos]
    else:
        keep_val = np.zeros((0, args.tm, args.tn))
        keep_cnt = np.zeros((0, args.tm, args.tn), np.float32)

    return _compact_to_tilemat(
        args.ctrow, args.ctcol, keep_val.astype(np.float64), keep_cnt,
        (a.m, b.n), args.tm, args.tn,
    )


# --- Ring (ppermute) variant: halo exchange instead of all-gather ----------


def spgemm_sharded_ring(
    a: TileMat,
    b: TileMat,
    mesh: Mesh,
    *,
    acc_dtype=jnp.float32,
) -> TileMat:
    """Distributed C = A @ B with B rotated around the ring instead of
    all-gathered: each device holds one B k-shard at a time, computes the
    partial Gustavson products for the k range it currently holds, and
    passes the shard to its neighbour with `lax.ppermute` (the north-star
    spec's halo-exchange formulation, SURVEY.md §2.7). Peak per-device B
    memory is one shard (1/D of the all-gather variant), and each step's
    compute overlaps the next rotation under XLA's scheduler."""
    from spgemm_tpu.ops.gustavson import gustavson_core

    ndev = mesh.devices.size
    plan = plan_gustavson_partition(a, b, ndev)
    gk, max_a, max_b = plan.gk, plan.max_a, plan.max_b
    tm, tn = plan.tm, plan.tn
    gk_shard = plan.b3_val.shape[1]
    gk_pad = gk_shard * ndev
    s_max = plan.s_max

    # pad A slabs and the segment map over k to the sharded grid
    a3v = np.zeros((ndev, gk_pad) + plan.a3_val.shape[2:],
                   dtype=plan.a3_val.dtype)
    a3o = np.zeros_like(a3v)
    a3v[:, :gk] = plan.a3_val
    a3o[:, :gk] = plan.a3_occ
    seg = np.full((ndev, gk_pad, max_a * max_b), s_max, dtype=np.int32)
    seg[:, :gk] = plan.seg.reshape(ndev, gk, max_a * max_b)

    def device_fn(a3v, a3o, b3v, b3o, seg):
        a3v, a3o, seg = a3v[0], a3o[0], seg[0]
        bv, bo = b3v[0], b3o[0]
        me = jax.lax.axis_index("x")
        perm = [((d + 1) % ndev, d) for d in range(ndev)]

        cv = jnp.zeros((s_max, tm, tn), acc_dtype)
        cc = jnp.zeros((s_max, tm, tn), acc_dtype)
        # static unroll: ndev is a mesh constant, and the final rotation
        # (whose result would be discarded) is skipped
        for s in range(ndev):
            owner = (me + s) % ndev
            k0 = owner * gk_shard
            a3v_s = jax.lax.dynamic_slice_in_dim(a3v, k0, gk_shard, 0)
            a3o_s = jax.lax.dynamic_slice_in_dim(a3o, k0, gk_shard, 0)
            seg_s = jax.lax.dynamic_slice_in_dim(seg, k0, gk_shard, 0)
            cv_p, cc_p = gustavson_core(
                a3v_s, a3o_s, bv, bo, seg_s.reshape(-1),
                gk=gk_shard, max_a=max_a, max_b=max_b,
                tm=tm, tn=tn, nt_c=s_max, acc_dtype=acc_dtype,
            )
            cv = cv + cv_p
            cc = cc + cc_p
            if s + 1 < ndev:
                bv = jax.lax.ppermute(bv, "x", perm)
                bo = jax.lax.ppermute(bo, "x", perm)
        return cv[None], cc[None]

    fn = jax.jit(
        jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P("x"),) * 5,
            out_specs=(P("x"), P("x")),
            check_vma=False,
        )
    )
    c_val_d, c_cnt_d = fn(
        jnp.asarray(a3v), jnp.asarray(a3o),
        jnp.asarray(plan.b3_val), jnp.asarray(plan.b3_occ),
        jnp.asarray(seg),
    )
    c_val = np.asarray(c_val_d, dtype=np.float64)
    c_cnt = np.asarray(c_cnt_d)
    keep_val = np.concatenate(
        [c_val[d, : plan.seg_counts[d]] for d in range(ndev)]
    ) if plan.ctrow.size else np.zeros((0, tm, tn))
    keep_cnt = np.concatenate(
        [c_cnt[d, : plan.seg_counts[d]] for d in range(ndev)]
    ) if plan.ctrow.size else np.zeros((0, tm, tn))

    from spgemm_tpu.ops.spgemm import _compact_to_tilemat

    return _compact_to_tilemat(
        plan.ctrow, plan.ctcol, keep_val, keep_cnt,
        (a.m, b.n), a.tm, b.tn,
    )
