"""Gather-free Gustavson-by-k SpGEMM numeric path (the TPU fast path).

Replaces the pair-gather formulation (ops/numeric.py) for the common case.
Key observation (measured on TPU v5e): XLA's per-tile gather runs at ~6%
of HBM bandwidth, while contiguous slab matmuls run at full MXU rate. So
instead of gathering (A, B) tiles per matched pair, we group by the inner
tile dimension k (Gustavson's ordering):

    C += A[:, k] (outer) B[k, :]        for each k

* A tiles of column k are contiguous in the CSC-of-tiles view;
* B tiles of row k are contiguous in row-major storage;
* stacking A's k-group vertically (maxA*tm, tk) and B's k-group
  horizontally (tk, maxB*tn) makes ALL pairwise tile products of one k a
  single dense matmul -> one batched dot_general over all k;
* every A and B tile is touched exactly once (speed of light on input
  traffic); the only irregular op left is the scatter-add of pair
  products into C tiles.

Values and structural counts ride one fused scatter (concatenated along
the segment axis), halving scatter launches. k-groups are zero-padded to
(maxA, maxB); matrices where padding explodes (max >> mean tile counts
per k) should use the pair backend instead — `padding_ratio()` reports
this.

This module also hosts the STRIP-KERNEL PLANNER (`build_strip_args` and
friends): the production path replaces this file's XLA scatter with the
Pallas strip kernel (ops/pallas_kernels.py) driven by the plan built
here — the TPU answer to the reference's 5-bin stream dispatch
(`tilespgemm-cuda.h:2649-2728`) is the windowed/cached B-delivery choice
plus block-padded writeback, not size bins.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from spgemm_tpu.models.csr import INDEX_DTYPE
from spgemm_tpu.models.tile import TileMat


@dataclasses.dataclass
class GustavsonPlan:
    """Host-side plan: padded k-group slabs + scatter segment map."""

    gk: int              # inner grid dimension (A tile-cols == B tile-rows)
    max_a: int           # max A tiles in any column k
    max_b: int           # max B tiles in any row k
    tm: int
    tk: int
    tn: int
    nt_c: int            # candidate C tiles
    ctrow: np.ndarray    # (nt_c,)
    ctcol: np.ndarray
    num_pairs: int
    a3_val: np.ndarray   # (gk, max_a*tm, tk) stacked A slabs (None if
    a3_occ: np.ndarray   #   built with a_slabs=False — strip path)
    b3_val: np.ndarray   # (gk, tk, max_b*tn) stacked B slabs
    b3_occ: np.ndarray
    seg: np.ndarray      # (gk*max_a*max_b,) int32; padding -> nt_c
    dtype: np.dtype = np.float32
    prep_ms: float = 0.0       # slab layout build (conversion-like, one-time)
    symbolic_ms: float = 0.0   # pair expansion + C-tile dictionary (per-run)

    def padding_ratio(self) -> float:
        """Padded pair slots / real pairs (1.0 = no waste)."""
        return (self.gk * self.max_a * self.max_b) / max(1, self.num_pairs)


def build_gustavson_plan(a: TileMat, b: TileMat, dtype=np.float32,
                         a_slabs: bool = True,
                         values: bool = True) -> GustavsonPlan:
    """Build the Gustavson k-group plan. With a_slabs=False the stacked A
    slabs are skipped (the strip kernel packs A per tile-row itself).
    With values=False only the occupancy slabs are packed (the Ozaki f64
    engine supplies its own int8 slice planes, ops/ozaki.py — and casting
    wide-exponent f64 values to f32 would warn/overflow pointlessly)."""
    if a.n != b.m:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    if a.tn != b.tm:
        raise ValueError(
            f"inner tile dims must match: A is {a.tm}x{a.tn}, B is {b.tm}x{b.tn}"
        )
    gk = a.gn
    tm, tk, tn = a.tm, a.tn, b.tn
    c_gn = b.gn

    t_prep = time.perf_counter()
    acsc_ptr, acsc_perm = a.csc_view()
    bptr = b.tptr.astype(np.int64)
    cnt_a = np.diff(acsc_ptr).astype(np.int64)
    cnt_b = np.diff(bptr)
    max_a = max(1, int(cnt_a.max()) if a.nt else 1)
    max_b = max(1, int(cnt_b.max()) if b.nt else 1)

    # --- slabs (vectorized fills) ---
    bd = b.dense(dtype) if values else None
    bo = b.occ().astype(dtype)

    if a_slabs:
        ad = a.dense(dtype) if values else None
        ao = a.occ().astype(dtype)
        # A slot for the r-th tile of column k (csc order): k*max_a + rank
        rank_a = np.arange(a.nt, dtype=np.int64) - np.repeat(
            acsc_ptr[:-1].astype(np.int64), cnt_a
        )
        ka = np.repeat(np.arange(gk, dtype=np.int64), cnt_a)
        slot_a = ka * max_a + rank_a
        a3_occ = np.zeros((gk * max_a, tm, tk), dtype=dtype)
        a3_occ[slot_a] = ao[acsc_perm]
        a3_occ = a3_occ.reshape(gk, max_a * tm, tk)
        if values:
            a3_val = np.zeros((gk * max_a, tm, tk), dtype=dtype)
            a3_val[slot_a] = ad[acsc_perm]
            # vertical stack: (gk, max_a*tm, tk)
            a3_val = a3_val.reshape(gk, max_a * tm, tk)
        else:
            a3_val = None
    else:
        a3_val = a3_occ = None

    rank_b = np.arange(b.nt, dtype=np.int64) - np.repeat(bptr[:-1], cnt_b)
    kb = np.repeat(np.arange(gk, dtype=np.int64), cnt_b)
    slot_b = kb * max_b + rank_b
    b3_occ = np.zeros((gk * max_b, tk, tn), dtype=dtype)
    b3_occ[slot_b] = bo
    # horizontal stack: (gk, tk, max_b*tn)
    b3_occ = b3_occ.reshape(gk, max_b, tk, tn).transpose(0, 2, 1, 3).reshape(
        gk, tk, max_b * tn
    )
    if values:
        b3_val = np.zeros((gk * max_b, tk, tn), dtype=dtype)
        b3_val[slot_b] = bd
        b3_val = b3_val.reshape(gk, max_b, tk, tn).transpose(
            0, 2, 1, 3).reshape(gk, tk, max_b * tn)
    else:
        b3_val = None

    prep_ms = (time.perf_counter() - t_prep) * 1e3

    # --- pair expansion + C tile dictionary (the symbolic step) ---
    t_sym = time.perf_counter()
    pairs_per_k = cnt_a * cnt_b
    total = int(pairs_per_k.sum())
    if total == 0:
        return GustavsonPlan(
            gk=gk, max_a=max_a, max_b=max_b, tm=tm, tk=tk, tn=tn,
            nt_c=0,
            ctrow=np.zeros(0, INDEX_DTYPE), ctcol=np.zeros(0, INDEX_DTYPE),
            num_pairs=0,
            a3_val=a3_val, a3_occ=a3_occ, b3_val=b3_val, b3_occ=b3_occ,
            seg=np.zeros(gk * max_a * max_b, INDEX_DTYPE),
            dtype=np.dtype(dtype),
            prep_ms=prep_ms,
        )
    kk = np.repeat(np.arange(gk, dtype=np.int64), pairs_per_k)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(pairs_per_k) - pairs_per_k, pairs_per_k
    )
    x = off // cnt_b[kk]
    y = off % cnt_b[kk]
    ia = acsc_perm[acsc_ptr[kk] + x]
    ib = bptr[kk] + y
    ckey = a.trow[ia].astype(np.int64) * c_gn + b.tcol[ib]
    ukey = np.unique(ckey)
    nt_c = ukey.size
    seg_of_pair = np.searchsorted(ukey, ckey).astype(INDEX_DTYPE)

    seg = np.full(gk * max_a * max_b, nt_c, dtype=INDEX_DTYPE)
    seg[(kk * max_a + x) * max_b + y] = seg_of_pair

    return GustavsonPlan(
        gk=gk, max_a=max_a, max_b=max_b, tm=tm, tk=tk, tn=tn,
        nt_c=nt_c,
        ctrow=(ukey // c_gn).astype(INDEX_DTYPE),
        ctcol=(ukey % c_gn).astype(INDEX_DTYPE),
        num_pairs=total,
        a3_val=a3_val, a3_occ=a3_occ, b3_val=b3_val, b3_occ=b3_occ,
        seg=seg,
        dtype=np.dtype(dtype),
        prep_ms=prep_ms,
        symbolic_ms=(time.perf_counter() - t_sym) * 1e3,
    )


@functools.partial(
    jax.jit,
    static_argnames=("gk", "max_a", "max_b", "tm", "tn", "nt_c", "acc_dtype"),
)
def gustavson_numeric(
    a3_val: jax.Array,   # (gk, max_a*tm, tk)
    a3_occ: jax.Array,
    b3_val: jax.Array,   # (gk, tk, max_b*tn)
    b3_occ: jax.Array,
    seg: jax.Array,      # (gk*max_a*max_b,)
    *,
    gk: int,
    max_a: int,
    max_b: int,
    tm: int,
    tn: int,
    nt_c: int,
    acc_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Batched slab matmuls + one fused scatter. Returns
    (c_val, c_cnt): (nt_c, tm, tn) each."""
    return gustavson_core(
        a3_val, a3_occ, b3_val, b3_occ, seg,
        gk=gk, max_a=max_a, max_b=max_b, tm=tm, tn=tn, nt_c=nt_c,
        acc_dtype=acc_dtype,
    )


def gustavson_core(
    a3_val, a3_occ, b3_val, b3_occ, seg,
    *, gk, max_a, max_b, tm, tn, nt_c, acc_dtype=jnp.float32,
):
    """Traceable core (also used inside shard_map by parallel/dist.py)."""

    def slab_mm(a3, b3):
        return jax.lax.dot_general(
            a3, b3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    def to_pairs(p):
        # (gk, max_a*tm, max_b*tn) -> (gk*max_a*max_b, tm, tn)
        return (
            p.reshape(gk, max_a, tm, max_b, tn)
            .transpose(0, 1, 3, 2, 4)
            .reshape(-1, tm, tn)
        )

    pv = to_pairs(slab_mm(a3_val, b3_val))
    po = to_pairs(slab_mm(a3_occ, b3_occ))

    # one scatter for values and counts: counts live at seg + (nt_c+1)
    stride = nt_c + 1
    seg2 = jnp.concatenate([seg, seg + stride])
    c = jnp.zeros((2 * stride, tm, tn), dtype=acc_dtype)
    c = c.at[seg2].add(jnp.concatenate([pv, po]))
    return c[:nt_c], c[stride : stride + nt_c]


# --- strip-kernel driver (scatter-free Pallas path) ----------------------


@dataclasses.dataclass
class StripArgs:
    """Self-contained plan + device operands for the Pallas strip kernel
    (ops/pallas_kernels.py:gustavson_strip_pallas). Built by
    build_strip_args without a GustavsonPlan: B slabs and A packing are
    one-time format prep (prep_ms); the symbolic phase (C tile dictionary
    + per-pair slot table) runs natively in C++/OpenMP when available
    (native/csr2tile.cpp:gustavson_symbolic_*), else vectorized NumPy
    (symbolic_ms — the per-run cost, the analogue of the reference's
    steps 1-2)."""

    a_val: np.ndarray      # (ntA+max_ablock, tm, tk) float32
    a_occ: np.ndarray      # (ntA+max_ablock, tm, tk) occ dtype
    b_val: np.ndarray      # (gk, tk, max_b*tn)
    b_occ: np.ndarray      # (gk, tk, max_b*tn) occ dtype
    aptr: np.ndarray
    ak: np.ndarray
    slots: np.ndarray      # (ntA_pad*max_b,) block-local C slot per pair
    gather_idx: np.ndarray  # (nt_c,) candidate order -> block-padded pos
    ctrow: np.ndarray      # (nt_c,) C tile coordinates, sorted
    ctcol: np.ndarray
    nt_c: int
    num_pairs: int
    gm: int
    gn_c: int
    tm: int
    tk: int
    tn: int
    max_b: int
    max_ablock: int        # max A tiles in any block of block_rows rows
    max_cblock: int        # max C tiles in any block of block_rows rows
    block_rows: int
    kwin: int | None = None   # windowed-B mode: contiguous k slabs/block
    kmin: np.ndarray | None = None  # (n_blocks,) window start per block
    meta: np.ndarray | None = None  # (rows, 128) int32 per-tile metadata
    dtype: np.dtype = np.float32
    prep_ms: float = 0.0
    symbolic_ms: float = 0.0

    def kernel_kwargs(self) -> dict:
        return dict(gm=self.gm, max_b=self.max_b,
                    max_ablock=self.max_ablock, max_cblock=self.max_cblock,
                    block_rows=self.block_rows, kwin=self.kwin)

    def device_args(self):
        base = (self.a_val, self.a_occ, self.b_val, self.b_occ, self.aptr)
        if self.kwin is not None:
            # windowed kernel reads k/slots from `meta`; ak/slots stay
            # host-side only (dist slicing, executor rebuilds)
            return base + (self.kmin, self.meta)
        return base + (self.ak, self.slots)

    def traffic_bytes(self) -> dict:
        """Modelled HBM traffic of one numeric dispatch + compaction
        (the kernel's ACTUAL DMA volume, not the roofline minimum):
        A tiles streamed once per block; B slabs per the delivery mode
        (windowed: the full window each block; cached: one fetch per
        distinct k per block — a lower bound, conflict evictions in the
        direct-mapped cache refetch); block-padded C written once (values
        + counts) then re-read and compacted to nt_c tiles."""
        occ = self.a_occ.dtype.itemsize
        both = self.dtype.itemsize + occ
        a_bytes = self.a_val.shape[0] * self.tm * self.tk * both
        slab = self.tk * self.max_b * self.tn * both
        n_blocks = max(1, -(-self.gm // self.block_rows))
        if self.kwin is not None:
            b_bytes = n_blocks * self.kwin * slab
        else:
            aptr = self.aptr.astype(np.int64)
            starts = np.minimum(
                np.arange(0, self.gm + 1, self.block_rows), self.gm)
            if starts[-1] != self.gm:
                starts = np.append(starts, self.gm)
            uniq = 0
            for lo, hi in zip(aptr[starts[:-1]], aptr[starts[1:]]):
                uniq += np.unique(self.ak[lo:hi]).size
            b_bytes = int(uniq) * slab
        padded = n_blocks * self.max_cblock * self.tm * self.tn
        c_bytes = padded * 8          # val + cnt f32 written once
        compact = padded * 8 + self.nt_c * self.tm * self.tn * 4
        return dict(a=a_bytes, b=b_bytes, c=c_bytes, compact=compact,
                    total=a_bytes + b_bytes + c_bytes + compact)

    def vmem_bytes(self) -> int:
        from spgemm_tpu.ops.pallas_kernels import B_CACHE_SLOTS

        occ_elt = self.a_occ.dtype.itemsize
        both = self.dtype.itemsize + occ_elt
        b_slabs = (2 * self.kwin if self.kwin is not None
                   else B_CACHE_SLOTS)
        return (2 * self.max_ablock * self.tm * self.tk * both
                + b_slabs * self.tk * self.max_b * self.tn * both
                + 2 * (self.max_cblock + 1) * self.tm * self.tn * both)


def _numpy_strip_symbolic(a, b, block_rows, max_b, max_ablock,
                          max_cblock_min=1):
    """NumPy fallback for the native symbolic phase. Returns the same
    tuple as utils.native.gustavson_symbolic_native."""
    gk, c_gn = a.gn, b.gn
    acsc_ptr, acsc_perm = a.csc_view()
    bptr = b.tptr.astype(np.int64)
    cnt_a = np.diff(acsc_ptr).astype(np.int64)
    cnt_b = np.diff(bptr)

    pairs_per_k = cnt_a * cnt_b
    total = int(pairs_per_k.sum())
    if total == 0:
        c_tptr = np.zeros(a.gm + 1, dtype=np.int32)
        return (c_tptr, np.zeros(0, INDEX_DTYPE), np.zeros(0, INDEX_DTYPE),
                np.full((a.nt + max_ablock) * max_b, 1, dtype=INDEX_DTYPE),
                np.zeros(0, np.int64), 1, 0)
    kk = np.repeat(np.arange(gk, dtype=np.int64), pairs_per_k)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(pairs_per_k) - pairs_per_k, pairs_per_k
    )
    x = off // cnt_b[kk]
    y = off % cnt_b[kk]
    ia = acsc_perm[acsc_ptr[kk] + x]
    ckey = a.trow[ia].astype(np.int64) * c_gn + b.tcol[bptr[kk] + y]
    ukey = np.unique(ckey)
    nt_c = ukey.size
    ctrow = (ukey // c_gn).astype(INDEX_DTYPE)
    ctcol = (ukey % c_gn).astype(INDEX_DTYPE)

    c_tptr = np.zeros(a.gm + 1, dtype=np.int64)
    np.cumsum(np.bincount(ctrow, minlength=a.gm), out=c_tptr[1:])
    block_starts = np.minimum(
        np.append(np.arange(0, a.gm, block_rows), a.gm), a.gm)
    per_block_c = np.diff(c_tptr[block_starts])
    max_cblock = max(max_cblock_min,
                     int(per_block_c.max()) if per_block_c.size else 1)

    # block-local C slot per (A tile, y) pair; padded -> max_cblock
    jpos = np.zeros(gk * max_b, dtype=np.int64)
    rank_b = np.arange(b.nt, dtype=np.int64) - np.repeat(bptr[:-1], cnt_b)
    kb = np.repeat(np.arange(gk, dtype=np.int64), cnt_b)
    jpos[kb * max_b + rank_b] = b.tcol

    slots = np.full((a.nt + max_ablock) * max_b, max_cblock,
                    dtype=INDEX_DTYPE)
    if a.nt:
        ka = a.tcol.astype(np.int64)[:, None]
        ys = np.arange(max_b, dtype=np.int64)[None, :]
        valid = ys < cnt_b[ka]
        j = jpos[ka * max_b + ys]
        rows = a.trow.astype(np.int64)[:, None]
        g = np.searchsorted(ukey, rows * c_gn + j)
        blk_of_row = rows // block_rows
        s = g - c_tptr[np.minimum(blk_of_row * block_rows, a.gm)]
        s[~valid] = max_cblock
        slots[: a.nt * max_b] = s.reshape(-1)

    cblk = ctrow.astype(np.int64) // block_rows
    gather_idx = (
        cblk * max_cblock
        + np.arange(nt_c, dtype=np.int64)
        - c_tptr[np.minimum(cblk * block_rows, a.gm)]
    )
    return c_tptr, ctrow, ctcol, slots, gather_idx, max_cblock, nt_c


def block_k_stats(a: TileMat, block_rows: int):
    """(kmin per block, max contiguous k-span) over blocks of tile-rows —
    drives the windowed-B mode decision."""
    nb_blocks = max(1, -(-a.gm // block_rows))
    row_starts = np.arange(0, a.gm, block_rows)
    aptr64 = a.tptr.astype(np.int64)
    if a.nt and row_starts.size:
        ak64 = a.tcol.astype(np.int64)
        row_has = np.diff(aptr64) > 0
        firstk = np.where(row_has, ak64[np.minimum(aptr64[:-1], a.nt - 1)],
                          a.gn)
        lastk = np.where(row_has, ak64[np.maximum(aptr64[1:] - 1, 0)], -1)
        blk_min = np.minimum.reduceat(firstk, row_starts)
        blk_max = np.maximum.reduceat(lastk, row_starts)
        bad = blk_max < blk_min
        blk_min[bad] = 0
        blk_max[bad] = 0
        span = max(1, int((blk_max - blk_min + 1).max()))
    else:
        blk_min = np.zeros(nb_blocks, np.int64)
        span = 1
    return blk_min, span


def run_strip_symbolic(a: TileMat, b: TileMat, block_rows: int, max_b: int,
                       max_ablock: int, max_cblock_min: int = 1):
    """The per-run symbolic phase alone (native C++ with NumPy fallback):
    C tile dictionary + per-pair slot table + gather map. Callers that
    re-measure or re-derive the symbolic step use this without paying for
    operand packing. `max_cblock_min` forces a larger block-padded C
    geometry (distributed plans unify geometry across shards)."""
    from spgemm_tpu.utils.native import gustavson_symbolic_native

    sym = gustavson_symbolic_native(a, b, block_rows, max_b,
                                    a.nt + max_ablock,
                                    max_cblock_min=max_cblock_min)
    if sym is None:
        sym = _numpy_strip_symbolic(a, b, block_rows, max_b, max_ablock,
                                    max_cblock_min=max_cblock_min)
    return sym


def build_strip_args(
    a: TileMat, b: TileMat, block_rows: int = 32,
    dtype=np.float32, occ_dtype=None,
    reuse: StripArgs | None = None,
    window: bool | None = None,
    b_packed: tuple | None = None,
    min_geometry: dict | None = None,
) -> StripArgs:
    """Build the complete strip-kernel plan: one-time format prep (A
    packing + stacked B slabs) and the per-run symbolic phase.

    `reuse` recycles another plan's packed operands (e.g. when retrying
    with a smaller block_rows): B slabs are block_rows-independent and A
    blocks only need re-padding.

    `window` selects the windowed-B kernel variant (each block's B slabs
    fetched as one contiguous prefetched DMA): None = auto (on when every
    block's k span is small and contiguous enough), False = always use
    the cached-fetch variant (required by the distributed path, whose
    per-device plans share one global B layout).

    `b_packed` supplies pre-packed (b_val, b_occ) slabs so distributed
    per-shard builds pack B once, and `min_geometry` forces lower bounds
    on {"max_ablock", "max_cblock", "kwin"} so per-shard plans share the
    kernel's static geometry (shard_map needs identical shapes)."""
    mg = min_geometry or {}
    if occ_dtype is None:
        # bfloat16 occupancy: exact 0/1 inputs, sign-safe >0 pattern test
        import jax.numpy as _jnp
        occ_dtype = _jnp.bfloat16
    if a.n != b.m:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    if a.tn != b.tm:
        raise ValueError(
            f"inner tile dims must match: A is {a.tm}x{a.tn}, B is {b.tm}x{b.tn}"
        )
    dtype = np.dtype(dtype)
    tm, tk, tn = a.tm, a.tn, b.tn
    gk = a.gn

    # --- one-time prep: A packing + B slabs ---
    t_prep = time.perf_counter()
    aptr64 = a.tptr.astype(np.int64)
    block_starts = np.minimum(
        np.append(np.arange(0, a.gm, block_rows), a.gm), a.gm)
    per_block = np.diff(aptr64[block_starts])
    max_ablock = max(mg.get("max_ablock", 1),
                     int(per_block.max()) if per_block.size else 1)

    ak = np.zeros(a.nt + max_ablock, dtype=INDEX_DTYPE)
    ak[: a.nt] = a.tcol

    bptr = b.tptr.astype(np.int64)
    cnt_b = np.diff(bptr)
    max_b = max(1, int(cnt_b.max()) if b.nt else 1)

    import jax.numpy as _jnp

    packed = None
    if b_packed is not None:
        ap = None
        if dtype == np.float32 and occ_dtype == _jnp.bfloat16:
            from spgemm_tpu.utils.native import pack_a_tiles_native

            ap = pack_a_tiles_native(a, max_ablock)
        if ap is None:
            av_ = np.zeros((a.nt + max_ablock, tm, tk), dtype=dtype)
            av_[: a.nt] = a.dense(dtype)
            ao_ = np.zeros((a.nt + max_ablock, tm, tk), dtype=occ_dtype)
            ao_[: a.nt] = a.occ().astype(occ_dtype)
            ap = (av_, ao_)
        packed = (ap[0], ap[1]) + tuple(b_packed)
    if packed is None and reuse is not None and reuse.dtype == dtype \
            and reuse.max_b == max_b:
        if reuse.max_ablock == max_ablock:
            a_val, a_occ = reuse.a_val, reuse.a_occ
        else:
            a_val = np.zeros((a.nt + max_ablock, tm, tk), dtype=dtype)
            a_val[: a.nt] = reuse.a_val[: a.nt]
            a_occ = np.zeros((a.nt + max_ablock, tm, tk),
                             dtype=reuse.a_occ.dtype)
            a_occ[: a.nt] = reuse.a_occ[: a.nt]
        b_val, b_occ = reuse.b_val, reuse.b_occ
        packed = (a_val, a_occ, b_val, b_occ)
    if packed is None and dtype == np.float32 and occ_dtype == _jnp.bfloat16:
        from spgemm_tpu.utils.native import pack_strip_operands_native

        packed = pack_strip_operands_native(a, b, max_ablock, max_b)
    if packed is not None:
        a_val, a_occ, b_val, b_occ = packed
    else:
        a_val = np.zeros((a.nt + max_ablock, tm, tk), dtype=dtype)
        a_val[: a.nt] = a.dense(dtype)
        a_occ = np.zeros((a.nt + max_ablock, tm, tk), dtype=occ_dtype)
        a_occ[: a.nt] = a.occ().astype(occ_dtype)
        b_val = np.zeros((gk * max_b, tk, tn), dtype=dtype)
        b_occ = np.zeros((gk * max_b, tk, tn), dtype=occ_dtype)
        rank_b = np.arange(b.nt, dtype=np.int64) - np.repeat(bptr[:-1], cnt_b)
        kb = np.repeat(np.arange(gk, dtype=np.int64), cnt_b)
        slot_b = kb * max_b + rank_b
        b_val[slot_b] = b.dense(dtype)
        b_occ[slot_b] = b.occ().astype(occ_dtype)
        b_val = b_val.reshape(gk, max_b, tk, tn).transpose(0, 2, 1, 3).reshape(
            gk, tk, max_b * tn)
        b_occ = b_occ.reshape(gk, max_b, tk, tn).transpose(0, 2, 1, 3).reshape(
            gk, tk, max_b * tn)
    prep_ms = (time.perf_counter() - t_prep) * 1e3

    # --- per-run symbolic: C tile dictionary + per-pair slots ---
    t_sym = time.perf_counter()
    sym = run_strip_symbolic(a, b, block_rows, max_b, max_ablock,
                             max_cblock_min=mg.get("max_cblock", 1))
    c_tptr, ctrow, ctcol, slots, gather_idx, max_cblock, nt_c = sym
    num_pairs = int(cnt_b[a.tcol].sum()) if a.nt else 0
    symbolic_ms = (time.perf_counter() - t_sym) * 1e3

    # --- windowed-B mode decision (one contiguous prefetched B DMA per
    # block when every block's k span is small — banded/local matrices).
    # Gates on the kernel's TOTAL VMEM scratch (A + windowed B + C), not
    # just the B window, so auto selection never produces a plan the
    # feasibility check would reject.
    nb_blocks = max(1, -(-a.gm // block_rows))
    kwin = None
    kmin_arr = None
    meta = None
    if window is None or window:
        blk_min, span = block_k_stats(a, block_rows)
        from spgemm_tpu.ops.pallas_kernels import strip_meta_rows

        occ_elt = np.dtype(b_occ.dtype).itemsize
        both = dtype.itemsize + occ_elt
        win_total_vmem = (2 * max_ablock * tm * tk * both
                          + 2 * span * tk * max_b * tn * both
                          + 2 * (max_cblock + 1) * tm * tn * both)
        # windows of adjacent blocks overlap; cap the refetch overhead
        traffic_ok = nb_blocks * span <= 2 * gk + 16
        # SMEM: double-buffered meta scratch + aptr/kmin scalar prefetch
        smem_ok = (2 * strip_meta_rows(max_ablock, max_b) * 128 * 4
                   + (a.gm + 1 + nb_blocks) * 4) <= 700 * 1024
        if win_total_vmem <= 95 * 1024 * 1024 and traffic_ok and smem_ok:
            kwin = max(span, mg.get("kwin", 1))
            gk_pad = max(gk, kwin)
            kmin_arr = np.clip(blk_min, 0, gk_pad - kwin).astype(INDEX_DTYPE)
            if b_val.shape[0] < gk_pad:
                pad = gk_pad - b_val.shape[0]
                b_val = np.concatenate(
                    [b_val, np.zeros((pad,) + b_val.shape[1:],
                                     dtype=b_val.dtype)])
                b_occ = np.concatenate(
                    [b_occ, np.zeros((pad,) + b_occ.shape[1:],
                                     dtype=b_occ.dtype)])
            # per-tile metadata [k, slot_0..slot_{max_b-1}] in 128-wide
            # HBM rows, DMAed per block into SMEM (no scalar-prefetch
            # SMEM ceiling on matrix size)
            W = 1 + max_b
            nt_pad = a.nt + max_ablock
            total_rows = -(-(nt_pad * W) // 128) + strip_meta_rows(
                max_ablock, max_b)
            meta = np.zeros((total_rows, 128), dtype=np.int32)
            mv = meta.reshape(-1)[: nt_pad * W].reshape(nt_pad, W)
            mv[:, 0] = ak
            mv[:, 1:] = slots.reshape(nt_pad, max_b)
        elif window:
            raise ValueError(
                f"windowed strip mode infeasible: k span {span} slabs "
                f"needs {win_total_vmem/1e6:.0f} MB VMEM total"
            )

    return StripArgs(
        a_val=a_val, a_occ=a_occ, b_val=b_val, b_occ=b_occ,
        aptr=a.tptr.astype(INDEX_DTYPE), ak=ak,
        slots=slots, gather_idx=gather_idx,
        ctrow=np.asarray(ctrow, dtype=INDEX_DTYPE),
        ctcol=np.asarray(ctcol, dtype=INDEX_DTYPE),
        nt_c=nt_c, num_pairs=num_pairs,
        gm=a.gm, gn_c=b.gn, tm=tm, tk=tk, tn=tn, max_b=max_b,
        max_ablock=max_ablock, max_cblock=max_cblock,
        block_rows=block_rows, kwin=kwin, kmin=kmin_arr, meta=meta,
        dtype=dtype,
        prep_ms=prep_ms, symbolic_ms=symbolic_ms,
    )


@jax.jit
def strip_compact_device(c_val, c_cnt, gidx):
    """Device-side result compaction (the reference keeps step outputs
    on the GPU and downloads once, `tilespgemm-cuda.h:2749-2776`; round 1
    downloaded the whole block-padded array and compacted on host):
    gather the real candidate tiles out of the block-padded layout (an
    8 KB-per-tile row gather — the fast gather class) and reduce the
    structural counts to packed occupancy bitmask words (1/32 of the
    download volume). Returns (values (nt_c, tm, tn) f32,
    occ_words (nt_c, tm, tn/32) int32)."""
    v = jnp.take(c_val, gidx, axis=0)
    cnt = jnp.take(c_cnt, gidx, axis=0)
    tm, tn = v.shape[1], v.shape[2]
    occ = (cnt > 0).reshape(-1, tm, tn // 32, 32).astype(jnp.int32)
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 32), 3)
    words = jnp.sum(occ << shifts, axis=3, dtype=jnp.int32)
    return v, words


def unpack_occ_words(words: np.ndarray, tn: int) -> np.ndarray:
    """Host: expand packed occupancy words back to a (nt, tm, tn) bool
    array for TileMat assembly (np.unpackbits — the words are LSB-first
    int32, which is little-endian byte order)."""
    by = np.ascontiguousarray(words).view(np.uint8)
    bits = np.unpackbits(by, axis=-1, bitorder="little")
    return bits.reshape(words.shape[0], words.shape[1], -1)[
        :, :, :tn].astype(bool)


def strip_numeric(
    args: StripArgs,
    *,
    acc_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Run the Pallas strip kernel; returns (c_val, c_occ) host arrays in
    candidate order — compaction (candidate gather + occupancy packing)
    happens ON DEVICE and only (nt_c, tm, tn) values plus nt_c*tm*tn/32
    bitmask words are downloaded, not the block-padded layout. c_occ is
    exact 0/1 structural occupancy (f32) — replacing round 1's
    approximate bf16 product counts."""
    from spgemm_tpu.ops.pallas_kernels import gustavson_strip_pallas

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if args.vmem_bytes() > 100 * 1024 * 1024:
        raise ValueError(
            f"strip kernel VMEM scratch ({args.vmem_bytes()/1e6:.0f} MB) "
            "exceeds budget; use the gustavson/xla backend or smaller "
            "block_rows"
        )
    c_val, c_cnt = gustavson_strip_pallas(
        *map(jnp.asarray, args.device_args()),
        **args.kernel_kwargs(),
        acc_dtype=acc_dtype, interpret=interpret,
    )
    return download_compact(c_val, c_cnt, args)


def download_compact(c_val, c_cnt, args: StripArgs
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Device-compact then download (nt_c-proportional); tn not a
    multiple of 32 (CPU-test tile shapes) skips bit packing."""
    gidx = jnp.asarray(args.gather_idx.astype(np.int32))
    if args.tn % 32 == 0:
        v, words = strip_compact_device(c_val, c_cnt, gidx)
        v = np.asarray(v)
        occ = unpack_occ_words(np.asarray(words), v.shape[2])
        return v, occ.astype(np.float32)
    v = jnp.take(c_val, gidx, axis=0)
    cnt = jnp.take(c_cnt, gidx, axis=0)
    return np.asarray(v), (np.asarray(cnt) > 0).astype(np.float32)


def estimate_strip_vmem(a: TileMat, b: TileMat, block_rows: int,
                        ctrow: np.ndarray, max_b: int,
                        val_bytes: int = 4, occ_bytes: int = 2) -> int:
    """VMEM scratch bytes the strip kernel would need at this block_rows
    (pointer math only — no slabs built)."""
    starts = np.minimum(
        np.append(np.arange(0, a.gm, block_rows), a.gm), a.gm)
    per_a = np.diff(a.tptr.astype(np.int64)[starts])
    max_ablock = max(1, int(per_a.max()) if per_a.size else 1)
    c_tptr = np.zeros(a.gm + 1, dtype=np.int64)
    np.cumsum(np.bincount(ctrow, minlength=a.gm), out=c_tptr[1:])
    per_c = np.diff(c_tptr[starts])
    max_cblock = max(1, int(per_c.max()) if per_c.size else 1)
    from spgemm_tpu.ops.pallas_kernels import B_CACHE_SLOTS

    both = val_bytes + occ_bytes
    return (2 * max_ablock * a.tm * a.tn * both
            + B_CACHE_SLOTS * a.tn * max_b * b.tn * both
            + 2 * (max_cblock + 1) * a.tm * b.tn * both)


def choose_strip_block_rows(
    a: TileMat, b: TileMat, args: StripArgs,
    budget: int = 100 * 1024 * 1024, start: int = 32,
) -> int | None:
    """Largest block_rows <= start whose VMEM scratch fits the budget, or
    None if even block_rows=1 does not fit (caller should fall back to
    the XLA slab backend)."""
    br = start
    while br >= 1:
        if estimate_strip_vmem(a, b, br, args.ctrow, args.max_b) <= budget:
            return br
        br //= 2
    return None


def check_strip_feasible(args: StripArgs, interpret: bool,
                         slot_entries: int | None = None) -> None:
    """Raise an actionable error if the strip kernel cannot run on
    hardware with this plan (Mosaic DMA alignment, VMEM scratch, and —
    for the cached-B variant — the scalar-prefetched slot table's SMEM
    footprint). `slot_entries` is the per-device slot-table length
    (int32 count); pass it when the cached variant will run. No-op
    in interpret mode (CPU testing has none of these constraints)."""
    if interpret:
        return
    if slot_entries is not None and args.kwin is None:
        # cached-B variant: slot table + ak live in SMEM (~1 MB total);
        # keep the same 512 KB budget the single-device resolver uses
        if 2 * slot_entries * 4 > 512 * 1024:
            raise ValueError(
                f"strip cached-B slot table ({slot_entries} int32 entries) "
                "exceeds the SMEM scalar-prefetch budget; use the windowed "
                "variant, more devices, or the gustavson/xla backend "
                "(spgemm(backend='auto') reroutes automatically)."
            )
    if args.tk % 128 != 0 or args.tn % 128 != 0 or args.tm % 8 != 0:
        raise ValueError(
            f"strip kernel needs 128-aligned tile minor dims on TPU "
            f"(tm%8==0, tk%128==0, tn%128==0); got {args.tm}x{args.tk} @ "
            f"{args.tk}x{args.tn}. Use tn=128 tiles or the gustavson/xla "
            "backend (spgemm(backend='auto') picks this automatically)."
        )
    if args.vmem_bytes() > 100 * 1024 * 1024:
        raise ValueError(
            f"strip kernel VMEM scratch ({args.vmem_bytes()/1e6:.0f} MB) "
            "exceeds budget; use a smaller block_rows or the gustavson/"
            "xla backend (spgemm(backend='auto') picks this automatically)."
        )
