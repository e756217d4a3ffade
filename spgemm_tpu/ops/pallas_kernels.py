"""Pallas TPU kernels for the SpGEMM numeric phase and SpMM.

Three kernels live here:
  * gustavson_strip_pallas — the production SpGEMM numeric path (see the
    block comment above it): MXU slab products accumulated in VMEM with
    double-buffered DMA and a block-padded writeback layout.
  * spmm_strip_pallas — Y = A @ X with X resident in VMEM.
  * pair_accumulate_pallas — the historical per-C-tile pair kernel
    (interpret-mode only on hardware: its per-pair tiny-tile DMAs violate
    Mosaic's 128-aligned minor-dim rule); kept as a CPU diagnostic.

All are TPU re-designs of the reference's step-4 CUDA kernels
(`src/tilespgemm-cuda.h:1273-2218`): dense VMEM accumulators and MXU
matmuls instead of warp-level sparse accumulators — and none of the
fork's shared-scratch race (SURVEY.md §2.3 ⚠), since every grid program
owns its output range by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_BUFFERS = 2


def _pair_kernel(
    # scalar prefetch
    pair_ptr_ref,  # (ntC+1,) int32
    pa_ref,        # (P,) int32
    pb_ref,        # (P,) int32
    # tensor inputs (HBM)
    a_ref,         # (ntA, 2, tm, tk): [:,0]=values, [:,1]=occupancy
    b_ref,         # (ntB, 2, tk, tn)
    # outputs (VMEM blocks, one C tile per program)
    cval_ref,      # (1, tm, tn)
    ccnt_ref,      # (1, tm, tn)
    # scratch
    a_sc,          # (NUM_BUFFERS, 2, tm, tk) VMEM
    b_sc,          # (NUM_BUFFERS, 2, tk, tn) VMEM
    a_sem,         # DMA sems (NUM_BUFFERS,)
    b_sem,
):
    i = pl.program_id(0)
    lo = pair_ptr_ref[i]
    hi = pair_ptr_ref[i + 1]
    n_pairs = hi - lo

    cval_ref[...] = jnp.zeros_like(cval_ref)
    ccnt_ref[...] = jnp.zeros_like(ccnt_ref)

    def start_dma(j, slot):
        pa = pa_ref[lo + j]
        pb = pb_ref[lo + j]
        a_dma = pltpu.make_async_copy(a_ref.at[pa], a_sc.at[slot], a_sem.at[slot])
        b_dma = pltpu.make_async_copy(b_ref.at[pb], b_sc.at[slot], b_sem.at[slot])
        a_dma.start()
        b_dma.start()

    @pl.when(n_pairs > 0)
    def _():
        start_dma(0, 0)

        def body(j, _):
            slot = jax.lax.rem(j, jnp.int32(NUM_BUFFERS))
            next_slot = jax.lax.rem(j + 1, jnp.int32(NUM_BUFFERS))

            @pl.when(j + 1 < n_pairs)
            def _():
                start_dma(j + 1, next_slot)

            pa = pa_ref[lo + j]
            pb = pb_ref[lo + j]
            pltpu.make_async_copy(a_ref.at[pa], a_sc.at[slot], a_sem.at[slot]).wait()
            pltpu.make_async_copy(b_ref.at[pb], b_sc.at[slot], b_sem.at[slot]).wait()

            a_tile = a_sc[slot]  # (2, tm, tk)
            b_tile = b_sc[slot]  # (2, tk, tn)
            # HIGHEST: avoid the TPU default bf16-multiply for f32 inputs
            cval_ref[0] += jnp.dot(
                a_tile[0], b_tile[0], preferred_element_type=cval_ref.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            ccnt_ref[0] += jnp.dot(
                a_tile[1], b_tile[1], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return 0

        jax.lax.fori_loop(0, n_pairs, body, 0)


@functools.partial(
    jax.jit, static_argnames=("num_segments", "acc_dtype", "interpret")
)
def pair_accumulate_pallas(
    a_val: jax.Array,   # (ntA, tm, tk)
    a_occ: jax.Array,   # (ntA, tm, tk) float32
    b_val: jax.Array,   # (ntB, tk, tn)
    b_occ: jax.Array,   # (ntB, tk, tn) float32
    pa: jax.Array,      # (P,) int32 (unpadded is fine)
    pb: jax.Array,      # (P,) int32
    pair_ptr: jax.Array,  # (ntC+1,) int32
    *,
    num_segments: int,
    acc_dtype=jnp.float32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused pair-product accumulation. Returns (c_val, c_cnt), each
    (num_segments, tm, tn)."""
    if jnp.dtype(acc_dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(
            "pallas backend supports float32/bfloat16 accumulation; "
            "use the XLA backend for float64"
        )
    ntA, tm, tk = a_val.shape
    ntB, tk2, tn = b_val.shape
    assert tk == tk2
    if not interpret and jax.default_backend() not in ("cpu",):
        if not (tm % 8 == 0 and tk % 128 == 0 and tn % 128 == 0):
            # Mosaic requires 128-aligned minor dims for HBM DMA slices;
            # the per-pair (tm, tk) tile DMAs violate that for tk/tn < 128.
            raise NotImplementedError(
                "the per-pair DMA kernel needs tm%8==0, tk%128==0, "
                "tn%128==0 tiles on TPU; use 128-wide tiles or "
                "backend='strip'/'xla'"
            )
        if (pa.size + pb.size + pair_ptr.size) * 4 > 768 * 1024:
            # pair indices are scalar-prefetched into SMEM (~1 MB)
            raise NotImplementedError(
                f"pair list too large for SMEM scalar prefetch "
                f"({pa.size} pairs); use backend='strip' or 'xla'"
            )

    a_packed = jnp.stack(
        [a_val.astype(acc_dtype), a_occ.astype(acc_dtype)], axis=1
    )
    b_packed = jnp.stack(
        [b_val.astype(acc_dtype), b_occ.astype(acc_dtype)], axis=1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_segments,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, tn), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, tn), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NUM_BUFFERS, 2, tm, tk), acc_dtype),
            pltpu.VMEM((NUM_BUFFERS, 2, tk, tn), acc_dtype),
            pltpu.SemaphoreType.DMA((NUM_BUFFERS,)),
            pltpu.SemaphoreType.DMA((NUM_BUFFERS,)),
        ],
    )

    c_val, c_cnt = pl.pallas_call(
        _pair_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_segments, tm, tn), acc_dtype),
            jax.ShapeDtypeStruct((num_segments, tm, tn), jnp.float32),
        ],
        interpret=interpret,
    )(pair_ptr, pa, pb, a_packed, b_packed)
    return c_val, c_cnt


# ---------------------------------------------------------------------------
# Gustavson strip kernel: the scatter-free numeric path.
#
# The XLA gustavson backend (ops/gustavson.py) is bottlenecked by its
# final scatter-add (XLA lowers scatter to a serialized loop on TPU, ~8%
# of HBM bandwidth measured). This kernel removes the scatter: each grid
# program owns a BLOCK of C tile-rows and accumulates MXU tile products
# DIRECTLY into a block-sized VMEM staging buffer. The host plan
# precomputes, for every (A-tile, B-slot) pair, the block-local index of
# its C tile (`StripArgs.slots`), so the kernel needs no intersection
# search — padded pairs route to a write-only garbage slot at the end of
# the buffer. C is emitted in a BLOCK-PADDED HBM layout (each block owns
# a private max_cblock-tile range), so every block's single writeback DMA
# targets disjoint memory: no ordering constraints, no races, and the
# writeback double-buffers against the next block's compute. A's block
# tiles arrive by one contiguous DMA, prefetched one block ahead
# (double-buffered); B k-slabs stream through a small direct-mapped VMEM
# cache that persists across blocks (banded / locality-rich matrices
# reuse the same k across adjacent rows, so most lookups hit). Values and
# occupancy ride as two planes of one packed buffer.
#
# This is the TPU answer to the reference's step-4 size-binned kernels
# (`src/tilespgemm-cuda.h:1273-2218`): instead of 5 CUDA kernels with
# warp-level sparse accumulators, one kernel with dense VMEM accumulators
# and MXU slab products (and none of the fork's shared-scratch race,
# SURVEY.md §2.3 ⚠).
# ---------------------------------------------------------------------------

B_CACHE_SLOTS = 8


def strip_meta_rows(max_ablock: int, max_b: int) -> int:
    """SMEM rows (128 int32 each) needed per block for the windowed
    kernel's per-tile metadata DMA — single source of truth for the host
    allocation, the kernel factory, and the scratch spec."""
    return (max_ablock * (1 + max_b)) // 128 + 2



def _strip_kernel_factory(tm, tk, tn, max_b, max_ablock, max_cblock,
                          block_rows, gm, n_blocks, val_precision):
    def kernel(
        # scalar prefetch
        aptr_ref,    # (gm+1,)  A tile-row pointer
        ak_ref,      # (ntA_pad,) tile-col k of each A tile
        slot_ref,    # (ntA_pad*max_b,) block-local C slot per (A tile, y);
                     #   padded pairs -> max_cblock (the garbage slot)
        # tensor inputs (HBM)
        av_ref,      # (ntA_pad, tm, tk) A tile values, row-major tiles
        ao_ref,      # (ntA_pad, tm, tk) A occupancy (occ dtype)
        bv_ref,      # (gk, tk, max_b*tn) stacked B value slabs
        bo_ref,      # (gk, tk, max_b*tn) B occupancy slabs (occ dtype)
        # outputs (HBM), block-padded layout
        cv_ref,      # (n_blocks*max_cblock, tm, tn) values
        co_ref,      # (n_blocks*max_cblock, tm, tn) structural counts
        # scratch (persists across grid programs; programs run in order)
        av_sc,       # VMEM (2, max_ablock, tm, tk) double-buffered A values
        ao_sc,       # VMEM (2, max_ablock, tm, tk)
        bv_sc,       # VMEM (B_CACHE_SLOTS, tk, max_b*tn) B value cache
        bo_sc,       # VMEM (B_CACHE_SLOTS, tk, max_b*tn)
        ov_sc,       # VMEM (2, max_cblock+1, tm, tn) double-buffered C vals
        oo_sc,       # VMEM (2, max_cblock+1, tm, tn) C counts
        b_tags,      # SMEM (B_CACHE_SLOTS,) cached k per slot (-1 empty)
        b_live,      # SMEM (B_CACHE_SLOTS,) 1 while a copy is in flight
        av_sem,      # DMA sems (2,)
        ao_sem,      # DMA sems (2,)
        b_sem,       # DMA sems (B_CACHE_SLOTS, 2)
        out_sem,     # DMA sems (2, 2)
    ):
        blk = pl.program_id(0)
        buf = blk % 2

        def a_dmas(p, slot):
            lo = aptr_ref[p * block_rows]
            return (
                pltpu.make_async_copy(
                    av_ref.at[pl.ds(lo, max_ablock)], av_sc.at[slot],
                    av_sem.at[slot]),
                pltpu.make_async_copy(
                    ao_ref.at[pl.ds(lo, max_ablock)], ao_sc.at[slot],
                    ao_sem.at[slot]),
            )

        def out_dmas(p, slot):
            dst = pl.ds(p * max_cblock, max_cblock)
            return (
                pltpu.make_async_copy(
                    ov_sc.at[slot, pl.ds(0, max_cblock)], cv_ref.at[dst],
                    out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    oo_sc.at[slot, pl.ds(0, max_cblock)], co_ref.at[dst],
                    out_sem.at[slot, 1]),
            )

        @pl.when(blk == 0)
        def _():
            for sslot in range(B_CACHE_SLOTS):
                b_tags[sslot] = -1
                b_live[sslot] = 0
            for d in a_dmas(0, 0):
                d.start()

        # prefetch the next block's A while this block computes
        @pl.when(blk + 1 < n_blocks)
        def _():
            for d in a_dmas(blk + 1, 1 - buf):
                d.start()

        for d in a_dmas(blk, buf):
            d.wait()

        # outbufs[buf] were last written back by block blk-2; reclaim them
        @pl.when(blk >= 2)
        def _():
            for d in out_dmas(blk - 2, buf):
                d.wait()

        ov_sc[buf] = jnp.zeros_like(ov_sc[buf])
        oo_sc[buf] = jnp.zeros_like(oo_sc[buf])

        def b_copies(k, slot):
            return (
                pltpu.make_async_copy(
                    bv_ref.at[k], bv_sc.at[slot], b_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    bo_ref.at[k], bo_sc.at[slot], b_sem.at[slot, 1]),
            )

        def start_fetch(k, avoid_slot):
            """Begin an async fetch of slab k unless cached; never evicts
            `avoid_slot` (the slab the current iteration reads) or a slot
            with a copy still in flight."""
            slot = jax.lax.rem(k, jnp.int32(B_CACHE_SLOTS))

            @pl.when((b_tags[slot] != k) & (slot != avoid_slot)
                     & (b_live[slot] == 0))
            def _():
                for d in b_copies(k, slot):
                    d.start()
                b_tags[slot] = k
                b_live[slot] = 1  # in flight

            return slot

        def ensure_b(k):
            """Return the slot holding k, synchronously fetching on miss
            and draining an in-flight prefetch on hit."""
            slot = jax.lax.rem(k, jnp.int32(B_CACHE_SLOTS))

            # a stale prefetch may still be writing this slot: drain it
            # before starting a replacement copy (copy sizes are constant,
            # so the wait descriptor does not depend on which k it was)
            @pl.when((b_tags[slot] != k) & (b_live[slot] == 1))
            def _():
                for d in b_copies(k, slot):
                    d.wait()
                b_live[slot] = 0

            @pl.when(b_tags[slot] != k)
            def _():
                for d in b_copies(k, slot):
                    d.start()
                b_tags[slot] = k
                b_live[slot] = 1

            @pl.when(b_live[slot] == 1)
            def _():
                for d in b_copies(k, slot):
                    d.wait()
                b_live[slot] = 0

            return slot

        i0 = blk * block_rows
        a_lo = aptr_ref[i0]
        a_hi = aptr_ref[jnp.minimum(i0 + block_rows, gm)]

        def t_body(g, _):
            k = ak_ref[g]
            slot = ensure_b(k)
            # overlap the next tile's B slab with this tile's compute
            # (ak is padded past ntA, so reading g+1 is always safe)
            start_fetch(ak_ref[g + 1], slot)
            la = g - a_lo
            prod_v = jnp.dot(
                av_sc[buf, la], bv_sc[slot],
                preferred_element_type=ov_sc.dtype,
                precision=val_precision,
            )
            # Mosaic requires a 32-bit matmul accumulator; cast after
            prod_o = jnp.dot(
                ao_sc[buf, la], bo_sc[slot],
                preferred_element_type=jnp.float32,
            ).astype(oo_sc.dtype)
            for y in range(max_b):  # static unroll over B slots
                s = slot_ref[g * max_b + y]
                ov_sc[buf, s] += prod_v[:, y * tn : (y + 1) * tn]
                oo_sc[buf, s] += prod_o[:, y * tn : (y + 1) * tn]
            return 0

        jax.lax.fori_loop(a_lo, a_hi, t_body, 0)

        for d in out_dmas(blk, buf):
            d.start()

        # drain in-flight writebacks and B prefetches at the end of the grid
        @pl.when(blk == n_blocks - 1)
        def _():
            @pl.when(blk >= 1)
            def _():
                for d in out_dmas(blk - 1, 1 - buf):
                    d.wait()

            for d in out_dmas(blk, buf):
                d.wait()

            for sslot in range(B_CACHE_SLOTS):
                @pl.when(b_live[sslot] == 1)
                def _(sslot=sslot):
                    for d in b_copies(b_tags[sslot], sslot):
                        d.wait()
                    b_live[sslot] = 0

    return kernel


def _strip_window_kernel_factory(tm, tk, tn, max_b, max_ablock, max_cblock,
                                 block_rows, gm, n_blocks, val_precision,
                                 kwin):
    """Windowed-B variant: each block's B slabs span a contiguous k range
    of at most `kwin` slabs (banded / locality-rich matrices), so B
    arrives by ONE prefetched DMA per block exactly like A — no cache
    lookups, no per-iteration fetch branches. Per-tile metadata (tile-col
    k and the max_b output slots) lives in HBM as 128-wide rows and is
    DMAed per block into SMEM scratch, so scalar-prefetch size stays
    O(gm) regardless of matrix nnz (no SMEM ceiling on matrix size)."""
    W = 1 + max_b  # meta words per tile: [k, slot_0..slot_{max_b-1}]
    meta_rows = strip_meta_rows(max_ablock, max_b)

    def kernel(
        aptr_ref,    # (gm+1,)
        kmin_ref,    # (n_blocks,) first k slab of each block's window
        av_ref, ao_ref,          # (ntA_pad, tm, tk)
        bv_ref, bo_ref,          # (gk_pad, tk, max_b*tn), gk_pad >= kwin
        meta_ref,                # (meta_total_rows, 128) int32 HBM
        cv_ref, co_ref,          # (n_blocks*max_cblock, tm, tn)
        av_sc, ao_sc,            # (2, max_ablock, tm, tk)
        bv_sc, bo_sc,            # (2, kwin, tk, max_b*tn)
        ov_sc, oo_sc,            # (2, max_cblock+1, tm, tn)
        meta_sc,                 # SMEM (2, meta_rows, 128) int32
        av_sem, ao_sem,          # DMA (2,)
        bv_sem, bo_sem,          # DMA (2,)
        meta_sem,                # DMA (2,)
        out_sem,                 # DMA (2, 2)
    ):
        blk = pl.program_id(0)
        buf = blk % 2

        def in_dmas(p, slot):
            a_lo = aptr_ref[p * block_rows]
            klo = kmin_ref[p]
            row0 = (a_lo * W) // 128
            return (
                pltpu.make_async_copy(
                    av_ref.at[pl.ds(a_lo, max_ablock)], av_sc.at[slot],
                    av_sem.at[slot]),
                pltpu.make_async_copy(
                    ao_ref.at[pl.ds(a_lo, max_ablock)], ao_sc.at[slot],
                    ao_sem.at[slot]),
                pltpu.make_async_copy(
                    bv_ref.at[pl.ds(klo, kwin)], bv_sc.at[slot],
                    bv_sem.at[slot]),
                pltpu.make_async_copy(
                    bo_ref.at[pl.ds(klo, kwin)], bo_sc.at[slot],
                    bo_sem.at[slot]),
                pltpu.make_async_copy(
                    meta_ref.at[pl.ds(row0, meta_rows)], meta_sc.at[slot],
                    meta_sem.at[slot]),
            )

        def out_dmas(p, slot):
            dst = pl.ds(p * max_cblock, max_cblock)
            return (
                pltpu.make_async_copy(
                    ov_sc.at[slot, pl.ds(0, max_cblock)], cv_ref.at[dst],
                    out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    oo_sc.at[slot, pl.ds(0, max_cblock)], co_ref.at[dst],
                    out_sem.at[slot, 1]),
            )

        @pl.when(blk == 0)
        def _():
            for d in in_dmas(0, 0):
                d.start()

        @pl.when(blk + 1 < n_blocks)
        def _():
            for d in in_dmas(blk + 1, 1 - buf):
                d.start()

        for d in in_dmas(blk, buf):
            d.wait()

        @pl.when(blk >= 2)
        def _():
            for d in out_dmas(blk - 2, buf):
                d.wait()

        ov_sc[buf] = jnp.zeros_like(ov_sc[buf])
        oo_sc[buf] = jnp.zeros_like(oo_sc[buf])

        i0 = blk * block_rows
        a_lo = aptr_ref[i0]
        a_hi = aptr_ref[jnp.minimum(i0 + block_rows, gm)]
        klo = kmin_ref[blk]
        meta_base = ((a_lo * W) // 128) * 128  # flat offset of meta_sc[buf,0,0]

        def meta_read(flat):
            loc = flat - meta_base
            return meta_sc[buf, loc // 128, loc % 128]

        def t_body(g, _):
            w = meta_read(g * W) - klo
            la = g - a_lo
            prod_v = jnp.dot(
                av_sc[buf, la], bv_sc[buf, w],
                preferred_element_type=ov_sc.dtype,
                precision=val_precision,
            )
            prod_o = jnp.dot(
                ao_sc[buf, la], bo_sc[buf, w],
                preferred_element_type=jnp.float32,
            ).astype(oo_sc.dtype)
            for y in range(max_b):
                s = meta_read(g * W + 1 + y)
                ov_sc[buf, s] += prod_v[:, y * tn : (y + 1) * tn]
                oo_sc[buf, s] += prod_o[:, y * tn : (y + 1) * tn]
            return 0

        jax.lax.fori_loop(a_lo, a_hi, t_body, 0)

        for d in out_dmas(blk, buf):
            d.start()

        @pl.when(blk == n_blocks - 1)
        def _():
            @pl.when(blk >= 1)
            def _():
                for d in out_dmas(blk - 1, 1 - buf):
                    d.wait()

            for d in out_dmas(blk, buf):
                d.wait()

    return kernel


def gustavson_strip_pallas(
    a_val: jax.Array,      # (ntA_pad, tm, tk) float32
    a_occ: jax.Array,      # (ntA_pad, tm, tk) occ dtype (bfloat16 default)
    b_val: jax.Array,      # (gk, tk, max_b*tn)
    b_occ: jax.Array,      # (gk, tk, max_b*tn) occ dtype
    aptr: jax.Array,       # (gm+1,)
    *rest: jax.Array,      # cached mode: (ak, slots); windowed: (kmin, meta)
    **kw,
) -> tuple[jax.Array, jax.Array]:
    return _gustavson_strip_pallas(a_val, a_occ, b_val, b_occ, aptr,
                                   *rest, **kw)


def _gustavson_strip_pallas(
    a_val, a_occ, b_val, b_occ, aptr, r0, r1,
    *,
    gm: int,
    max_b: int,
    max_ablock: int,
    max_cblock: int,
    block_rows: int = 32,
    kwin: int | None = None,
    acc_dtype=jnp.float32,
    val_precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (c_val, c_cnt) in the block-padded layout
    (n_blocks*max_cblock, tm, tn) each. Block p's C tiles occupy
    [p*max_cblock, ...); unused slots in each block's range are zero
    (StripArgs.gather_idx maps candidate order -> padded position).

    Values accumulate in acc_dtype with val_precision matmuls (Mosaic
    supports DEFAULT and HIGHEST = 6-pass bf16). Occupancy counts
    run in a_occ.dtype end to end — bfloat16 is exact for the 0/1
    inputs and sign-safe for the >0 pattern test (sums of nonnegative
    terms never round below the first term)."""
    _, tm, tk = a_val.shape
    tn = b_val.shape[2] // max_b
    occ_dtype = a_occ.dtype
    n_blocks = max(1, -(-gm // block_rows))

    if kwin is not None:
        kmin, meta = r0, r1
        kernel = _strip_window_kernel_factory(
            tm, tk, tn, max_b, max_ablock, max_cblock, block_rows, gm,
            n_blocks, val_precision, kwin,
        )
        meta_rows = strip_meta_rows(max_ablock, max_b)
        scratch = [
            pltpu.VMEM((2, max_ablock, tm, tk), acc_dtype),
            pltpu.VMEM((2, max_ablock, tm, tk), occ_dtype),
            pltpu.VMEM((2, kwin, tk, max_b * tn), acc_dtype),
            pltpu.VMEM((2, kwin, tk, max_b * tn), occ_dtype),
            pltpu.VMEM((2, max_cblock + 1, tm, tn), acc_dtype),
            pltpu.VMEM((2, max_cblock + 1, tm, tn), occ_dtype),
            pltpu.SMEM((2, meta_rows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks * max_cblock, tm, tn),
                                     acc_dtype),
                jax.ShapeDtypeStruct((n_blocks * max_cblock, tm, tn),
                                     occ_dtype),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(aptr, kmin, a_val, a_occ, b_val, b_occ, meta)
    else:
        kernel = _strip_kernel_factory(
            tm, tk, tn, max_b, max_ablock, max_cblock, block_rows, gm,
            n_blocks, val_precision,
        )
        scratch = [
            pltpu.VMEM((2, max_ablock, tm, tk), acc_dtype),
            pltpu.VMEM((2, max_ablock, tm, tk), occ_dtype),
            pltpu.VMEM((B_CACHE_SLOTS, tk, max_b * tn), acc_dtype),
            pltpu.VMEM((B_CACHE_SLOTS, tk, max_b * tn), occ_dtype),
            pltpu.VMEM((2, max_cblock + 1, tm, tn), acc_dtype),
            pltpu.VMEM((2, max_cblock + 1, tm, tn), occ_dtype),
            pltpu.SMEM((B_CACHE_SLOTS,), jnp.int32),
            pltpu.SMEM((B_CACHE_SLOTS,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((B_CACHE_SLOTS, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        ak, slots = r0, r1
        num_scalars = 3
        scalar_args = (aptr, ak, slots)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_scalars,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * max_cblock, tm, tn), acc_dtype),
            jax.ShapeDtypeStruct((n_blocks * max_cblock, tm, tn), occ_dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*scalar_args, a_val, a_occ, b_val, b_occ)


# ---------------------------------------------------------------------------
# SpMM strip kernel: Y = A @ X with dense X resident in VMEM.
#
# The XLA SpMM path (ops/spmm.py:_spmm_tiles) gathers an (nt, tn, k) copy
# of X blocks — for unstructured matrices that is far more traffic than
# A itself. Here X lives in VMEM once (n*k*4 bytes, fits for n ~< 90k at
# k=128), A tiles stream per block of tile-rows with double-buffered
# contiguous DMA (same pattern as the SpGEMM strip kernel), and each
# block's Y rows are staged in VMEM and written back exactly once. Total
# HBM traffic = A once + X once + Y once: speed of light for this op.
# ---------------------------------------------------------------------------


def _spmm_kernel_factory(tm, tk, k, max_ablock, block_rows, gm, gk,
                         n_blocks, precision):
    def kernel(
        aptr_ref,    # (gm+1,)
        ak_ref,      # (ntA_pad,) tile-col of each A tile
        arow_ref,    # (ntA_pad,) tile-row of each A tile
        a_ref,       # (ntA_pad, tm, tk) HBM
        x_ref,       # (gk, tk, k) HBM
        y_ref,       # (n_blocks*block_rows, tm, k) HBM
        a_sc,        # VMEM (2, max_ablock, tm, tk)
        x_sc,        # VMEM (gk, tk, k) — X resident
        y_sc,        # VMEM (2, block_rows, tm, k)
        a_sem,       # DMA (2,)
        x_sem,
        y_sem,       # DMA (2,)
    ):
        blk = pl.program_id(0)
        buf = blk % 2

        def a_dma(p, slot):
            return pltpu.make_async_copy(
                a_ref.at[pl.ds(aptr_ref[p * block_rows], max_ablock)],
                a_sc.at[slot], a_sem.at[slot])

        def y_dma(p, slot):
            return pltpu.make_async_copy(
                y_sc.at[slot],
                y_ref.at[pl.ds(p * block_rows, block_rows)],
                y_sem.at[slot])

        @pl.when(blk == 0)
        def _():
            xd = pltpu.make_async_copy(x_ref, x_sc, x_sem)
            xd.start()
            a_dma(0, 0).start()
            xd.wait()

        @pl.when(blk + 1 < n_blocks)
        def _():
            a_dma(blk + 1, 1 - buf).start()

        a_dma(blk, buf).wait()

        @pl.when(blk >= 2)
        def _():
            y_dma(blk - 2, buf).wait()

        y_sc[buf] = jnp.zeros_like(y_sc[buf])

        i0 = blk * block_rows
        a_lo = aptr_ref[i0]
        a_hi = aptr_ref[jnp.minimum(i0 + block_rows, gm)]

        def t_body(g, _):
            r = arow_ref[g] - i0
            prod = jnp.dot(
                a_sc[buf, g - a_lo], x_sc[ak_ref[g]],
                preferred_element_type=y_sc.dtype,
                precision=precision,
            )
            y_sc[buf, r] += prod
            return 0

        jax.lax.fori_loop(a_lo, a_hi, t_body, 0)

        y_dma(blk, buf).start()

        @pl.when(blk == n_blocks - 1)
        def _():
            @pl.when(blk >= 1)
            def _():
                y_dma(blk - 1, 1 - buf).wait()

            y_dma(blk, buf).wait()

    return kernel


def spmm_strip_pallas(
    a_dense: jax.Array,   # (ntA_pad, tm, tk)
    xb: jax.Array,        # (gk, tk, k)
    aptr: jax.Array,      # (gm+1,)
    ak: jax.Array,        # (ntA_pad,)
    arow: jax.Array,      # (ntA_pad,)
    *,
    gm: int,
    max_ablock: int,
    block_rows: int = 64,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jax.Array:
    """Returns Y as (n_blocks*block_rows, tm, k); rows past gm are
    garbage padding (callers slice [:gm])."""
    _, tm, tk = a_dense.shape
    gk, _, k = xb.shape
    n_blocks = max(1, -(-gm // block_rows))
    kernel = _spmm_kernel_factory(
        tm, tk, k, max_ablock, block_rows, gm, gk, n_blocks, precision
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, max_ablock, tm, tk), a_dense.dtype),
            pltpu.VMEM((gk, tk, k), xb.dtype),
            pltpu.VMEM((2, block_rows, tm, k), a_dense.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * block_rows, tm, k), a_dense.dtype
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(aptr, ak, arow, a_dense, xb)


def _spmm_window_kernel_factory(tm, tk, k, max_ablock, block_rows, gm,
                                n_blocks, kwin, precision):
    """Windowed-X SpMM: when X exceeds VMEM but each block's A tiles span
    a small contiguous k range, stream the X window per block with one
    prefetched DMA (same pattern as the windowed SpGEMM strip kernel)."""

    def kernel(
        aptr_ref,    # (gm+1,)
        ak_ref,      # (ntA_pad,)
        arow_ref,    # (ntA_pad,)
        kmin_ref,    # (n_blocks,)
        a_ref,       # (ntA_pad, tm, tk) HBM
        x_ref,       # (gk_pad, tk, k) HBM
        y_ref,       # (n_blocks*block_rows, tm, k) HBM
        a_sc,        # VMEM (2, max_ablock, tm, tk)
        x_sc,        # VMEM (2, kwin, tk, k)
        y_sc,        # VMEM (2, block_rows, tm, k)
        a_sem,       # DMA (2,)
        x_sem,       # DMA (2,)
        y_sem,       # DMA (2,)
    ):
        blk = pl.program_id(0)
        buf = blk % 2

        def in_dmas(p, slot):
            return (
                pltpu.make_async_copy(
                    a_ref.at[pl.ds(aptr_ref[p * block_rows], max_ablock)],
                    a_sc.at[slot], a_sem.at[slot]),
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(kmin_ref[p], kwin)],
                    x_sc.at[slot], x_sem.at[slot]),
            )

        def y_dma(p, slot):
            return pltpu.make_async_copy(
                y_sc.at[slot],
                y_ref.at[pl.ds(p * block_rows, block_rows)],
                y_sem.at[slot])

        @pl.when(blk == 0)
        def _():
            for d in in_dmas(0, 0):
                d.start()

        @pl.when(blk + 1 < n_blocks)
        def _():
            for d in in_dmas(blk + 1, 1 - buf):
                d.start()

        for d in in_dmas(blk, buf):
            d.wait()

        @pl.when(blk >= 2)
        def _():
            y_dma(blk - 2, buf).wait()

        y_sc[buf] = jnp.zeros_like(y_sc[buf])

        i0 = blk * block_rows
        a_lo = aptr_ref[i0]
        a_hi = aptr_ref[jnp.minimum(i0 + block_rows, gm)]
        klo = kmin_ref[blk]

        def t_body(g, _):
            r = arow_ref[g] - i0
            prod = jnp.dot(
                a_sc[buf, g - a_lo], x_sc[buf, ak_ref[g] - klo],
                preferred_element_type=y_sc.dtype,
                precision=precision,
            )
            y_sc[buf, r] += prod
            return 0

        jax.lax.fori_loop(a_lo, a_hi, t_body, 0)

        y_dma(blk, buf).start()

        @pl.when(blk == n_blocks - 1)
        def _():
            @pl.when(blk >= 1)
            def _():
                y_dma(blk - 1, 1 - buf).wait()

            y_dma(blk, buf).wait()

    return kernel


def spmm_window_pallas(
    a_dense: jax.Array,   # (ntA_pad, tm, tk)
    xb: jax.Array,        # (gk_pad, tk, k)
    aptr: jax.Array,      # (gm+1,)
    ak: jax.Array,        # (ntA_pad,)
    arow: jax.Array,      # (ntA_pad,)
    kmin: jax.Array,      # (n_blocks,)
    *,
    gm: int,
    max_ablock: int,
    kwin: int,
    block_rows: int = 64,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jax.Array:
    """Windowed-X SpMM; returns Y as (n_blocks*block_rows, tm, k), rows
    past gm are garbage padding (callers slice [:gm])."""
    _, tm, tk = a_dense.shape
    k = xb.shape[2]
    n_blocks = max(1, -(-gm // block_rows))
    kernel = _spmm_window_kernel_factory(
        tm, tk, k, max_ablock, block_rows, gm, n_blocks, kwin, precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, max_ablock, tm, tk), a_dense.dtype),
            pltpu.VMEM((2, kwin, tk, k), xb.dtype),
            pltpu.VMEM((2, block_rows, tm, k), a_dense.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * block_rows, tm, k), a_dense.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(aptr, ak, arow, kmin, a_dense, xb)


# ---------------------------------------------------------------------------
# Ozaki strip kernel: exact-f64 numeric fused end to end.
#
# The XLA ozaki engine (ops/ozaki.py:ozaki_core) materializes every
# slice-pair product slab in HBM and pays one XLA scatter-add per pair
# group — measured 66 ms of a 94 ms cant-scale S=8x8 dispatch, with the
# 64 skinny (M=16) slab matmuls adding 23 ms at ~8% MXU utilization.
# This kernel is the strip formulation of the same arithmetic
# (reference step-4 numeric is double throughout,
# /root/reference/src/tilespgemm-cuda.h:2649-2728):
#
#   * A's Sa int8 slices are stacked VERTICALLY per tile
#     (stack_rows = Sa*tm): ONE M=128 MXU dot per (A tile, B slice t)
#     yields the products of ALL Sa slice pairs (s, t) at once — 8 full
#     dots instead of 64 skinny ones.
#   * Pair-group sums build in a group-stacked VMEM accumulator:
#     prod_t's slice-s rows land at accumulator rows (s+t)*tm, so
#     ACC[slot] row-block p is exactly M_p = sum_{s+t=p} A_s B_t in
#     int32 — same exactness argument as the XLA engine (the host plan
#     guarantees the int32 bound), NO scatter, NO HBM intermediates.
#   * The triple-float (h, m, l) reduction over groups runs per block
#     in-kernel (exact int32 -> f32 split, 2^(-7p) power-of-two scales,
#     cascaded TwoSum), then one block-padded writeback of 4 planes.
#
# Geometry (aptr/meta/slots/kmin, block-padded C, windowed B delivery)
# is the production strip plan's, unchanged (gustavson.build_strip_args).
# ---------------------------------------------------------------------------


def _ozaki_strip_kernel_factory(tm, tk, tn, max_b, max_ablock, max_cblock,
                                block_rows, gm, n_blocks, kwin,
                                sa, sb, stack_rows, pmax):
    W = 1 + max_b
    meta_rows = strip_meta_rows(max_ablock, max_b)
    n_groups = min(sa + sb - 1, pmax + 1)
    acc_rows = max(32, n_groups * tm)
    # rows of prod's slice-s stack kept for B slice t: groups p = s + t
    # with p <= pmax (plan-chosen truncation; the VPU accumulate is the
    # kernel's bottleneck and scales with kept rows)
    kept = [max(0, min(stack_rows, (pmax + 1 - t) * tm)) for t in range(sb)]

    def kernel(
        aptr_ref,    # (gm+1,)
        kmin_ref,    # (n_blocks,)
        av_ref,      # (ntA_pad, stack_rows, tk) int8 — stacked A slices
        ao_ref,      # (ntA_pad, tm, tk) occ dtype (bfloat16)
        bv_ref,      # (gk_pad, tk, sb*max_b*tn) int8 — B slices, t-major
        bo_ref,      # (gk_pad, tk, max_b*tn) occ dtype
        meta_ref,    # (meta_total_rows, 128) int32
        ch_ref, cm_ref, cl_ref,  # (n_blocks*max_cblock, tm, tn) f32
        cc_ref,                  # (n_blocks*max_cblock, tm, tn) f32
        av_sc,       # VMEM (2, max_ablock, stack_rows, tk) int8
        ao_sc,       # VMEM (2, max_ablock, tm, tk) occ
        bv_sc,       # VMEM (2, kwin, tk, sb*max_b*tn) int8
        bo_sc,       # VMEM (2, kwin, tk, max_b*tn) occ
        acc_sc,      # VMEM (max_cblock+1, acc_rows, tn) int32 (single buf)
        oh_sc, om_sc, ol_sc, oc_sc,  # VMEM (2, max_cblock+1, tm, tn) f32
        meta_sc,     # SMEM (2, meta_rows, 128) int32
        av_sem, ao_sem, bo_sem, meta_sem,   # DMA (2,)
        bv_sem,      # DMA (2,)
        out_sem,     # DMA (2, 4)
    ):
        blk = pl.program_id(0)
        buf = blk % 2

        def in_dmas(p, slot):
            a_lo = aptr_ref[p * block_rows]
            klo = kmin_ref[p]
            row0 = (a_lo * W) // 128
            return [
                pltpu.make_async_copy(
                    av_ref.at[pl.ds(a_lo, max_ablock)], av_sc.at[slot],
                    av_sem.at[slot]),
                pltpu.make_async_copy(
                    ao_ref.at[pl.ds(a_lo, max_ablock)], ao_sc.at[slot],
                    ao_sem.at[slot]),
                pltpu.make_async_copy(
                    bv_ref.at[pl.ds(klo, kwin)], bv_sc.at[slot],
                    bv_sem.at[slot]),
                pltpu.make_async_copy(
                    bo_ref.at[pl.ds(klo, kwin)], bo_sc.at[slot],
                    bo_sem.at[slot]),
                pltpu.make_async_copy(
                    meta_ref.at[pl.ds(row0, meta_rows)], meta_sc.at[slot],
                    meta_sem.at[slot]),
            ]

        def out_dmas(p, slot):
            dst = pl.ds(p * max_cblock, max_cblock)
            srcs = (oh_sc, om_sc, ol_sc, oc_sc)
            dsts = (ch_ref, cm_ref, cl_ref, cc_ref)
            return [
                pltpu.make_async_copy(
                    s.at[slot, pl.ds(0, max_cblock)], d.at[dst],
                    out_sem.at[slot, i])
                for i, (s, d) in enumerate(zip(srcs, dsts))
            ]

        @pl.when(blk == 0)
        def _():
            for d in in_dmas(0, 0):
                d.start()

        @pl.when(blk + 1 < n_blocks)
        def _():
            for d in in_dmas(blk + 1, 1 - buf):
                d.start()

        for d in in_dmas(blk, buf):
            d.wait()

        @pl.when(blk >= 2)
        def _():
            for d in out_dmas(blk - 2, buf):
                d.wait()

        acc_sc[...] = jnp.zeros_like(acc_sc)
        oc_sc[buf] = jnp.zeros_like(oc_sc[buf])

        i0 = blk * block_rows
        a_lo = aptr_ref[i0]
        a_hi = aptr_ref[jnp.minimum(i0 + block_rows, gm)]
        klo = kmin_ref[blk]
        meta_base = ((a_lo * W) // 128) * 128

        def meta_read(flat):
            loc = flat - meta_base
            return meta_sc[buf, loc // 128, loc % 128]

        def t_body(g, _):
            w = meta_read(g * W) - klo
            la = g - a_lo
            prod_o = jnp.dot(
                ao_sc[buf, la], bo_sc[buf, w],
                preferred_element_type=jnp.float32)
            # ONE fat MXU dot per tile: all Sa slice rows x all
            # (t, y) B columns at once (N = sb*max_b*tn)
            prod = jax.lax.dot_general(
                av_sc[buf, la], bv_sc[buf, w],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            for y in range(max_b):
                s = meta_read(g * W + 1 + y)
                for t in range(sb):  # static unroll; slice-s rows of B
                    if kept[t] == 0:   # slice t accumulate at group
                        continue       # rows (s+t)*tm, truncated at pmax
                    col = (t * max_b + y) * tn
                    acc_sc[s, t * tm : t * tm + kept[t]] += (
                        prod[: kept[t], col : col + tn])
                oc_sc[buf, s] += prod_o[:, y * tn : (y + 1) * tn]
            return 0

        jax.lax.fori_loop(a_lo, a_hi, t_body, 0)

        # triple-float reduce of the group accumulators (VPU): exact
        # int32 -> (mh, ml) f32 split, power-of-two scales, cascaded
        # TwoSum — identical arithmetic to ops/ozaki.py:_acc3
        h = jnp.zeros((max_cblock + 1, tm, tn), jnp.float32)
        m = jnp.zeros((max_cblock + 1, tm, tn), jnp.float32)
        low = jnp.zeros((max_cblock + 1, tm, tn), jnp.float32)

        def two_sum(x, y):
            s = x + y
            bb = s - x
            return s, (x - (s - bb)) + (y - bb)

        for p in range(n_groups):
            mp = acc_sc[:, p * tm : (p + 1) * tm, :]
            mh = mp.astype(jnp.float32)
            ml = (mp - mh.astype(jnp.int32)).astype(jnp.float32)
            scale = jnp.float32(2.0 ** (-7 * p))
            for x in (mh * scale, ml * scale):
                h, e = two_sum(h, x)
                m, e2 = two_sum(m, e)
                low = low + e2
        oh_sc[buf] = h
        om_sc[buf] = m
        ol_sc[buf] = low

        for d in out_dmas(blk, buf):
            d.start()

        @pl.when(blk == n_blocks - 1)
        def _():
            @pl.when(blk >= 1)
            def _():
                for d in out_dmas(blk - 1, 1 - buf):
                    d.wait()

            for d in out_dmas(blk, buf):
                d.wait()

    return kernel


def ozaki_strip_pallas(
    av8: jax.Array,      # (ntA_pad, stack_rows, tk) int8 stacked A slices
    a_occ: jax.Array,    # (ntA_pad, tm, tk) occ dtype
    bv8: jax.Array,      # (gk_pad, tk, sb*max_b*tn) int8 B slices, t-major
    b_occ: jax.Array,    # (gk_pad, tk, max_b*tn) occ dtype
    aptr: jax.Array,
    kmin: jax.Array,
    meta: jax.Array,
    *,
    gm: int,
    tm: int,
    max_b: int,
    max_ablock: int,
    max_cblock: int,
    block_rows: int,
    kwin: int,
    sa: int,
    sb: int,
    pmax: int | None = None,
    interpret: bool = False,
):
    """Fused exact-f64 strip numeric. Returns (c_h, c_m, c_l, c_cnt) in
    the block-padded layout (n_blocks*max_cblock, tm, tn), all f32 —
    the UNSCALED triple-float sums sum_p M_p 2^(-7p) plus structural
    counts; the host applies 2^(Ea_r + Eb_c - 14) in f64
    (ops/ozaki.py: strip compact path). pmax truncates pair groups
    p = s + t (plan-chosen; None keeps all)."""
    _, stack_rows, tk = av8.shape
    tn = b_occ.shape[2] // max_b
    occ_dtype = a_occ.dtype
    n_blocks = max(1, -(-gm // block_rows))
    if pmax is None:
        pmax = sa + sb - 2
    n_groups = min(sa + sb - 1, pmax + 1)
    acc_rows = max(32, n_groups * tm)
    meta_rows = strip_meta_rows(max_ablock, max_b)

    kernel = _ozaki_strip_kernel_factory(
        tm, tk, tn, max_b, max_ablock, max_cblock, block_rows, gm,
        n_blocks, kwin, sa, sb, stack_rows, pmax)
    scratch = [
        pltpu.VMEM((2, max_ablock, stack_rows, tk), jnp.int8),
        pltpu.VMEM((2, max_ablock, tm, tk), occ_dtype),
        pltpu.VMEM((2, kwin, tk, sb * max_b * tn), jnp.int8),
        pltpu.VMEM((2, kwin, tk, max_b * tn), occ_dtype),
        pltpu.VMEM((max_cblock + 1, acc_rows, tn), jnp.int32),
        pltpu.VMEM((2, max_cblock + 1, tm, tn), jnp.float32),
        pltpu.VMEM((2, max_cblock + 1, tm, tn), jnp.float32),
        pltpu.VMEM((2, max_cblock + 1, tm, tn), jnp.float32),
        pltpu.VMEM((2, max_cblock + 1, tm, tn), jnp.float32),
        pltpu.SMEM((2, meta_rows, 128), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, 4)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=scratch,
    )
    shp = (n_blocks * max_cblock, tm, tn)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.float32)] * 4,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(aptr, kmin, av8, a_occ, bv8, b_occ, meta)
