"""Pallas TPU kernels: fused tile-pair product accumulation.

The fast path for the numeric phase. Where the XLA path
(ops/numeric.py) materializes gathered (chunk, tm, tk) pair blocks in
HBM, this kernel runs one grid program per C tile, streams that tile's
matched (A, B) tile pairs HBM -> VMEM with double-buffered async DMA, and
accumulates values and structural counts in the C tile's private VMEM
output block — the TPU equivalent of the reference's step-4 kernels
(`src/tilespgemm-cuda.h:1273-2218`) with a dense accumulator per tile and
*no shared scratch* (the reference fork's race, SURVEY.md 2.3, cannot
occur: each grid program owns its output block).

Values and occupancy are packed as (nt, 2, tm, tn) so each side needs a
single DMA per pair.
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
    if not interpret and jax.default_backend() not in ("cpu",):
        # Mosaic requires 128-aligned minor dims for HBM DMA slices; the
        # per-pair (tm, tk) tile DMAs here violate that for tk < 128. The
        # strip kernel (gustavson_strip_pallas) is the production TPU path.
        raise NotImplementedError(
            "the per-pair DMA kernel is interpret-mode only on TPU "
            "(unaligned tiny-tile DMAs); use backend='strip'"
        )
    ntA, tm, tk = a_val.shape
    ntB, tk2, tn = b_val.shape
    assert tk == tk2

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
# program owns a BLOCK of C tile-rows, keeps one row's strip of C tiles
# resident in VMEM, streams A's block tiles with a single contiguous DMA,
# streams B k-slabs through a small direct-mapped VMEM cache (banded /
# locality-rich matrices reuse the same k across adjacent rows, so most
# lookups hit), accumulates with MXU matmuls, and writes each C tile to
# HBM exactly once through a per-row staging buffer. Values and
# occupancy ride as two planes of one packed buffer. TPU grid programs
# run sequentially on a core, so VMEM state is race-free by construction.
#
# This is the TPU answer to the reference's step-4 size-binned kernels
# (`src/tilespgemm-cuda.h:1273-2218`): instead of 5 CUDA kernels with
# warp-level sparse accumulators, one kernel with dense VMEM strips and
# MXU slab products.
# ---------------------------------------------------------------------------

B_CACHE_SLOTS = 4


def _strip_kernel_factory(tm, tk, tn, max_b, max_ablock, max_crow, gn_c,
                          block_rows, gm):
    def kernel(
        # scalar prefetch
        aptr_ref,    # (gm+1,)  A tile-row pointer
        ak_ref,      # (ntA_pad,) tile-col k of each A tile
        cntb_ref,    # (gk,)    B tiles per row k
        jpos_ref,    # (gk*max_b,) C tile-col of B slot (k, y)
        ctptr_ref,   # (gm+1,)  C tile-row pointer
        ccol_ref,    # (ntC_pad,) C tile-col per candidate tile
        # tensor inputs (HBM)
        a_ref,       # (ntA_pad, 2, tm, tk) packed val/occ, row-major tiles
        b_ref,       # (gk, 2, tk, max_b*tn) packed stacked B slabs
        # output (HBM)
        c_ref,       # (ntC_pad, 2, tm, tn)
        # scratch
        strip,       # VMEM (gn_c, 2, tm, tn)
        a_sc,        # VMEM (max_ablock, 2, tm, tk) block A slab
        b_sc,        # VMEM (B_CACHE_SLOTS, 2, tk, max_b*tn) B cache
        outbuf,      # VMEM (block_rows, max_crow, 2, tm, tn)
        b_tags,      # SMEM (B_CACHE_SLOTS,) cached k per slot (-1 empty)
        a_sem,
        b_sem,       # DMA sems (B_CACHE_SLOTS,)
        out_sem,     # DMA sems (block_rows,)
    ):
        blk = pl.program_id(0)
        i0 = blk * block_rows

        # invalidate the B cache at the start of every program (tags do
        # not persist meaningfully across programs on all pipelines)
        @pl.when(blk >= 0)
        def _():
            for sslot in range(B_CACHE_SLOTS):
                b_tags[sslot] = -1

        a_lo = aptr_ref[i0]
        row_end = jnp.minimum(i0 + block_rows, gm)
        a_hi = aptr_ref[row_end]

        # one contiguous DMA for the whole block's A tiles
        @pl.when(a_hi > a_lo)
        def _():
            dma = pltpu.make_async_copy(
                a_ref.at[pl.ds(a_lo, max_ablock)], a_sc, a_sem
            )
            dma.start()
            dma.wait()

        def fetch_b(k):
            """Direct-mapped cache lookup; returns the slot holding k."""
            slot = jax.lax.rem(k, jnp.int32(B_CACHE_SLOTS))

            @pl.when(b_tags[slot] != k)
            def _():
                dma = pltpu.make_async_copy(
                    b_ref.at[k], b_sc.at[slot], b_sem.at[slot]
                )
                dma.start()
                dma.wait()
                b_tags[slot] = k

            return slot

        def row_body(r, _):
            i = i0 + r
            lo = aptr_ref[i] - a_lo     # block-local A range
            n_a = aptr_ref[i + 1] - aptr_ref[i]
            c_lo = ctptr_ref[i]
            n_c = ctptr_ref[i + 1] - c_lo

            # zero this row's candidate strip tiles
            def zero_body(s, _):
                strip[ccol_ref[c_lo + s]] = jnp.zeros(
                    (2, tm, tn), strip.dtype
                )
                return 0

            jax.lax.fori_loop(0, n_c, zero_body, 0)

            # accumulate the row's tile products
            def t_body(t, _):
                k = ak_ref[aptr_ref[i] + t]
                slot = fetch_b(k)
                prod_v = jnp.dot(
                    a_sc[lo + t, 0], b_sc[slot, 0],
                    preferred_element_type=strip.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
                prod_o = jnp.dot(
                    a_sc[lo + t, 1], b_sc[slot, 1],
                    preferred_element_type=strip.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
                nb = cntb_ref[k]
                for y in range(max_b):  # static unroll over B slots
                    @pl.when(y < nb)
                    def _(y=y):
                        j = jpos_ref[k * max_b + y]
                        strip[j, 0] += prod_v[:, y * tn : (y + 1) * tn]
                        strip[j, 1] += prod_o[:, y * tn : (y + 1) * tn]
                return 0

            jax.lax.fori_loop(0, n_a, t_body, 0)

            # stage the row's C tiles and write them with one DMA.
            # The DMA covers max_crow tiles; slots past n_c carry garbage
            # that lands in later rows' output range and is overwritten
            # when those rows execute (grid programs are sequential), and
            # c_ref is padded by max_crow tiles at the end.
            def stage_body(s, _):
                outbuf[r, s] = strip[ccol_ref[c_lo + s]]
                return 0

            jax.lax.fori_loop(0, n_c, stage_body, 0)

            @pl.when(n_c > 0)
            def _():
                pltpu.make_async_copy(
                    outbuf.at[r],
                    c_ref.at[pl.ds(c_lo, max_crow)],
                    out_sem.at[r],
                ).start()
            return 0

        jax.lax.fori_loop(0, jnp.maximum(row_end - i0, 0), row_body, 0)

        # drain output DMAs before the next program reuses outbuf
        def drain(r, _):
            i = i0 + r
            c_lo = ctptr_ref[i]
            n_c = ctptr_ref[i + 1] - c_lo

            @pl.when(n_c > 0)
            def _():
                pltpu.make_async_copy(
                    outbuf.at[r],
                    c_ref.at[pl.ds(c_lo, max_crow)],
                    out_sem.at[r],
                ).wait()
            return 0

        jax.lax.fori_loop(0, jnp.maximum(row_end - i0, 0), drain, 0)

    return kernel


def gustavson_strip_pallas(
    a_packed: jax.Array,   # (ntA_pad, 2, tm, tk)
    b_packed: jax.Array,   # (gk, 2, tk, max_b*tn)
    aptr: jax.Array,       # (gm+1,)
    ak: jax.Array,         # (ntA_pad,)
    cnt_b: jax.Array,      # (gk,)
    jpos: jax.Array,       # (gk*max_b,)
    c_tptr: jax.Array,     # (gm+1,)
    c_cols: jax.Array,     # (ntC_pad,)
    *,
    gm: int,
    gn_c: int,
    nt_c: int,
    max_b: int,
    max_ablock: int,
    max_crow: int,
    block_rows: int = 16,
    acc_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Returns packed C accumulators (nt_c + max_crow, 2, tm, tn): plane 0
    = values, plane 1 = structural counts; the trailing max_crow tiles are
    write-spill padding (callers slice [:nt_c])."""
    _, _, tm, tk = a_packed.shape
    tn = b_packed.shape[3] // max_b
    n_blocks = -(-gm // block_rows)

    kernel = _strip_kernel_factory(
        tm, tk, tn, max_b, max_ablock, max_crow, gn_c, block_rows, gm
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((gn_c, 2, tm, tn), acc_dtype),
            pltpu.VMEM((max_ablock, 2, tm, tk), acc_dtype),
            pltpu.VMEM((B_CACHE_SLOTS, 2, tk, max_b * tn), acc_dtype),
            pltpu.VMEM((block_rows, max_crow, 2, tm, tn), acc_dtype),
            pltpu.SMEM((B_CACHE_SLOTS,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((B_CACHE_SLOTS,)),
            pltpu.SemaphoreType.DMA((block_rows,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt_c + max_crow, 2, tm, tn), acc_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(aptr, ak, cnt_b, jpos, c_tptr, c_cols, a_packed, b_packed)
