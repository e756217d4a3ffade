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
