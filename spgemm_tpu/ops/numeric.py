"""Numeric phase: batched tile-pair products on the MXU (jitted XLA path).

Replaces the reference's steps 2/3 (per-tile symbolic mask-OR,
`src/tilespgemm-cuda.h:394-1271`) and step 4 (numeric accumulation with
sparse/dense accumulators and 5 size-binned kernels on 5 streams,
`src/tilespgemm-cuda.h:1273-2218,2649-2728`).

TPU-native reformulation: every matched tile pair is one small dense
matmul. The pipeline gathers dense A/B tiles by pair index, runs a batched
(chunked) einsum on the MXU, and scatter-adds into per-C-tile dense
accumulators — values and structural counts in the same pass:

    Cval[seg]  += Aden[pa] @ Bden[pb]          (numeric)
    Ccnt[seg]  += Aocc[pa] @ Bocc[pb]          (structural, step-2/3 analog)

Structural occupancy is an *integer-valued* matmul (counts of contributing
products), so C's pattern is exact even when numeric sums cancel or stored
values are zero — this replaces the bitmask-OR + popcount symbolic step
with the MXU op the hardware actually likes. There is no sparse
accumulator, no binary search, no atomics: each C tile's accumulator is
private to its segment (the reference fork's shared-scratch race,
SURVEY.md section 2.3, is impossible by construction).

All shapes are static: pair lists are padded to a chunk multiple, padding
pairs target a dummy trailing segment that is sliced off. fp32 is the
default compute type (exact for the reference's synthetic integer values);
fp64 is supported end-to-end for accuracy-critical runs (XLA emulates it
on TPU; fast on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MASK_BITS = 32


def unpack_mask(mask: jax.Array, tn: int) -> jax.Array:
    """(nt, tm, mw) uint32 bitmask words -> (nt, tm, tn) float32 occupancy.

    VPU shift-and-mask bit unpack; the device-side inverse of
    TileMat.occ().
    """
    nt, tm, mw = mask.shape
    shifts = jnp.arange(MASK_BITS, dtype=jnp.uint32)
    bits = (mask[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(nt, tm, mw * MASK_BITS)[..., :tn].astype(jnp.float32)


def pack_mask(occ: jax.Array, tn: int) -> jax.Array:
    """(nt, tm, tn) bool/int occupancy -> (nt, tm, mw) uint32 mask words."""
    nt, tm, _ = occ.shape
    mw = -(-tn // MASK_BITS)
    pad = mw * MASK_BITS - tn
    occ_p = jnp.pad(occ.astype(jnp.uint32), ((0, 0), (0, 0), (0, pad)))
    occ_p = occ_p.reshape(nt, tm, mw, MASK_BITS)
    shifts = jnp.arange(MASK_BITS, dtype=jnp.uint32)
    return jnp.sum(occ_p << shifts, axis=-1, dtype=jnp.uint32)


def _pair_matmuls(a_val, a_occ, b_val, b_occ, acc_dtype):
    """Batched per-pair products: values and structural counts.

    Precision.HIGHEST: TPU MXU default precision multiplies f32 inputs in
    bf16, which loses ~3 decimal digits — unacceptable for a numerics
    library. HIGHEST selects the f32-equivalent multi-pass path.
    """
    prod = jax.lax.dot_general(
        a_val,
        b_val,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    cnt = jax.lax.dot_general(
        a_occ,
        b_occ,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return prod, cnt


@functools.partial(
    jax.jit, static_argnames=("num_segments", "chunk", "acc_dtype")
)
def pair_accumulate(
    a_val: jax.Array,   # (ntA, tm, tk) dense A tiles
    a_occ: jax.Array,   # (ntA, tm, tk) float32 0/1 occupancy
    b_val: jax.Array,   # (ntB, tk, tn)
    b_occ: jax.Array,   # (ntB, tk, tn) float32 0/1
    pa: jax.Array,      # (P,) int32, padded; padding -> segment num_segments
    pb: jax.Array,      # (P,) int32
    seg: jax.Array,     # (P,) int32, sorted ascending
    *,
    num_segments: int,
    chunk: int = 32768,
    acc_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Returns (c_val, c_cnt): (num_segments, tm, tn) accumulators.

    Chunked with lax.scan so gathered pair blocks never exceed
    chunk * tile_bytes of HBM, regardless of pair-list length.
    """
    tm = a_val.shape[1]
    tn = b_val.shape[2]
    p = pa.shape[0]
    c_val = jnp.zeros((num_segments + 1, tm, tn), dtype=acc_dtype)
    c_cnt = jnp.zeros((num_segments + 1, tm, tn), dtype=jnp.float32)

    if p == 0:
        return c_val[:-1], c_cnt[:-1]

    if p <= chunk:
        prod, cnt = _pair_matmuls(
            a_val[pa], a_occ[pa], b_val[pb], b_occ[pb], acc_dtype
        )
        c_val = c_val.at[seg].add(prod, indices_are_sorted=True)
        c_cnt = c_cnt.at[seg].add(cnt, indices_are_sorted=True)
        return c_val[:-1], c_cnt[:-1]

    assert p % chunk == 0, "caller pads pair arrays to a chunk multiple"
    n_chunks = p // chunk
    pa_c = pa.reshape(n_chunks, chunk)
    pb_c = pb.reshape(n_chunks, chunk)
    seg_c = seg.reshape(n_chunks, chunk)

    def body(carry, xs):
        cv, cc = carry
        pac, pbc, segc = xs
        prod, cnt = _pair_matmuls(
            a_val[pac], a_occ[pac], b_val[pbc], b_occ[pbc], acc_dtype
        )
        cv = cv.at[segc].add(prod, indices_are_sorted=True)
        cc = cc.at[segc].add(cnt, indices_are_sorted=True)
        return (cv, cc), None

    (c_val, c_cnt), _ = jax.lax.scan(
        body, (c_val, c_cnt), (pa_c, pb_c, seg_c)
    )
    return c_val[:-1], c_cnt[:-1]


def pad_pairs(
    pa: np.ndarray, pb: np.ndarray, seg: np.ndarray, num_segments: int,
    chunk: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad pair arrays to a chunk multiple; padding pairs point at tile 0
    and the dummy segment `num_segments` (dropped by pair_accumulate)."""
    p = pa.size
    if p <= chunk or p % chunk == 0:
        return pa, pb, seg  # single-shot path / already aligned
    padn = -(-p // chunk) * chunk - p
    pad32 = lambda x, v: np.concatenate([x, np.full(padn, v, dtype=np.int32)])
    return pad32(pa, 0), pad32(pb, 0), pad32(seg, num_segments)
