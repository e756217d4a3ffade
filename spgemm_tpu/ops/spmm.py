"""SpMV / SpMM on the tiled sparse format: Y = A @ X with dense X.

The reference has no SpMV/SpMM, but the north-star spec extends the tile
structure to dense right-hand sides (batched k = 32/128), reusing the
tile-product machinery (BASELINE.json configs[3]).

TPU-native formulation: X is viewed as (gn, tn, k) row-blocks; each
stored A tile contributes one (tm, tn) x (tn, k) MXU matmul, and tile-rows
reduce with a scatter-add over at most gm segments:

    Y[trow] += A_dense[t] @ X_blocks[tcol[t]]

This is one batched gather + batched matmul + segment reduction — all
MXU/VPU work, no per-nonzero control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spgemm_tpu.models.tile import TileMat


@functools.partial(jax.jit, static_argnames=("gm", "chunk"))
def _spmm_tiles(
    a_dense: jax.Array,   # (nt, tm, tn)
    trow: jax.Array,      # (nt,) int32, sorted ascending
    tcol: jax.Array,      # (nt,) int32
    xb: jax.Array,        # (gn, tn, k)
    *,
    gm: int,
    chunk: int = 65536,
) -> jax.Array:
    nt, tm, _ = a_dense.shape
    k = xb.shape[2]
    y = jnp.zeros((gm, tm, k), dtype=a_dense.dtype)
    if nt == 0:
        return y

    def accum(y, ad, tr, tc):
        prod = jax.lax.dot_general(
            ad,
            xb[tc],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=a_dense.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return y.at[tr].add(prod, indices_are_sorted=True)

    if nt <= chunk:
        return accum(y, a_dense, trow, tcol)

    # chunked accumulation for very large tile counts
    n_full = (nt // chunk) * chunk

    def body(carry, xs):
        ad, tr, tc = xs
        return accum(carry, ad, tr, tc), None

    y, _ = jax.lax.scan(
        body,
        y,
        (
            a_dense[:n_full].reshape(-1, chunk, tm, a_dense.shape[2]),
            trow[:n_full].reshape(-1, chunk),
            tcol[:n_full].reshape(-1, chunk),
        ),
    )
    if n_full < nt:
        y = accum(y, a_dense[n_full:], trow[n_full:], tcol[n_full:])
    return y


def spmm(a: TileMat, x, *, dtype=jnp.float32) -> jax.Array:
    """Y = A @ X. x: (n, k) or (n,) array-like. Returns (m, k) / (m,)."""
    x = np.asarray(x)
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
    if x.shape[0] != a.n:
        raise ValueError(f"shape mismatch: A is {a.shape}, X is {x.shape}")
    k = x.shape[1]
    pad = a.gn * a.tn - a.n
    xb = np.pad(x, ((0, pad), (0, 0))).reshape(a.gn, a.tn, k)
    y = _spmm_tiles(
        jnp.asarray(a.dense(), dtype=dtype),
        jnp.asarray(a.trow),
        jnp.asarray(a.tcol),
        jnp.asarray(xb, dtype=dtype),
        gm=a.gm,
    )
    y = y.reshape(a.gm * a.tm, k)[: a.m]
    return y[:, 0] if vec else y


def spmv(a: TileMat, x, *, dtype=jnp.float32) -> jax.Array:
    """y = A @ x for a 1-D x (SpMV), via the SpMM path."""
    return spmm(a, x, dtype=dtype)
