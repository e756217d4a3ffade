#!/usr/bin/env python
"""Deterministic converter test fixtures: the five 36x36 pattern families
of the reference's `UnitTest/CSR2TILE/generate_matrix.py` (diagonal,
tridiagonal, banded, random at three densities, symmetric-sparse), each
written as .mtx plus a golden per-row bitmask file in this framework's
convention (uint32 words, LSB = lowest column; the reference's
`show_bitmask.py` uses MSB-first uint64 — convention differs, semantics
are checked, see models/tile.py docstring).

Usage: python tools/generate_fixtures.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spgemm_tpu.io.mmio import write_mtx
from spgemm_tpu.models.csr import CSR

N = 36


def diagonal(rng):
    d = np.zeros((N, N))
    np.fill_diagonal(d, rng.uniform(1, 10, N))
    return d


def tridiagonal(rng):
    d = diagonal(rng)
    idx = np.arange(N - 1)
    d[idx, idx + 1] = rng.uniform(0.1, 2, N - 1)
    d[idx + 1, idx] = rng.uniform(0.1, 2, N - 1)
    return d


def banded(rng, bw=5):
    d = np.zeros((N, N))
    for k in range(-bw, bw + 1):
        idx = np.arange(max(0, -k), min(N, N - k))
        vals = rng.uniform(0.1, 2, idx.size)
        if k == 0:
            vals = rng.uniform(1, 10, idx.size)
        d[idx, idx + k] = vals
    return d


def random_density(rng, density):
    d = np.zeros((N, N))
    mask = rng.random((N, N)) < density
    d[mask] = rng.uniform(0.1, 10, mask.sum())
    np.fill_diagonal(d, rng.uniform(1, 10, N))
    return d


def symmetric_sparse(rng, density=0.05):
    d = random_density(rng, density)
    d = np.triu(d)
    return d + np.triu(d, 1).T


FAMILIES = {
    "diagonal_36x36": diagonal,
    "tridiagonal_36x36": tridiagonal,
    "banded_36x36": banded,
    "random_0.05_36x36": lambda rng: random_density(rng, 0.05),
    "random_0.1_36x36": lambda rng: random_density(rng, 0.10),
    "random_0.15_36x36": lambda rng: random_density(rng, 0.15),
    "sparse_symmetric_36x36": symmetric_sparse,
}


def row_bitmask_words(dense: np.ndarray) -> np.ndarray:
    """Whole-matrix per-row occupancy as uint32 words, LSB-first."""
    n = dense.shape[1]
    mw = -(-n // 32)
    words = np.zeros((dense.shape[0], mw), dtype=np.uint32)
    rows, cols = np.nonzero(dense)
    np.bitwise_or.at(
        words, (rows, cols // 32), np.uint32(1) << (cols % 32).astype(np.uint32)
    )
    return words


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    for name, fn in FAMILIES.items():
        dense = fn(rng)
        csr = CSR.from_dense(dense)
        write_mtx(os.path.join(outdir, name + ".mtx"), csr,
                  comment=f"{name} fixture (seed 42)")
        words = row_bitmask_words(dense)
        with open(os.path.join(outdir, name + ".bitmask"), "w") as f:
            f.write("# uint32 words per row, LSB = column 0\n")
            for r in range(words.shape[0]):
                f.write(" ".join(f"{w:08x}" for w in words[r]) + "\n")
        print(f"{name}: nnz={csr.nnz}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), "tests", "fixtures"))
