#!/usr/bin/env python
"""Power iteration (dominant eigenvalue) driven by the framework's SpMV —
the classic iterative-solver pattern SpMM/SpMV kernels exist for. The
iteration state stays on device; only the final eigenvalue is fetched.

Usage: python examples/power_method.py [n] [band]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from spgemm_tpu.models.csr import CSR
from spgemm_tpu.models.tile import csr_to_tiles
from spgemm_tpu.ops.spmm import spmm


def banded_spd(n: int, band: int, seed: int = 0) -> CSR:
    rng = np.random.default_rng(seed)
    offs = np.arange(-band, band + 1)
    r = np.repeat(np.arange(n), offs.size)
    c = r + np.tile(offs, n)
    keep = (c >= 0) & (c < n)
    r, c = r[keep], c[keep]
    v = rng.standard_normal(r.size)
    v = np.where(r == c, np.abs(v) + band, 0.1 * v)  # diagonally dominant
    # symmetrize
    a = CSR.from_coo(np.concatenate([r, c]), np.concatenate([c, r]),
                     np.concatenate([v, v]) / 2, (n, n))
    return a


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    band = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    a = banded_spd(n, band)
    t = csr_to_tiles(a, 16, 128)
    print(f"A: {n}x{n}, nnz={a.nnz}")

    x = jnp.ones(n, jnp.float32) / np.sqrt(n)
    lam = 0.0
    for it in range(150):
        y = spmm(t, np.asarray(x))          # y = A x (Pallas SpMV)
        y = jnp.asarray(y)
        lam = float(jnp.vdot(x, y))
        x = y / jnp.linalg.norm(y)
    print(f"dominant eigenvalue (power iteration): {lam:.6f}")

    # dense reference for moderate n
    if n <= 8192:
        ref = float(np.linalg.eigvalsh(a.to_dense())[-1])
        print(f"dense reference: {ref:.6f}  "
              f"(rel err {abs(lam-ref)/abs(ref):.2e})")


if __name__ == "__main__":
    main()
