"""Cross-backend fuzz: random shapes, tile sizes, and densities — every
backend must agree with the scipy oracle (pattern AND values)."""

import numpy as np
import pytest

from spgemm_tpu.models.csr import CSR
from spgemm_tpu.models.tile import csr_to_tiles
from spgemm_tpu.ops import golden
from spgemm_tpu.ops.spgemm import spgemm

CASES = [
    # (m, k, n, density, tm, tn, seed)
    (64, 64, 64, 0.10, 8, 8, 0),
    (100, 50, 80, 0.08, 16, 16, 1),
    (33, 77, 55, 0.15, 8, 16, 2),
    (128, 128, 128, 0.02, 16, 32, 3),
    (200, 40, 200, 0.05, 8, 8, 4),
    (90, 90, 90, 0.30, 16, 16, 5),   # dense-ish
    (70, 130, 20, 0.07, 32, 16, 6),
]
BACKENDS = ["strip", "gustavson", "dense", "xla"]


@pytest.mark.parametrize("case", CASES, ids=[f"c{c[-1]}" for c in CASES])
@pytest.mark.parametrize("backend", BACKENDS)
def test_fuzz_backend_vs_oracle(case, backend):
    m, k, n, density, tm, tn, seed = case
    rng = np.random.default_rng(seed)
    nnz_a = max(1, int(m * k * density))
    nnz_b = max(1, int(k * n * density))
    a = CSR.from_coo(rng.integers(0, m, nnz_a), rng.integers(0, k, nnz_a),
                     rng.integers(-4, 5, nnz_a).astype(np.float64), (m, k))
    b = CSR.from_coo(rng.integers(0, k, nnz_b), rng.integers(0, n, nnz_b),
                     rng.integers(-4, 5, nnz_b).astype(np.float64), (k, n))
    at = csr_to_tiles(a, tm, tn)
    bt = csr_to_tiles(b, tn, tn)
    res = spgemm(at, bt, backend=backend)
    ref = golden.spgemm_scipy(a, b)
    got = golden.drop_explicit_zeros(res.c.to_csr())
    assert got.pattern_equal(ref), f"{backend} pattern mismatch on {case}"
    np.testing.assert_allclose(got.data, ref.data, rtol=1e-5, atol=1e-8,
                               err_msg=f"{backend} values on {case}")


def _check_auto(a):
    at = csr_to_tiles(a, 16, 16)
    bt = csr_to_tiles(a, 16, 16)
    res = spgemm(at, bt, backend="auto")
    ref = golden.spgemm_scipy(a, a)
    got = golden.drop_explicit_zeros(res.c.to_csr())
    assert got.allclose(ref, rtol=1e-5)


def test_adversarial_holey_band():
    """Empty block ranges in the middle of the matrix (windowed-B kmin
    defaults for empty blocks)."""
    rng = np.random.default_rng(3)
    n = 400
    offs = np.arange(-5, 6)
    r = np.repeat(np.arange(n), offs.size)
    c = r + np.tile(offs, n)
    keep = (c >= 0) & (c < n) & ~((r > n * 0.3) & (r < n * 0.6))
    _check_auto(CSR.from_coo(
        r[keep], c[keep],
        rng.integers(1, 9, keep.sum()).astype(float), (n, n)))


def test_adversarial_antidiagonal():
    """k decreasing with row — stresses per-block k-window minima."""
    rng = np.random.default_rng(4)
    n = 300
    r = np.repeat(np.arange(n), 5)
    c = (n - 1 - r) + np.tile(np.arange(-2, 3), n)
    m = (c >= 0) & (c < n)
    _check_auto(CSR.from_coo(
        r[m], c[m], rng.integers(1, 9, m.sum()).astype(float), (n, n)))


@pytest.mark.parametrize("case", CASES, ids=[f"c{c[-1]}" for c in CASES])
def test_fuzz_ozaki_vs_oracle(case):
    """Ozaki f64 engine on random shapes/patterns with general f64
    values (gaussian x pow2 spread) — exact vs scipy within f64 eps
    class. Tile sizes fixed at the slab layout's (16, 128)."""
    m, k, n, density, _tm, _tn, seed = case
    rng = np.random.default_rng(1000 + seed)
    nnz_a = max(1, int(m * k * density))
    nnz_b = max(1, int(k * n * density))

    def vals(c):
        return rng.standard_normal(c) * np.exp2(
            rng.integers(-8, 9, c).astype(np.float64))

    a = CSR.from_coo(rng.integers(0, m, nnz_a), rng.integers(0, k, nnz_a),
                     vals(nnz_a), (m, k))
    b = CSR.from_coo(rng.integers(0, k, nnz_b), rng.integers(0, n, nnz_b),
                     vals(nnz_b), (k, n))
    at = csr_to_tiles(a, 16, 128)
    bt = csr_to_tiles(b, 128, 128)
    res = spgemm(at, bt, backend="ozaki")
    ref = golden.spgemm_scipy(a, b)
    got = golden.drop_explicit_zeros(res.c.to_csr())
    assert got.pattern_equal(ref), f"ozaki pattern mismatch on {case}"
    scale = max(np.abs(ref.data).max() if ref.nnz else 1.0, 1e-300)
    assert np.abs(got.data - ref.data).max() <= 1e-14 * scale, \
        f"ozaki values on {case}"
