"""Pallas kernel tests (interpret mode on the CPU test platform)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_tpu.models.tile import csr_to_tiles
from spgemm_tpu.ops import golden
from spgemm_tpu.ops.spgemm import spgemm, spgemm_csr


def test_pallas_backend_matches_xla(make_random_csr):
    a = make_random_csr(120, 120, 0.04)
    c_x, _ = spgemm_csr(a, backend="xla")
    c_p, _ = spgemm_csr(a, backend="pallas")
    assert c_x.pattern_equal(c_p)
    np.testing.assert_allclose(c_x.data, c_p.data, rtol=1e-6)


def test_pallas_vs_oracle(make_random_csr):
    a = make_random_csr(90, 70, 0.06)
    b = make_random_csr(70, 110, 0.06)
    c, _ = spgemm_csr(a, b, backend="pallas")
    ref = golden.spgemm_dense_row(a, b)
    assert c.pattern_equal(ref)
    np.testing.assert_allclose(c.data, ref.data, rtol=1e-6)


def test_pallas_empty_segments(make_random_csr):
    # C tiles whose pair list produces no products must come out zero
    from spgemm_tpu.models.csr import CSR

    a = CSR.from_coo([0], [0], [1.0], (4, 4))
    b = CSR.from_coo([1], [1], [1.0], (4, 4))
    at, bt = csr_to_tiles(a, 2, 2), csr_to_tiles(b, 2, 2)
    res = spgemm(at, bt, backend="pallas")
    assert res.c.nt == 0


def test_pallas_rejects_fp64(make_random_csr):
    a = make_random_csr(32, 32, 0.1)
    with pytest.raises(ValueError, match="float64"):
        spgemm_csr(a, backend="pallas", compute_dtype=jnp.float64)


def test_strip_backend_matches_oracle(make_random_csr):
    a = make_random_csr(150, 150, 0.04)
    c_s, res = spgemm_csr(a, backend="strip")
    ref = golden.spgemm_dense_row(a, a)
    assert c_s.pattern_equal(ref)
    np.testing.assert_allclose(c_s.data, ref.data, rtol=1e-6)


def test_strip_backend_rectangular(make_random_csr):
    a = make_random_csr(100, 70, 0.06)
    b = make_random_csr(70, 120, 0.06)
    c_s, _ = spgemm_csr(a, b, backend="strip", tm=16, tn=16)
    ref = golden.spgemm_dense_row(a, b)
    assert c_s.pattern_equal(ref)
    np.testing.assert_allclose(c_s.data, ref.data, rtol=1e-6)


def test_strip_backend_cancellation():
    from spgemm_tpu.models.csr import CSR
    from spgemm_tpu.ops.spgemm import spgemm

    a = CSR.from_dense(np.array([[1.0, -1.0], [0.0, 2.0]]))
    b = CSR.from_dense(np.array([[1.0, 0.0], [1.0, 0.0]]))
    at, bt = csr_to_tiles(a, 2, 2), csr_to_tiles(b, 2, 2)
    res = spgemm(at, bt, backend="strip")
    ref = golden.spgemm_dense_row(a, b)
    got = res.c.to_csr()
    assert got.pattern_equal(ref)
    np.testing.assert_allclose(got.data, ref.data)


def test_strip_multiblock_interpret(make_random_csr):
    """Force many grid blocks (block_rows=2) so the double-buffered A
    prefetch / C writeback and block-local slot logic are exercised."""
    from spgemm_tpu.ops.gustavson import build_strip_args, strip_numeric
    from spgemm_tpu.ops.spgemm import _compact_to_tilemat

    a = make_random_csr(96, 96, 0.08)
    at = csr_to_tiles(a, 8, 16)
    bt = csr_to_tiles(a, 16, 16)
    sargs = build_strip_args(at, bt, block_rows=2)
    assert sargs.gm > 2 * 2  # really multi-block
    c_val, c_cnt = strip_numeric(sargs, interpret=True)
    c = _compact_to_tilemat(sargs.ctrow, sargs.ctcol, c_val, c_cnt,
                            (96, 96), 8, 16)
    ref = golden.spgemm_dense_row(a, a)
    got = c.to_csr()
    assert got.pattern_equal(ref)
    np.testing.assert_allclose(got.data, ref.data, rtol=1e-5)


def test_native_symbolic_matches_numpy(make_random_csr):
    from spgemm_tpu.ops.gustavson import _numpy_strip_symbolic
    from spgemm_tpu.utils.native import gustavson_symbolic_native

    a = make_random_csr(128, 128, 0.06)
    at = csr_to_tiles(a, 8, 16)
    bt = csr_to_tiles(a, 16, 16)
    cnt_b = np.diff(bt.tptr)
    max_b = max(1, int(cnt_b.max()))
    nat = gustavson_symbolic_native(at, bt, 4, max_b, at.nt + 7)
    if nat is None:
        pytest.skip("native library unavailable")
    ref = _numpy_strip_symbolic(at, bt, 4, max_b, 7)
    for got, exp, name in zip(nat, ref, ("c_tptr", "ctrow", "ctcol",
                                         "slots", "gather_idx",
                                         "max_cblock", "nt_c")):
        np.testing.assert_array_equal(got, exp, err_msg=name)


def test_strip_windowed_mode(make_random_csr):
    """Force the windowed-B kernel variant on a banded matrix and check
    against the cached variant + golden."""
    from spgemm_tpu.models.csr import CSR
    from spgemm_tpu.ops.gustavson import build_strip_args, strip_numeric
    from spgemm_tpu.ops.spgemm import _compact_to_tilemat

    n = 96
    offs = np.arange(-3, 4)
    r = np.repeat(np.arange(n), offs.size)
    c = r + np.tile(offs, n)
    keep = (c >= 0) & (c < n)
    a = CSR.from_coo(r[keep], c[keep],
                     (r[keep] % 7 + 1).astype(np.float64), (n, n))
    at = csr_to_tiles(a, 8, 16)
    bt = csr_to_tiles(a, 16, 16)

    sw = build_strip_args(at, bt, block_rows=2, window=True)
    assert sw.kwin is not None
    cv, cc = strip_numeric(sw, interpret=True)
    cw = _compact_to_tilemat(sw.ctrow, sw.ctcol, cv, cc, (n, n), 8, 16)

    ref = golden.spgemm_dense_row(a, a)
    got = cw.to_csr()
    assert got.pattern_equal(ref)
    np.testing.assert_allclose(got.data, ref.data, rtol=1e-5)
