"""Checkpoint / resume round trips (spgemm_tpu/io/checkpoint.py)."""

import numpy as np
import pytest

from spgemm_tpu.io import checkpoint
from spgemm_tpu.models.csr import CSR
from spgemm_tpu.models.tile import csr_to_tiles, tiles_to_csr


def test_csr_roundtrip(make_random_csr, tmp_path):
    a = make_random_csr(50, 70, 0.08)
    p = tmp_path / "a.npz"
    checkpoint.save(p, a)
    b = checkpoint.load(p)
    assert isinstance(b, CSR)
    assert b.shape == a.shape
    np.testing.assert_array_equal(b.indptr, a.indptr)
    np.testing.assert_array_equal(b.indices, a.indices)
    np.testing.assert_array_equal(b.data, a.data)


def test_tilemat_roundtrip(make_random_csr, tmp_path):
    a = make_random_csr(64, 48, 0.1)
    at = csr_to_tiles(a, 8, 16)
    p = tmp_path / "at.npz"
    checkpoint.save(p, at)
    bt = checkpoint.load(p)
    assert (bt.shape, bt.tm, bt.tn) == (at.shape, at.tm, at.tn)
    got = tiles_to_csr(bt)
    ref = tiles_to_csr(at)
    assert got.pattern_equal(ref)
    np.testing.assert_array_equal(got.data, ref.data)


def test_rejects_unknown_type(tmp_path):
    with pytest.raises(TypeError):
        checkpoint.save(tmp_path / "x.npz", {"not": "a matrix"})


def test_suite_resume_skips_done(tmp_path):
    import sys
    sys.path.insert(0, "tools")
    import run_suite

    out = tmp_path / "out"
    rc = run_suite.main(["--outdir", str(out), "--quick", "--n", "512",
                         "--only", "banded",
                         "--checkpoint-dir", str(tmp_path / "ck")])
    assert rc == 0
    summary = out / "suite_summary.csv"
    n_rows = len(summary.read_text().strip().splitlines())
    # resume run adds nothing
    rc = run_suite.main(["--outdir", str(out), "--quick", "--n", "512",
                         "--only", "banded", "--resume",
                         "--checkpoint-dir", str(tmp_path / "ck")])
    assert rc == 0
    assert len(summary.read_text().strip().splitlines()) == n_rows
