"""CLI driver tests (run on the forced-CPU test platform)."""

import os

import numpy as np
import pytest

from spgemm_tpu.cli import main
from spgemm_tpu.io.mmio import write_mtx


@pytest.fixture
def mtx_file(tmp_path, make_random_csr):
    a = make_random_csr(80, 80, 0.05)
    p = tmp_path / "a.mtx"
    write_mtx(p, a)
    return str(p)


def test_cli_a_squared(mtx_file, capsys):
    rc = main([mtx_file, "16", "16", "--backend", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "[PASSED]" in out
    assert "GFLOPS" in out
    assert "nnzCub" in out


def test_cli_aat(tmp_path, make_random_csr, capsys):
    a = make_random_csr(60, 40, 0.08)
    p = tmp_path / "r.mtx"
    write_mtx(p, a)
    rc = main(["-aat", "1", str(p), "16", "16"])
    assert rc == 0
    assert "[PASSED]" in capsys.readouterr().out


def test_cli_rejects_nonsquare_a2(tmp_path, make_random_csr, capsys):
    a = make_random_csr(60, 40, 0.08)
    p = tmp_path / "r.mtx"
    write_mtx(p, a)
    rc = main([str(p)])
    assert rc == 2


def test_cli_csv_sinks(mtx_file, tmp_path, capsys):
    d = str(tmp_path / "csv")
    rc = main([mtx_file, "16", "16", "--csv-dir", d])
    assert rc == 0
    for f in ["results_tile.csv", "step_runtime.csv", "mem-cost.csv",
              "preprocessing.csv"]:
        path = os.path.join(d, f)
        assert os.path.exists(path)
        lines = open(path).read().strip().splitlines()
        assert len(lines) == 2  # header + one row
    # second run appends without duplicate header
    main([mtx_file, "16", "16", "--csv-dir", d])
    lines = open(os.path.join(d, "results_tile.csv")).read().strip().splitlines()
    assert len(lines) == 3


def test_cli_synthetic_values(mtx_file, capsys):
    rc = main([mtx_file, "16", "16", "--synthetic-values"])
    assert rc == 0
    assert "[PASSED]" in capsys.readouterr().out


def test_cli_backends(mtx_file, capsys):
    for backend in ["strip", "gustavson", "xla"]:
        rc = main([mtx_file, "16", "16", "--backend", backend])
        assert rc == 0, backend
        assert "[PASSED]" in capsys.readouterr().out


def test_cli_f64_ozaki(mtx_file, capsys):
    """--dtype f64 --backend ozaki: exact-f64 engine through the CLI
    (no x64 flag flipped; tile sizes 16x128 for the slab layout)."""
    rc = main([mtx_file, "16", "128", "--dtype", "f64",
               "--backend", "ozaki"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "[PASSED]" in out
