"""Converter unit tests against the generated 36x36 fixture families
(the analogue of the reference's UnitTest/CSR2TILE golden-bitmask checks,
scripted instead of eyeballed)."""

import glob
import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixtures():
    return sorted(glob.glob(os.path.join(FIXDIR, "*.mtx")))


@pytest.fixture(scope="module", autouse=True)
def ensure_fixtures():
    if not _fixtures():
        import subprocess
        import sys

        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "..", "tools",
                          "generate_fixtures.py"), FIXDIR],
            check=True,
        )


@pytest.mark.parametrize("tm,tn", [(16, 16), (12, 36), (36, 36), (16, 32)])
def test_fixture_masks_against_golden(tm, tn):
    from spgemm_tpu.io.mmio import read_mtx
    from spgemm_tpu.models.tile import csr_to_tiles

    for path in _fixtures():
        csr, _ = read_mtx(path)
        golden_path = path.replace(".mtx", ".bitmask")
        with open(golden_path) as f:
            lines = [l for l in f if not l.startswith("#")]
        golden = np.array(
            [[int(w, 16) for w in line.split()] for line in lines],
            dtype=np.uint32,
        )
        t = csr_to_tiles(csr, tm, tn)
        occ = t.occ()
        # reassemble whole-matrix occupancy from per-tile masks
        got = np.zeros((t.gm * t.tm, t.gn * t.tn), dtype=np.uint8)
        for i in range(t.nt):
            r0, c0 = t.trow[i] * tm, t.tcol[i] * tn
            got[r0 : r0 + tm, c0 : c0 + tn] |= occ[i]
        got = got[: csr.m, : csr.n]
        # golden bitmask -> dense occupancy
        shifts = np.arange(32, dtype=np.uint32)
        bits = ((golden[:, :, None] >> shifts) & 1).reshape(csr.m, -1)
        np.testing.assert_array_equal(got, bits[:, : csr.n], err_msg=path)


def test_fixture_roundtrip_and_spgemm():
    from spgemm_tpu.io.mmio import read_mtx
    from spgemm_tpu.models.tile import csr_to_tiles, tiles_to_csr
    from spgemm_tpu.ops import golden as g
    from spgemm_tpu.ops.spgemm import spgemm_csr

    for path in _fixtures():
        csr, _ = read_mtx(path)
        assert csr.allclose(tiles_to_csr(csr_to_tiles(csr, 16, 16)))
        c, _ = spgemm_csr(csr, tm=12, tn=36)
        ref = g.spgemm_dense_row(csr, csr)
        assert c.pattern_equal(ref), path
        np.testing.assert_allclose(c.data, ref.data, rtol=1e-5)
