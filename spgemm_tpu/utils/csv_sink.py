"""CSV result sinks, mirroring the reference's four appended CSVs
(`src/main.cu:283-320`): results, step runtimes, memory cost,
preprocessing."""

from __future__ import annotations

import csv
import os


def append_row(path: str, header: list[str], row: list) -> None:
    """Append one row, writing the header if the file is new."""
    exists = os.path.exists(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(header)
        w.writerow(row)


RESULTS_HEADER = [
    "matrix", "m", "n", "nnzA", "tile_m", "tile_n", "nnzC", "compression",
    "runtime_ms", "gflops", "backend", "dtype",
]
STEP_HEADER = [
    "matrix", "m", "n", "nnzA", "tile_m", "tile_n",
    "symbolic_ms", "upload_ms", "numeric_ms", "compact_ms",
]
MEM_HEADER = [
    "matrix", "m", "n", "nnzA", "tile_m", "tile_n", "csr_mb", "tile_mb",
]
PREPROC_HEADER = [
    "matrix", "m", "n", "nnzA", "tile_m", "tile_n", "convert_ms",
]
