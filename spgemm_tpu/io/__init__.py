"""Matrix I/O (Matrix Market)."""

from spgemm_tpu.io.mmio import read_mtx, write_mtx

__all__ = ["read_mtx", "write_mtx"]
