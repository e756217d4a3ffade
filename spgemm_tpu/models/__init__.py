"""Data model: sparse matrix containers (CSR, tiled format)."""

from spgemm_tpu.models.csr import CSR
from spgemm_tpu.models.tile import TileMat, csr_to_tiles, tiles_to_csr

__all__ = ["CSR", "TileMat", "csr_to_tiles", "tiles_to_csr"]
