"""Per-kernel speed-of-light roofline accounting.

The north-star spec asks for roofline accounting per kernel
(BASELINE.json). For the tile-pair numeric step:

  useful FLOPs      = 2 * nnzCub                  (the reference's GFLOPS base)
  executed FLOPs    = 2 * num_pairs * tm * tk * tn  (x2 with the occupancy
                      matmul fused in)
  bytes (min)       = pair-streamed A+B tiles + C tiles written once

Speed-of-light time = max(flops/peak_flops, bytes/peak_bw). Peaks default
to TPU v5e single-chip specs and can be overridden.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ChipSpec:
    name: str
    peak_flops_f32: float   # FLOP/s
    peak_hbm_bw: float      # bytes/s

    @staticmethod
    def v5e() -> "ChipSpec":
        # v5e: 197 TFLOPs bf16, ~half for f32 MXU passes; HBM ~819 GB/s
        return ChipSpec("tpu-v5e", 98.5e12, 819e9)

    @staticmethod
    def v5p() -> "ChipSpec":
        return ChipSpec("tpu-v5p", 229.5e12, 2765e9)


@dataclasses.dataclass
class RooflineReport:
    executed_flops: float
    useful_flops: float
    bytes_moved: float
    sol_time_ms: float        # speed-of-light
    attained_ms: float | None
    efficiency: float | None  # sol / attained

    def summary(self) -> str:
        s = (
            f"executed {self.executed_flops/1e9:.2f} GFLOP "
            f"(useful {self.useful_flops/1e9:.2f}), "
            f"{self.bytes_moved/1e6:.1f} MB, SoL {self.sol_time_ms:.3f} ms"
        )
        if self.attained_ms is not None:
            s += (
                f", attained {self.attained_ms:.3f} ms "
                f"({100*(self.efficiency or 0):.1f}% of SoL)"
            )
        return s


def numeric_step_roofline(
    num_pairs: int,
    tm: int,
    tk: int,
    tn: int,
    nnz_cub: int,
    nt_c: int,
    attained_ms: float | None = None,
    chip: ChipSpec | None = None,
    bytes_per_elem: int = 4,
    with_occupancy_pass: bool = True,
) -> RooflineReport:
    chip = chip or ChipSpec.v5e()
    mults = num_pairs * tm * tk * tn
    executed = 2.0 * mults * (2 if with_occupancy_pass else 1)
    useful = 2.0 * nnz_cub
    # minimum traffic: every pair streams one A and one B tile (x2 with
    # the packed occupancy plane), C written + read once per accumulation
    a_b_bytes = num_pairs * (tm * tk + tk * tn) * bytes_per_elem
    if with_occupancy_pass:
        a_b_bytes *= 2
    c_bytes = 2 * nt_c * tm * tn * bytes_per_elem * (
        2 if with_occupancy_pass else 1
    )
    total_bytes = a_b_bytes + c_bytes
    sol_s = max(executed / chip.peak_flops_f32, total_bytes / chip.peak_hbm_bw)
    eff = None
    if attained_ms is not None and attained_ms > 0:
        eff = (sol_s * 1e3) / attained_ms
    return RooflineReport(
        executed_flops=executed,
        useful_flops=useful,
        bytes_moved=total_bytes,
        sol_time_ms=sol_s * 1e3,
        attained_ms=attained_ms,
        efficiency=eff,
    )
