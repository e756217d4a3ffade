"""Device-resident SpGEMM executor: build once, run many.

`spgemm()` is stateless — every call re-uploads operands, which is the
right shape for one-shot use but wasteful for production serving loops
(iterative solvers, repeated C = A·B with changing values on a fixed
sparsity pattern). `StripExecutor` keeps the packed operands resident in
HBM and re-dispatches only the fused numeric kernel, the exact analogue
of the reference's REPEAT_NUM timing loop (`src/common.h:91`,
`src/tilespgemm-cuda.h:2352`) where the uploaded tiled matrices stay on
the GPU across repeats.

`update_values(a)` repacks and re-uploads only A's value plane for
workloads where the pattern is fixed and values change (the reference's
step-4-only re-run, `tilespgemm-cuda.h:2649-2728`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spgemm_tpu.models.tile import TileMat
from spgemm_tpu.ops.gustavson import StripArgs, build_strip_args


class StripExecutor:
    """Resident-operand executor for the strip backend."""

    def __init__(
        self,
        a: TileMat,
        b: TileMat,
        *,
        block_rows: int = 32,
        dtype=np.float32,
        acc_dtype=jnp.float32,
        interpret: bool | None = None,
    ):
        # structural identity of A (exact: pattern arrays kept by ref)
        self.a_struct = (a.tm, a.tn, a.trow, a.tcol, a.tnnz_ptr, a.rc)
        self.shape = (a.m, b.n)
        self.args: StripArgs = build_strip_args(
            a, b, block_rows=block_rows, dtype=dtype
        )
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        from spgemm_tpu.ops.gustavson import check_strip_feasible

        check_strip_feasible(self.args, interpret)
        self.acc_dtype = acc_dtype
        self._dev = jax.device_put(self.args.device_args())
        jax.block_until_ready(self._dev)

    @property
    def nt_c(self) -> int:
        return self.args.nt_c

    def run(self) -> tuple[jax.Array, jax.Array]:
        """One numeric dispatch. Returns (c_val, c_cnt) device arrays in
        the block-padded layout (see gustavson_strip_pallas)."""
        from spgemm_tpu.ops.pallas_kernels import gustavson_strip_pallas

        return gustavson_strip_pallas(
            *self._dev,
            **self.args.kernel_kwargs(),
            acc_dtype=self.acc_dtype,
            interpret=self.interpret,
        )

    def run_compact(self) -> TileMat:
        """run() + device-side compaction (candidate gather + packed
        occupancy, gustavson.download_compact) + TileMat assembly."""
        from spgemm_tpu.ops.gustavson import download_compact
        from spgemm_tpu.ops.spgemm import _compact_to_tilemat

        c_val, c_cnt = self.run()
        c_val, c_occ = download_compact(c_val, c_cnt, self.args)
        return _compact_to_tilemat(
            self.args.ctrow, self.args.ctcol, c_val, c_occ,
            self.shape, self.args.tm, self.args.tn,
        )

    def update_values(self, a: TileMat) -> None:
        """Re-upload A's value plane for a new matrix with the SAME
        sparsity structure (pattern-fixed iterative workloads)."""
        if self.a_struct is None:
            raise ValueError(
                "update_values is unavailable on executors built with "
                "from_args (A pattern arrays were not retained)"
            )
        tm0, tn0, trow0, tcol0, tnnz0, rc0 = self.a_struct
        same = (
            a.tm == tm0 and a.tn == tn0
            and np.array_equal(a.trow, trow0)
            and np.array_equal(a.tcol, tcol0)
            and np.array_equal(a.tnnz_ptr, tnnz0)
            and np.array_equal(a.rc, rc0)
        )
        if not same:
            raise ValueError(
                "update_values requires the exact same tile structure "
                f"(got nt={a.nt} nnz={a.nnz}, built with nt={trow0.size} "
                f"nnz={rc0.size})"
            )
        a_val = np.zeros_like(self.args.a_val)
        a_val[: a.nt] = a.dense(self.args.dtype)
        self.args.a_val = a_val
        dev = list(self._dev)
        dev[0] = jax.device_put(jnp.asarray(a_val))
        jax.block_until_ready(dev[0])
        self._dev = tuple(dev)


    def time_numeric(self, loop: int = 50, repeats: int = 3
                     ) -> tuple[float, float]:
        """Amortized per-dispatch numeric time.

        Chains `loop` kernel dispatches on device through a data
        dependency (the host fetches one scalar at the end), measures
        wall time around the chain, and subtracts the measured host
        round-trip latency — on tunneled TPU setups a single dispatch
        measures the tunnel, not the chip. Returns (numeric_ms, rtt_ms).
        """
        from spgemm_tpu.ops.pallas_kernels import gustavson_strip_pallas

        kwargs = dict(self.args.kernel_kwargs(),
                      acc_dtype=self.acc_dtype, interpret=self.interpret)

        from spgemm_tpu.utils.timing import chained_device_ms

        @jax.jit
        def chain(av, *rest):
            def body(i, acc):
                cv, _ = gustavson_strip_pallas(
                    av + acc.astype(av.dtype) * 1e-30, *rest, **kwargs)
                return acc + jnp.sum(cv).astype(jnp.float32)
            return jax.lax.fori_loop(0, loop, body, jnp.float32(0))

        return chained_device_ms(chain, self._dev[4], *self._dev,
                                 repeats=repeats, loop=loop)

    @classmethod
    def from_args(cls, args, *, acc_dtype=jnp.float32,
                  interpret: bool | None = None,
                  shape: tuple[int, int] | None = None) -> "StripExecutor":
        """Wrap an existing StripArgs plan (e.g. SpGEMMResult.schedule)
        without rebuilding it. update_values is unavailable on instances
        built this way (the A pattern arrays are not retained)."""
        self = cls.__new__(cls)
        self.a_struct = None
        self.shape = shape or (args.gm * args.tm, args.gn_c * args.tn)
        self.args = args
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        self.acc_dtype = acc_dtype
        from spgemm_tpu.ops.gustavson import check_strip_feasible

        check_strip_feasible(args, interpret)
        self._dev = jax.device_put(args.device_args())
        jax.block_until_ready(self._dev)
        return self
