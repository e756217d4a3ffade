"""Test configuration: force an 8-device virtual CPU platform.

Unit tests must not depend on TPU hardware; multi-chip sharding tests use
the virtual device mesh (xla_force_host_platform_device_count), per the
project's testing contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon site plugin re-forces jax_platforms="axon,cpu" from
# sitecustomize regardless of the env var; override it back to CPU so unit
# tests never touch (slow, tunneled) TPU hardware.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # fp64 golden-path tests

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_csr(rng, m, n, density, dtype=np.float64, integer_vals=True):
    """Random CSR with exactly-representable values (integer-valued by
    default so fp32 accumulation is exact in tests)."""
    from spgemm_tpu.models.csr import CSR

    nnz = max(1, int(m * n * density))
    rows = rng.integers(0, m, size=nnz)
    cols = rng.integers(0, n, size=nnz)
    if integer_vals:
        vals = rng.integers(1, 10, size=nnz).astype(dtype)
    else:
        vals = rng.standard_normal(nnz).astype(dtype)
    return CSR.from_coo(rows, cols, vals, (m, n))


@pytest.fixture
def make_random_csr(rng):
    import functools

    return functools.partial(random_csr, rng)
