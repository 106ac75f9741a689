"""Test configuration: force CPU with a virtual 8-device mesh.

Distributed tests run without a cluster via
`--xla_force_host_platform_device_count` (SURVEY.md section 4); x64 is
enabled so complex128 oracle comparisons are meaningful.

Note: the environment pre-registers a TPU backend (JAX_PLATFORMS=axon via
sitecustomize) before conftest runs, so the platform must be overridden
through `jax.config`, not the environment variable.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # tests are CPU-oracle; bench.py uses TPU
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between modules.

    A full-suite run deterministically segfaulted inside XLA:CPU's
    `backend_compile_and_load` (LLVM JIT) at ~the 75th compile-heavy test
    (tests/test_precond.py recompute variants) while the same tests pass in
    isolation and host memory was <10% used — accumulated in-process JIT
    state, not OOM.  Per-module cache clearing bounds that state; the
    intra-module jit reuse that keeps the suite fast is unaffected."""
    yield
    jax.clear_caches()
