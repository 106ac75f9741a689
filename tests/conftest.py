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

jax.config.update("jax_platforms", "cpu")  # tests are CPU-oracle; bench.py uses TPU
jax.config.update("jax_enable_x64", True)
