"""Multi-host execution (SURVEY.md sections 2.3, 5: the reference is
single-desktop and OOMs at n=1023; the framework scales across a pod slice).

Within a host/slice, collectives ride ICI; across hosts they ride DCN.
The layer-partitioned solve (dist.solve) is topology-agnostic: once
`initialize()` has run, `jax.devices()` spans every host and
`global_layer_mesh()` builds the full mesh — shard_map + psum/ppermute
compile to the right fabric automatically.

This module is exercised single-process in CI (initialize() is a no-op
there); on a real pod slice, set the standard JAX coordinator environment
variables or pass them explicitly.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh

from .partition import LAYER_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> dict:
    """`jax.distributed.initialize` wrapper; no-op for single-process runs.

    Returns a topology summary {processes, process_index, local_devices,
    global_devices}.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return {
        "processes": jax.process_count(),
        "process_index": jax.process_index(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_layer_mesh(axis_name: str = LAYER_AXIS) -> Mesh:
    """1-D mesh over every device of every host, ordered so that
    consecutive layer bands sit on ICI neighbors within a host (the halo
    ppermutes stay intra-host except at host boundaries)."""
    import numpy as np

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis_name,))
