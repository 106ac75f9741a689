"""1-D layer partitioning of the Helmholtz problem over a device mesh.

The operator's layer-block structure (SURVEY.md section 2.3) is already a
1-D domain decomposition: device d owns the contiguous band of grid rows
[d*n_loc, (d+1)*n_loc).  Everything row-indexed — the solution/RHS grids,
the stencil fields of A, the interlayer couplings, and the subgrid corner
inverses G — shards along that axis; the small H_F factors are replicated.

G is stored *row-aligned*: G_pad[j] is the corner inverse acting on grid row
j (zeros for the F rows j < b), so its shard boundaries coincide with the
row shards and every sweep step finds its G block locally.  This is the
partitioned factor storage that breaks the reference's 15 GB single-node
memory wall (SURVEY.md section 5 'long-context analog'): each device holds
only its band of factors.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.complexlib import CArray
from ..core.sparse import Stencil5
from ..precond.sweeping import SweepingPreconditioner

LAYER_AXIS = "layers"


def make_mesh(n_devices: int | None = None, axis_name: str = LAYER_AXIS) -> Mesh:
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} mesh devices but only "
                f"{len(devices)} visible (virtual CPU meshes need "
                f"--xla_force_host_platform_device_count set before "
                f"backend init; the axon plugin ignores JAX_PLATFORMS — "
                f"use jax.config.update('jax_platforms', 'cpu'))")
        devices = devices[:n_devices]
    return Mesh(np.array(devices).reshape(-1), (axis_name,))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["G_pad", "TF", "hf_cs", "hf_cn", "a_cs", "a_cn"],
    meta_fields=["b", "d2_replace"],
)
@dataclasses.dataclass(frozen=True)
class DistSweepState:
    """Row-aligned distributed preconditioner state (split-real storage)."""

    G_pad: CArray    # (L, n_pad, n_pad): G_pad[j] acts on row j; zero for
                     # j < b; trailing dims lane-padded when the source
                     # preconditioner was built with pad_lanes
    TF: CArray       # (b, n, n), replicated
    hf_cs: CArray    # (b, n), replicated
    hf_cn: CArray    # (b, n), replicated
    a_cs: CArray     # (L, n), row-sharded
    a_cn: CArray     # (L, n), row-sharded
    b: int
    d2_replace: bool


def dist_state_from_preconditioner(P_: SweepingPreconditioner) -> DistSweepState:
    """Row-align G by prepending b zero blocks (the F rows have no subgrid)."""
    if getattr(P_, "g_stride", 0):
        raise ValueError(
            "sample-compressed G (g_compress) is a single-chip layout; "
            "the distributed path factors per-band directly "
            "(dist.factor.distributed_setup) — set g_compress=False")
    b = P_.b
    n = P_.G.shape[-1]
    pad = jnp.zeros((b, n, n), P_.G.re.dtype)
    return DistSweepState(
        G_pad=CArray(jnp.concatenate([pad, P_.G.re], axis=0),
                     jnp.concatenate([pad, P_.G.im], axis=0)),
        TF=P_.TF, hf_cs=P_.hf_cs, hf_cn=P_.hf_cn,
        a_cs=P_.a_cs, a_cn=P_.a_cn, b=b, d2_replace=P_.d2_replace)


def row_sharding(mesh: Mesh, ndims: int, axis_name: str = LAYER_AXIS):
    """NamedSharding that shards axis 0 (grid rows) and replicates the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndims - 1))))


def shard_problem(mesh: Mesh, A: Stencil5, state: DistSweepState,
                  f_grid: jax.Array, axis_name: str = LAYER_AXIS,
                  f_axis: int = 0):
    """Place the problem on the mesh: row-shard A/f/G/couplings, replicate
    the H_F factors.  `f_axis` is the grid-row axis of f_grid (1 for a
    batched (B, L, n) right-hand side).

    Complex leaves (the stencil fields, the RHS) are converted to
    split-real CArray pairs BEFORE device placement: complex buffers may
    not exist at rest on the TPU backend (core.complexlib) — shard_map
    bodies complexify on entry."""
    from ..core.complexlib import pairify

    shard_rows = lambda x: jax.device_put(
        x, row_sharding(mesh, x.ndim, axis_name))
    repl = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
    A = pairify(A)
    f_grid = pairify(f_grid)

    A_sh = jax.tree.map(shard_rows, A)
    state_sh = DistSweepState(
        G_pad=jax.tree.map(shard_rows, state.G_pad),
        TF=jax.tree.map(repl, state.TF),
        hf_cs=jax.tree.map(repl, state.hf_cs),
        hf_cn=jax.tree.map(repl, state.hf_cn),
        a_cs=jax.tree.map(shard_rows, state.a_cs),
        a_cn=jax.tree.map(shard_rows, state.a_cn),
        b=state.b, d2_replace=state.d2_replace)
    f_ndim = (f_grid.re if isinstance(f_grid, CArray) else f_grid).ndim
    f_spec = P(*([None] * f_axis), axis_name,
               *([None] * (f_ndim - f_axis - 1)))
    f_sh = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, f_spec)), f_grid)
    return A_sh, state_sh, f_sh
