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
    data_fields=["G_pad", "TF", "hf_cs", "hf_cn", "a_cs", "a_cn",
                 "g_w", "g_lo"],
    meta_fields=["b", "d2_replace", "g_stride"],
)
@dataclasses.dataclass(frozen=True)
class DistSweepState:
    """Row-aligned distributed preconditioner state (split-real storage)."""

    G_pad: CArray    # dense (g_stride == 0): (L, n_pad, n_pad) — G_pad[j]
                     # acts on row j, zero for j < b.  Sample-compressed
                     # (g_stride > 0): (D * Ms_loc, n_pad, n_pad) — each
                     # device's band of Ms_loc corner-inverse SAMPLES; row
                     # j applies g_w[j,0]*S[g_lo[j]] + g_w[j,1]*S[g_lo[j]+1]
                     # over its LOCAL sample shard (ops.pallas.sweep lerp).
                     # Trailing dims lane-padded when built with pad_lanes.
    TF: CArray       # (b, n, n), replicated
    hf_cs: CArray    # (b, n), replicated
    hf_cn: CArray    # (b, n), replicated
    a_cs: CArray     # (L, n), row-sharded
    a_cn: CArray     # (L, n), row-sharded
    b: int
    d2_replace: bool
    g_w: jax.Array | None = None   # (L, 2) f32, row-sharded; (0,0) for F rows
    g_lo: jax.Array | None = None  # (L,) int32 LOCAL lo sample index
    g_stride: int = 0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["G_pad", "TF", "hf_l", "hf_u", "a_l", "a_u",
                 "g_w", "g_lo"],
    meta_fields=["b", "d2_replace", "g_stride"],
)
@dataclasses.dataclass(frozen=True)
class DistSweepState9:
    """Row-aligned distributed 9-POINT preconditioner state — the
    `DistSweepState` layout with TRIDIAGONAL inter-layer couplings:
    coupling triples [sub, diag, sup] stacked (.., 3, n) replace the
    diagonal coupling rows (precond.sweeping9 docstring).  G_pad keeps
    the identical row-aligned / sample-compressed contract."""

    G_pad: CArray    # dense: (L, n_pad, n_pad); compressed: sample shards
    TF: CArray       # (b, n, n), replicated (9-point block-Thomas stack)
    hf_l: CArray     # (b, 3, n), replicated
    hf_u: CArray     # (b, 3, n), replicated
    a_l: CArray      # (L, 3, n), row-sharded
    a_u: CArray      # (L, 3, n), row-sharded
    b: int
    d2_replace: bool
    g_w: jax.Array | None = None   # (L, 2) f32, row-sharded
    g_lo: jax.Array | None = None  # (L,) int32 LOCAL lo sample index
    g_stride: int = 0


def state_partition_specs(state, axis_name: str = LAYER_AXIS):
    """The PartitionSpec tree of a DistSweepState / DistSweepState9: G and
    the global coupling rows are row-sharded, the H_F factors replicated —
    one source for dist.solve's in_specs and dist.factor's out_specs."""
    from jax.sharding import PartitionSpec as P

    row = P(axis_name)
    repl = P()
    shard_fields = {"G_pad", "a_cs", "a_cn", "a_l", "a_u", "g_w", "g_lo"}
    kw = {}
    for fld in dataclasses.fields(state):
        v = getattr(state, fld.name)
        if fld.name in ("b", "d2_replace", "g_stride"):
            kw[fld.name] = v
        elif v is None:
            kw[fld.name] = None
        else:
            spec = row if fld.name in shard_fields else repl
            kw[fld.name] = jax.tree.map(lambda _: spec, v)
    return type(state)(**kw)


def dist_state_from_preconditioner(P_: SweepingPreconditioner,
                                   n_devices: int | None = None
                                   ) -> DistSweepState:
    """Row-align G by prepending b zero blocks (the F rows have no subgrid).

    For a sample-compressed preconditioner (P_.g_stride > 0) the global
    sample stack is re-laid out into per-band sample shards — each device
    gets the contiguous window of GLOBAL samples its rows' brackets touch
    (bands overlap by one sample at the seams, so no row ever needs a
    neighbour's shard), with per-row local indices/weights carrying the
    exact single-chip interpolant: the distributed operator equals the
    single-chip compressed operator value-for-value.  `n_devices` is
    required in that case (the band layout depends on it).
    """
    b = P_.b
    n = P_.G.shape[-1]
    gdt = P_.G.re.dtype
    if getattr(P_, "g_stride", 0):
        if not n_devices:
            raise ValueError("compressed G re-layout needs n_devices")
        import numpy as np

        from ..precond.sweeping import band_sample_window

        L = P_.a_cs.shape[0]
        if L % n_devices:
            raise ValueError(f"{L} rows not divisible by {n_devices}")
        n_loc = L // n_devices
        Ms = P_.G.re.shape[0]
        glo = np.asarray(P_.g_lo)                     # (M,) global lo index
        gw = np.asarray(P_.g_w)                       # (M, 2)
        j = np.arange(L)
        k = np.clip(j - b, 0, L - b - 1)
        lo_g = np.where(j >= b, glo[k], 0)
        # shared band geometry (band_sample_window == the compress_tables
        # lo layout this converter re-lays out; dist.factor/bench.plan use
        # the same helper)
        windows = [band_sample_window(L - b, P_.g_stride,
                                      max(d * n_loc, b) - b,
                                      (d + 1) * n_loc - 1 - b)
                   for d in range(n_devices)]
        s0 = np.array([w[0] for w in windows])
        s1 = np.array([w[1] for w in windows])
        ms_loc = int((s1 - s0 + 1).max())
        sidx = np.minimum(s0[:, None] + np.arange(ms_loc)[None, :], Ms - 1)
        G_re = jnp.asarray(np.asarray(P_.G.re)[sidx].reshape(
            n_devices * ms_loc, n, n))
        G_im = jnp.asarray(np.asarray(P_.G.im)[sidx].reshape(
            n_devices * ms_loc, n, n))
        lo_loc = np.where(j >= b, lo_g - s0[j // n_loc], 0)
        w = np.where((j >= b)[:, None], gw[k], 0.0)
        return DistSweepState(
            G_pad=CArray(G_re, G_im),
            TF=P_.TF, hf_cs=P_.hf_cs, hf_cn=P_.hf_cn,
            a_cs=P_.a_cs, a_cn=P_.a_cn, b=b, d2_replace=P_.d2_replace,
            g_w=jnp.asarray(w, jnp.float32),
            g_lo=jnp.asarray(lo_loc, jnp.int32),
            g_stride=P_.g_stride)
    pad = jnp.zeros((b, n, n), gdt)
    return DistSweepState(
        G_pad=CArray(jnp.concatenate([pad, P_.G.re], axis=0),
                     jnp.concatenate([pad, P_.G.im], axis=0)),
        TF=P_.TF, hf_cs=P_.hf_cs, hf_cn=P_.hf_cn,
        a_cs=P_.a_cs, a_cn=P_.a_cn, b=b, d2_replace=P_.d2_replace)


def row_sharding(mesh: Mesh, ndims: int, axis_name: str = LAYER_AXIS):
    """NamedSharding that shards axis 0 (grid rows) and replicates the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndims - 1))))


def shard_problem(mesh: Mesh, A, state, f_grid: jax.Array,
                  axis_name: str = LAYER_AXIS, f_axis: int = 0):
    """Place the problem on the mesh: row-shard A/f/G/couplings, replicate
    the H_F factors — generic over the stencil footprint (Stencil5 +
    DistSweepState or Stencil9 + DistSweepState9; field roles come from
    `state_partition_specs`).  `f_axis` is the grid-row axis of f_grid
    (1 for a batched (B, L, n) right-hand side).

    Complex leaves (the stencil fields, the RHS) are converted to
    split-real CArray pairs BEFORE device placement: complex buffers may
    not exist at rest on the TPU backend (core.complexlib) — shard_map
    bodies complexify on entry."""
    from ..core.complexlib import pairify

    A = pairify(A)
    f_grid = pairify(f_grid)

    shard_rows = lambda x: jax.device_put(
        x, row_sharding(mesh, x.ndim, axis_name))
    A_sh = jax.tree.map(shard_rows, A)
    specs = state_partition_specs(state, axis_name)
    state_sh = type(state)(**{
        fld.name: (getattr(state, fld.name)
                   if fld.name in ("b", "d2_replace", "g_stride")
                   or getattr(state, fld.name) is None
                   else jax.tree.map(
                       lambda x, s: jax.device_put(
                           x, NamedSharding(mesh, s)),
                       getattr(state, fld.name),
                       getattr(specs, fld.name)))
        for fld in dataclasses.fields(state)})
    f_ndim = (f_grid.re if isinstance(f_grid, CArray) else f_grid).ndim
    f_spec = P(*([None] * f_axis), axis_name,
               *([None] * (f_ndim - f_axis - 1)))
    f_sh = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, f_spec)), f_grid)
    return A_sh, state_sh, f_sh
