"""Distributed stencil SpMV with halo exchange overlapped with compute.

The +-n diagonals of A couple adjacent layer blocks, so each device needs
one boundary row from each neighbor per product (SURVEY.md section 2.3
'halo exchange').  The exchange is a pair of `lax.ppermute`s
(collective_permute over ICI on hardware); devices at the domain boundary
receive zeros, which realizes the Dirichlet condition because the masked
boundary coefficients are zero as well.

Overlap (BASELINE config 4: "halo exchange overlapped with SpMV"): the
matvec is split into an interior part — the full 5-point apply on locally
available rows, with NO data dependency on the permutes — and a boundary
fixup touching only the first and last local rows.  XLA lowers each
`ppermute` to an async `collective-permute-start`/`-done` pair; because the
interior compute consumes neither result, the latency-hiding scheduler
hoists both starts before the interior fusion and sinks the dones after it,
so the ICI transfer rides under the O(n_loc * n) interior work.  The
issue-early/consume-late dataflow shape that enables this is pinned by
tests/test_dist.py::test_halo_overlap_dataflow_schedule (a jaxpr-ordering
check; the final schedule is the TPU compiler's).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sparse import Stencil5, Stencil9


def halo_stencil_matvec(A_local: Stencil5, u_local: jax.Array,
                        axis_name: str, n_devices: int) -> jax.Array:
    """y_local = (A @ u)_local for row-sharded A, u inside shard_map.

    u_local: (n_loc, n).  One row travels up, one down; the local 5-point
    apply is identical to the single-device `ops.spmv.stencil_matvec` with
    the halo rows spliced in.
    """
    up_perm = [(i, i + 1) for i in range(n_devices - 1)]    # d -> d+1
    down_perm = [(i, i - 1) for i in range(1, n_devices)]   # d -> d-1

    # Start both exchanges first: nothing below depends on them until the
    # final two-row fixup, so the collective-permute rides under the
    # interior compute.
    # halo_below[0] = last row of the previous device (for the cs coupling)
    halo_below = jax.lax.ppermute(u_local[-1:], axis_name, up_perm)
    # halo_above[0] = first row of the next device (for the cn coupling)
    halo_above = jax.lax.ppermute(u_local[:1], axis_name, down_perm)

    # Interior: the full 5-point apply using only local rows (the cs term of
    # row 0 and the cn term of row n_loc-1 are deferred to the fixup).
    z = jnp.zeros_like(u_local[:, :1])
    uw = jnp.concatenate([z, u_local[:, :-1]], axis=1)
    ue = jnp.concatenate([u_local[:, 1:], z], axis=1)
    y = A_local.cc * u_local + A_local.cw * uw + A_local.ce * ue
    y = y.at[1:].add(A_local.cs[1:] * u_local[:-1])
    y = y.at[:-1].add(A_local.cn[:-1] * u_local[1:])

    # Boundary fixup: the only consumers of the halo rows.
    y = y.at[0].add(A_local.cs[0] * halo_below[0])
    y = y.at[-1].add(A_local.cn[-1] * halo_above[0])
    return y


def halo_stencil9_matvec(A_local: Stencil9, u_local: jax.Array,
                         axis_name: str, n_devices: int) -> jax.Array:
    """y_local = (A9 @ u)_local for the row-sharded 9-point operator —
    `halo_stencil_matvec` with the four corner couplings.  The corner
    neighbors are WITHIN-ROW shifts of the same single halo row each
    direction already exchanges (u[j-1, i+-1] lives in the j-1 row), so
    the communication volume is unchanged: one row up, one row down, and
    the same issue-early/consume-late overlap shape."""
    up_perm = [(i, i + 1) for i in range(n_devices - 1)]
    down_perm = [(i, i - 1) for i in range(1, n_devices)]

    halo_below = jax.lax.ppermute(u_local[-1:], axis_name, up_perm)[0]
    halo_above = jax.lax.ppermute(u_local[:1], axis_name, down_perm)[0]

    z = jnp.zeros_like(u_local[:, :1])
    shw = lambda v: jnp.concatenate(          # v[..., i-1]
        [jnp.zeros_like(v[..., :1]), v[..., :-1]], axis=-1)
    she = lambda v: jnp.concatenate(          # v[..., i+1]
        [v[..., 1:], jnp.zeros_like(v[..., :1])], axis=-1)

    uw = shw(u_local)
    ue = she(u_local)
    y = A_local.cc * u_local + A_local.cw * uw + A_local.ce * ue
    # interior inter-row couplings (local rows only)
    y = y.at[1:].add(A_local.cs[1:] * u_local[:-1]
                     + A_local.csw[1:] * uw[:-1]
                     + A_local.cse[1:] * ue[:-1])
    y = y.at[:-1].add(A_local.cn[:-1] * u_local[1:]
                      + A_local.cnw[:-1] * uw[1:]
                      + A_local.cne[:-1] * ue[1:])

    # boundary fixup: the only consumers of the halo rows
    y = y.at[0].add(A_local.cs[0] * halo_below
                    + A_local.csw[0] * shw(halo_below)
                    + A_local.cse[0] * she(halo_below))
    y = y.at[-1].add(A_local.cn[-1] * halo_above
                     + A_local.cnw[-1] * shw(halo_above)
                     + A_local.cne[-1] * she(halo_above))
    return y
