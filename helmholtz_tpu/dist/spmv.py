"""Distributed stencil SpMV with halo exchange.

The +-n diagonals of A couple adjacent layer blocks, so each device needs
one boundary row from each neighbor per product (SURVEY.md section 2.3
'halo exchange').  The exchange is a pair of `lax.ppermute`s
(collective_permute over ICI on hardware); devices at the domain boundary
receive zeros, which realizes the Dirichlet condition because the masked
boundary coefficients are zero as well.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sparse import Stencil5


def halo_stencil_matvec(A_local: Stencil5, u_local: jax.Array,
                        axis_name: str, n_devices: int) -> jax.Array:
    """y_local = (A @ u)_local for row-sharded A, u inside shard_map.

    u_local: (n_loc, n).  One row travels up, one down; the local 5-point
    apply is identical to the single-device `ops.spmv.stencil_matvec` with
    the halo rows spliced in.
    """
    up_perm = [(i, i + 1) for i in range(n_devices - 1)]    # d -> d+1
    down_perm = [(i, i - 1) for i in range(1, n_devices)]   # d -> d-1

    # halo_below[0] = last row of the previous device (for the cs coupling)
    halo_below = jax.lax.ppermute(u_local[-1:], axis_name, up_perm)
    # halo_above[0] = first row of the next device (for the cn coupling)
    halo_above = jax.lax.ppermute(u_local[:1], axis_name, down_perm)

    us = jnp.concatenate([halo_below, u_local[:-1]], axis=0)   # u[j-1, i]
    un = jnp.concatenate([u_local[1:], halo_above], axis=0)    # u[j+1, i]
    z = jnp.zeros_like(u_local[:, :1])
    uw = jnp.concatenate([z, u_local[:, :-1]], axis=1)
    ue = jnp.concatenate([u_local[:, 1:], z], axis=1)

    return (A_local.cc * u_local + A_local.cw * uw + A_local.ce * ue
            + A_local.cs * us + A_local.cn * un)
