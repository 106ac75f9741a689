"""Sparse matrix-vector / matrix-matrix products.

The Helmholtz fast path is `stencil_matvec`: a fused element-wise stencil
application on the VPU, the TPU-native replacement for the reference's CSR
SpMV inside scipy's GMRES (SURVEY.md section 3.1 hot loop 2); its Pallas
form is `ops.pallas.spmv_stencil` (the solve-path kernel on TPU).  Generic
CSR/COO SpMV (segment-sum based, jittable) covers arbitrary sparsity —
scalar gather is the one pattern the TPU vector units do not accelerate,
so unstructured CSR stays on the XLA scatter/segment-sum path while
block-sparse work goes through BSR and the MXU (`ops.pallas.bsr_spmm`).

All routines accept a trailing batch of right-hand sides (SpMM) — multi-RHS /
multi-frequency batching is the parallelism that fills the sweep pipeline
(SURVEY.md section 2.3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sparse import BSR, COO, CSR, Stencil5, Stencil9


def stencil_matvec(A: Stencil5, u: jax.Array) -> jax.Array:
    """y = A @ u with u of grid shape (..., L, n).

    Five shifted element-wise multiply-adds; masked boundary coefficients are
    zero so zero-padding realizes the Dirichlet boundary.  XLA fuses this to
    a single memory-bound pass: ~7 complex arrays of traffic for 5*L*n nnz.
    """
    z = jnp.zeros_like(u[..., :, :1])
    uw = jnp.concatenate([z, u[..., :, :-1]], axis=-1)   # u[j, i-1]
    ue = jnp.concatenate([u[..., :, 1:], z], axis=-1)    # u[j, i+1]
    zl = jnp.zeros_like(u[..., :1, :])
    us = jnp.concatenate([zl, u[..., :-1, :]], axis=-2)  # u[j-1, i]
    un = jnp.concatenate([u[..., 1:, :], zl], axis=-2)   # u[j+1, i]
    return (A.cc * u + A.cw * uw + A.ce * ue + A.cs * us + A.cn * un)


def stencil_matvec_flat(A: Stencil5, x: jax.Array) -> jax.Array:
    """y = A @ x for a flat vector x of length L*n (or batch (..., L*n))."""
    L, n = A.grid_shape
    u = x.reshape(*x.shape[:-1], L, n)
    return stencil_matvec(A, u).reshape(x.shape)


def _shift2(u, dj, di):
    """u shifted so result[j, i] = u[j+dj, i+di], zero outside the grid."""
    if di:
        z = jnp.zeros_like(u[..., :, :abs(di)])
        u = (jnp.concatenate([u[..., :, di:], z], axis=-1) if di > 0
             else jnp.concatenate([z, u[..., :, :di]], axis=-1))
    if dj:
        z = jnp.zeros_like(u[..., :abs(dj), :])
        u = (jnp.concatenate([u[..., dj:, :], z], axis=-2) if dj > 0
             else jnp.concatenate([z, u[..., :dj, :]], axis=-2))
    return u


def stencil9_matvec(A: Stencil9, u: jax.Array) -> jax.Array:
    """y = A @ u for the 9-point footprint — same fused one-pass pattern as
    `stencil_matvec`, four extra shifted multiply-adds."""
    out = A.cc * u
    for f, dj, di in ((A.cw, 0, -1), (A.ce, 0, 1), (A.cs, -1, 0),
                      (A.cn, 1, 0), (A.csw, -1, -1), (A.cse, -1, 1),
                      (A.cnw, 1, -1), (A.cne, 1, 1)):
        out = out + f * _shift2(u, dj, di)
    return out


def coo_matvec(A: COO, x: jax.Array) -> jax.Array:
    """y = A @ x via scatter-add (jittable, static nnz)."""
    contrib = A.data * x[A.col]
    return jnp.zeros(A.shape[0], dtype=contrib.dtype).at[A.row].add(contrib)


def csr_matvec(A: CSR, x: jax.Array) -> jax.Array:
    """y = A @ x via segment-sum over rows."""
    row = jnp.repeat(
        jnp.arange(A.shape[0], dtype=jnp.int32),
        jnp.diff(A.indptr),
        total_repeat_length=A.nnz,
    )
    contrib = A.data * x[A.indices]
    return jax.ops.segment_sum(contrib, row, num_segments=A.shape[0])


def csr_matmat(A: CSR, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X of shape (ncols, k) — SpMM by vmapping over k."""
    return jax.vmap(lambda v: csr_matvec(A, v), in_axes=1, out_axes=1)(X)


def bsr_matvec(A: BSR, x: jax.Array) -> jax.Array:
    """y = A @ x with dense-block products (batched matvec on the MXU)."""
    bm, bn = A.blocksize
    xb = x.reshape(-1, bn)
    brow = jnp.repeat(
        jnp.arange(A.shape[0] // bm, dtype=jnp.int32),
        jnp.diff(A.indptr),
        total_repeat_length=A.data.shape[0],
    )
    contrib = jnp.einsum("kij,kj->ki", A.data, xb[A.indices])
    out = jax.ops.segment_sum(contrib, brow, num_segments=A.shape[0] // bm)
    return out.reshape(A.shape[0])


def bsr_matmat(A: BSR, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X (ncols, k): block-sparse SpMM on the MXU."""
    bm, bn = A.blocksize
    k = X.shape[1]
    Xb = X.reshape(-1, bn, k)
    brow = jnp.repeat(
        jnp.arange(A.shape[0] // bm, dtype=jnp.int32),
        jnp.diff(A.indptr),
        total_repeat_length=A.data.shape[0],
    )
    contrib = jnp.einsum("pij,pjk->pik", A.data, Xb[A.indices])
    out = jax.ops.segment_sum(contrib, brow, num_segments=A.shape[0] // bm)
    return out.reshape(A.shape[0], k)
