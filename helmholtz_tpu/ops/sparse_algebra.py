"""Sparse matrix algebra: add/scale/axpy and SpGEMM.

Replaces the reference's `scipy.sparse` arithmetic (sparse adds at
code.py:123-125, 213-218; SURVEY.md section 2.2 row 2) and provides the
north star's SpGEMM as a *block-sparse* (BSR) product so the numeric phase
is batched dense matmuls on the MXU (SURVEY.md section 7.3 item 5).

Pattern (symbolic) computation happens host-side at setup time with concrete
index arrays — sparsity patterns are static under jit, which matches how the
framework uses these ops (preconditioner setup products, operator algebra),
never inside an iteration loop.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sparse import BSR, CSR, Stencil5


# -- stencil algebra (same pattern by construction) -------------------------

def stencil_add(A: Stencil5, B: Stencil5) -> Stencil5:
    return jax.tree.map(jnp.add, A, B)


def stencil_scale(A: Stencil5, alpha) -> Stencil5:
    return jax.tree.map(lambda f: alpha * f, A)


def stencil_axpy(alpha, A: Stencil5, B: Stencil5) -> Stencil5:
    """alpha * A + B — e.g. complex-shift perturbations of the operator."""
    return jax.tree.map(lambda a, b2: alpha * a + b2, A, B)


def stencil_diag_update(A: Stencil5, d: jax.Array) -> Stencil5:
    """A + diag(d) for grid-shaped d — the H_m = K + diag(w_m) structure
    (SURVEY.md section 3.3: the subgrid family differs only in c5)."""
    return Stencil5(cc=A.cc + d, cw=A.cw, ce=A.ce, cs=A.cs, cn=A.cn)


# -- CSR algebra -------------------------------------------------------------

def csr_scale(A: CSR, alpha) -> CSR:
    return CSR(alpha * A.data, A.indices, A.indptr, A.shape)


def csr_add_same_pattern(A: CSR, B: CSR) -> CSR:
    """A + B when both share indptr/indices (common case: assembled
    operators over the same stencil)."""
    return CSR(A.data + B.data, A.indices, A.indptr, A.shape)


def csr_add(A: CSR, B: CSR) -> CSR:
    """General A + B: host-side symbolic union, device numeric scatter."""
    assert A.shape == B.shape
    pat = _csr_union_pattern(A, B)
    (indptr, indices, a_map, b_map) = pat
    nnz = indices.shape[0]
    data = jnp.zeros((nnz,), jnp.result_type(A.dtype, B.dtype))
    data = data.at[jnp.asarray(a_map)].add(A.data)
    data = data.at[jnp.asarray(b_map)].add(B.data)
    return CSR(data, jnp.asarray(indices, jnp.int32),
               jnp.asarray(indptr, jnp.int32), A.shape)


def _csr_union_pattern(A: CSR, B: CSR):
    """Host symbolic phase: union pattern + per-source scatter maps."""
    nrows = A.shape[0]
    a_ip, a_ix = np.asarray(A.indptr), np.asarray(A.indices)
    b_ip, b_ix = np.asarray(B.indptr), np.asarray(B.indices)
    a_rows = np.repeat(np.arange(nrows), np.diff(a_ip))
    b_rows = np.repeat(np.arange(nrows), np.diff(b_ip))
    keys = np.concatenate([a_rows.astype(np.int64) * A.shape[1] + a_ix,
                           b_rows.astype(np.int64) * A.shape[1] + b_ix])
    uniq, inv = np.unique(keys, return_inverse=True)
    a_map = inv[:a_ix.shape[0]]
    b_map = inv[a_ix.shape[0]:]
    rows = (uniq // A.shape[1]).astype(np.int64)
    cols = (uniq % A.shape[1]).astype(np.int32)
    indptr = np.zeros(nrows + 1, np.int32)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr, dtype=np.int32)
    return indptr, cols, a_map, b_map


def stencil_to_bsr(A: Stencil5) -> BSR:
    """Materialize a Stencil5 as block-tridiagonal BSR with (n, n) layer
    blocks — the natural block structure of the operator (SURVEY.md
    section 0: tridiagonal diagonal blocks, diagonal couplings), and the
    input format for SpGEMM-based setup products.
    """
    L, n = A.grid_shape
    i = jnp.arange(n)
    diag = jnp.zeros((L, n, n), A.dtype)
    diag = diag.at[:, i, i].set(A.cc)
    diag = diag.at[:, i[1:], i[1:] - 1].set(A.cw[:, 1:])
    diag = diag.at[:, i[:-1], i[:-1] + 1].set(A.ce[:, :-1])
    sub = jnp.zeros((L - 1, n, n), A.dtype).at[:, i, i].set(A.cs[1:])
    sup = jnp.zeros((L - 1, n, n), A.dtype).at[:, i, i].set(A.cn[:-1])
    data_all = jnp.concatenate([sub, diag, sup], axis=0)

    perm, cols, counts = [], [], []
    for j in range(L):
        c = 0
        if j > 0:
            perm.append(j - 1)             # sub_j lives at data_all[j-1]
            cols.append(j - 1)
            c += 1
        perm.append((L - 1) + j)           # diag_j
        cols.append(j)
        c += 1
        if j < L - 1:
            perm.append((L - 1) + L + j)   # sup_j
            cols.append(j + 1)
            c += 1
        counts.append(c)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return BSR(data_all[jnp.asarray(perm)], jnp.asarray(cols, jnp.int32),
               jnp.asarray(indptr), (L * n, L * n), (n, n))


# -- BSR SpGEMM --------------------------------------------------------------

def _spgemm_pairs(a_ip, a_ix, b_ip, b_ix, n_brows, n_bcols_out):
    """Vectorized symbolic expansion of C = A @ B block pairs.

    For every stored block p of A (row i, block-col k) and every stored
    block q of B in row k, emit (p, q, i * n_bcols_out + col(q)).  Pure
    numpy — O(n_pairs), no Python loop (VERDICT round 1 item 8: the
    previous triple loop choked beyond toy sizes)."""
    a_rows = np.repeat(np.arange(n_brows, dtype=np.int64), np.diff(a_ip))
    counts = np.diff(b_ip)[a_ix]               # B-row length per A block
    total = int(counts.sum())
    if total == 0:
        return (np.zeros(0, np.int64),) * 3
    a_pair = np.repeat(np.arange(a_ix.shape[0], dtype=np.int64), counts)
    starts = np.repeat(b_ip[a_ix].astype(np.int64), counts)
    run_off = np.repeat(np.cumsum(counts, dtype=np.int64) - counts, counts)
    b_pair = starts + (np.arange(total, dtype=np.int64) - run_off)
    out_key = a_rows[a_pair] * n_bcols_out + b_ix[b_pair].astype(np.int64)
    return a_pair, b_pair, out_key


def bsr_spgemm(A: BSR, B: BSR) -> BSR:
    """C = A @ B for block-sparse matrices (MXU numeric phase).

    Host symbolic phase enumerates contributing block pairs and the output
    pattern (vectorized numpy — scales to setup-sized operators); numeric
    phase is one batched (bm, bk) x (bk, bn) matmul over all pairs plus a
    segment-sum into output blocks.
    """
    assert A.shape[1] == B.shape[0]
    assert A.blocksize[1] == B.blocksize[0]
    bm, bk = A.blocksize
    _, bn = B.blocksize
    n_brows = A.shape[0] // bm

    a_ip, a_ix = np.asarray(A.indptr), np.asarray(A.indices)
    b_ip, b_ix = np.asarray(B.indptr), np.asarray(B.indices)

    a_pair, b_pair, out_key = _spgemm_pairs(
        a_ip, a_ix, b_ip, b_ix, n_brows, B.shape[1] // bn)
    if out_key.shape[0] == 0:
        z = jnp.zeros((0,), jnp.int32)
        return BSR(jnp.zeros((0, bm, bn), A.dtype), z,
                   jnp.zeros(n_brows + 1, jnp.int32),
                   (A.shape[0], B.shape[1]), (bm, bn))
    uniq, inv = np.unique(out_key, return_inverse=True)
    rows = uniq // (B.shape[1] // bn)
    cols = (uniq % (B.shape[1] // bn)).astype(np.int32)
    indptr = np.zeros(n_brows + 1, np.int32)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr, dtype=np.int32)

    contrib = jnp.einsum(
        "pij,pjk->pik",
        A.data[jnp.asarray(np.asarray(a_pair), jnp.int32)],
        B.data[jnp.asarray(np.asarray(b_pair), jnp.int32)])
    data = jax.ops.segment_sum(contrib, jnp.asarray(inv, jnp.int32),
                               num_segments=uniq.shape[0])
    return BSR(data, jnp.asarray(cols), jnp.asarray(indptr),
               (A.shape[0], B.shape[1]), (bm, bn))
