"""Exact sweeping factorization (Engquist-Ying Algorithms 2.1/2.2).

The validation-oracle path (code.py:293-342; SURVEY.md section 3.5): a full
block-LDL^T of the global operator by the layer Schur recursion
S_m = A_mm - A_{m,m-1} S_{m-1}^{-1} A_{m-1,m}, followed by the
forward/diagonal/backward block solve.  Exact to machine precision
(reference measured: rebuild diff ~4.6e-12, solve vs direct 1.0e-15).

On TPU this is the same batched-dense machinery as the moving-PML setup —
`_schur_t_stack` / `_block_thomas_solve` from `precond.sweeping` applied to
the whole operator instead of a b-layer subgrid.  O(n) dense n x n inverses
(O(N^2) flops, O(N^{3/2}) memory — already better than the reference's
O(N^2)-memory dense rebuild, code.py:309-330).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.complexlib import CArray
from ..core.sparse import Stencil5
from .sweeping import _block_thomas_solve, _schur_t_stack


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["T", "cs", "cn"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ExactFactorization:
    """T[m] = S_m^{-1} for every layer, plus the interlayer couplings.

    Split-real storage (core.complexlib) — this stack is the framework's
    O(n^3)-memory oracle object."""

    T: CArray    # (L, n, n)
    cs: CArray   # (L, n)
    cn: CArray   # (L, n)

    def solve(self, f: jax.Array) -> jax.Array:
        """u = A^{-1} f for grid-shaped f (L, n) — algo2_2 analog."""
        return _block_thomas_solve(self.T.cplx, self.cs.cplx, self.cn.cplx, f)

    def __call__(self, x: jax.Array) -> jax.Array:
        L, n = self.cs.shape
        return self.solve(x.reshape(L, n)).reshape(-1)


def factor_exact(A: Stencil5) -> ExactFactorization:
    """Algorithm 2.1 analog: the full layer-Schur recursion over A."""
    return ExactFactorization(T=CArray.of(_schur_t_stack(A)),
                              cs=CArray.of(A.cs), cn=CArray.of(A.cn))


def _elem_bsr(L, n, m, block, dtype, upper):
    """Elementary block factor I + N with one (n, n) block at (m+1, m)
    (lower) or (m, m+1) (upper) — BSR with identity diagonal blocks."""
    import numpy as np

    from ..core.sparse import BSR

    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (L, n, n))
    indices, indptr, order = [], [0], []
    slot = 0
    for j in range(L):
        row_cols = [j]
        if (not upper and j == m + 1) or (upper and j == m):
            extra = m if not upper else m + 1
            row_cols.append(extra)
        row_cols.sort()
        for c in row_cols:
            indices.append(c)
            order.append(L if c != j else j)   # L = slot of `block`
            slot += 1
        indptr.append(slot)
    data_all = jnp.concatenate([eye, block[None]], axis=0)
    return BSR(data_all[jnp.asarray(order)],
               jnp.asarray(indices, jnp.int32),
               jnp.asarray(np.asarray(indptr, np.int32)),
               (L * n, L * n), (n, n))


def rebuild_via_spgemm(A: Stencil5, F: ExactFactorization):
    """Reconstruct A = L_1..L_{n-1} D L'_{n-1}..L'_1 with block-sparse
    SpGEMM and return max |A_rebuilt - A| — the reference's algo2_1
    self-check (code.py:309-330) done as ~3n BSR products on the MXU
    instead of dense N x N factor materialization.  Exercises
    `ops.sparse_algebra.bsr_spgemm` on the setup-structured operators
    (BASELINE north star "driven through ... SpGEMM").
    """
    from ..ops.dense import batched_inverse
    from ..ops.sparse_algebra import bsr_spgemm

    T = F.T.cplx
    cs, cn = F.cs.cplx, F.cn.cplx
    L_, n = cs.shape
    dtype = T.dtype
    S = batched_inverse(T)                       # D blocks = T_m^{-1}

    from ..core.sparse import BSR
    i = jnp.arange(L_)
    D = BSR(S, jnp.asarray(i, jnp.int32),
            jnp.asarray(jnp.arange(L_ + 1), jnp.int32),
            (L_ * n, L_ * n), (n, n))

    prod = None
    for m in range(L_ - 1):
        Nm = cs[m + 1][:, None] * T[m]           # A_{m+1,m} T_m
        E = _elem_bsr(L_, n, m, Nm.astype(dtype), dtype, upper=False)
        prod = E if prod is None else bsr_spgemm(prod, E)
    mid = bsr_spgemm(prod, D) if prod is not None else D
    for m in range(L_ - 2, -1, -1):
        Mm = T[m] * cn[m][None, :]               # T_m A_{m,m+1}
        E = _elem_bsr(L_, n, m, Mm.astype(dtype), dtype, upper=True)
        mid = bsr_spgemm(mid, E)

    A_dense = jnp.asarray(A.todense())
    return jnp.max(jnp.abs(mid.todense() - A_dense))


def rebuild_error(A: Stencil5, F: ExactFactorization) -> jax.Array:
    """Max |A - L D L'| reconstruction error via action on a probe basis —
    the reference's factorization self-check (code.py:309-330) without
    forming dense N x N factors: applies solve() to the identity and checks
    A @ (A^{-1} I) = I columnwise."""
    L, n = F.cs.shape
    N = L * n
    from ..ops.spmv import stencil_matvec_flat

    eye = jnp.eye(N, dtype=A.cc.dtype)
    cols = jax.vmap(lambda e: stencil_matvec_flat(A, F(e)))(eye)
    return jnp.max(jnp.abs(cols - eye))
