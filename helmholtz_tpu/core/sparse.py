"""Sparse matrix containers as JAX pytrees.

TPU-first re-design of the reference's `scipy.sparse` usage (SURVEY.md
section 2.2 row 2).  The reference stores the Helmholtz operator as a generic
CSR matrix assembled from per-block `scipy.sparse.diags` calls
(code.py:120-126, 202-219); on TPU the profitable representation is the
*structured* one: the operator of a 5-point stencil on an L x n grid is five
dense coefficient fields of shape (L, n) ("DIA by grid geometry").  SpMV is
then a fused element-wise stencil application on the VPU — no gathers, no
index arrays, perfectly XLA-fusable, and it vectorizes/shards trivially.

Generic formats (COO/CSR/BSR) live in this module too for the parts of the
north star that need them (SpGEMM, general SpMV); `Stencil5` is the fast path
the Helmholtz pipeline runs on.

All containers are registered dataclass pytrees: they can be passed through
`jit`, `vmap`, `shard_map`, and stored in optimizer/solver state.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cc", "cw", "ce", "cs", "cn"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Stencil5:
    """5-point stencil operator on an (L, n) grid of unknowns.

    Unknown ordering matches the reference (SURVEY.md Appendix B item 1):
    vector index k = j*n + i for layer j (x2 direction) and in-layer
    position i (x1 direction), both 0-based here.

    Fields, all complex of shape (L, n), zero where the coupling would leave
    the grid (Dirichlet boundaries):
      cc : diagonal coefficient           (reference c5, code.py:107-109)
      cw : coupling to (j, i-1)           (reference c1, code.py:85)
      ce : coupling to (j, i+1)           (reference c2, code.py:92)
      cs : coupling to (j-1, i)           (reference c3, code.py:99)
      cn : coupling to (j+1, i)           (reference c4, code.py:103)
    """

    cc: jax.Array
    cw: jax.Array
    ce: jax.Array
    cs: jax.Array
    cn: jax.Array

    @property
    def grid_shape(self) -> tuple[int, int]:
        return self.cc.shape[-2], self.cc.shape[-1]

    @property
    def shape(self) -> tuple[int, int]:
        N = self.cc.shape[-1] * self.cc.shape[-2]
        return (N, N)

    @property
    def nnz(self) -> int:
        """Stored-structure nonzeros: 5*L*n minus the masked boundary slots
        (matches the reference CSR nnz = 5n^2-4n when L == n)."""
        L, n = self.grid_shape
        return 5 * L * n - 2 * L - 2 * n

    @property
    def dtype(self):
        return self.cc.dtype

    # -- conversions -------------------------------------------------------

    def todense(self) -> np.ndarray:
        """Dense (N, N) matrix — host-side test/oracle helper."""
        L, n = self.grid_shape
        N = L * n
        cc, cw, ce, cs, cn = (np.asarray(f) for f in
                              (self.cc, self.cw, self.ce, self.cs, self.cn))
        A = np.zeros((N, N), dtype=cc.dtype)
        k = np.arange(N)
        A[k, k] = cc.reshape(-1)
        A[k[1:], k[1:] - 1] = cw.reshape(-1)[1:]
        A[k[:-1], k[:-1] + 1] = ce.reshape(-1)[:-1]
        A[k[n:], k[n:] - n] = cs.reshape(-1)[n:]
        A[k[:-n], k[:-n] + n] = cn.reshape(-1)[:-n]
        return A

    def toscipy(self):
        """scipy CSR — host-side oracle helper."""
        import scipy.sparse

        L, n = self.grid_shape
        cc, cw, ce, cs, cn = (np.asarray(f).reshape(-1) for f in
                              (self.cc, self.cw, self.ce, self.cs, self.cn))
        return scipy.sparse.diags(
            [cc, cw[1:], ce[:-1], cs[n:], cn[:-n]],
            [0, -1, 1, -n, n],
            format="csr",
        )

    def tocsr(self) -> "CSR":
        """Direct stencil -> CSR materialization (native C++ when available;
        never builds a dense intermediate)."""
        from . import native

        indptr, indices, data = native.stencil_to_csr(
            np.asarray(self.cc), np.asarray(self.cw), np.asarray(self.ce),
            np.asarray(self.cs), np.asarray(self.cn))
        return CSR(jnp.asarray(data), jnp.asarray(indices),
                   jnp.asarray(indptr), self.shape)

    def tocoo(self) -> "COO":
        return self.tocsr().tocoo()


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cc", "cw", "ce", "cs", "cn", "csw", "cse", "cnw", "cne"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Stencil9:
    """9-point stencil operator: Stencil5 plus the four diagonal couplings.

    The stencil footprint is a property of the representation, not the
    assembly code (SURVEY.md section 0 note on the driver metadata): compact
    9-point Helmholtz schemes drop straight into the same pipeline.  Offsets
    in flat ordering: 0, +-1, +-n, +-(n-1), +-(n+1).
    """

    cc: jax.Array
    cw: jax.Array
    ce: jax.Array
    cs: jax.Array
    cn: jax.Array
    csw: jax.Array  # coupling to (j-1, i-1)
    cse: jax.Array  # coupling to (j-1, i+1)
    cnw: jax.Array  # coupling to (j+1, i-1)
    cne: jax.Array  # coupling to (j+1, i+1)

    @property
    def grid_shape(self) -> tuple[int, int]:
        return self.cc.shape[-2], self.cc.shape[-1]

    @property
    def shape(self) -> tuple[int, int]:
        N = self.cc.shape[-1] * self.cc.shape[-2]
        return (N, N)

    @property
    def dtype(self):
        return self.cc.dtype

    def todense(self) -> np.ndarray:
        L, n = self.grid_shape
        N = L * n
        A = np.zeros((N, N), dtype=np.asarray(self.cc).dtype)
        fields = {(0, 0): self.cc, (0, -1): self.cw, (0, 1): self.ce,
                  (-1, 0): self.cs, (1, 0): self.cn,
                  (-1, -1): self.csw, (-1, 1): self.cse,
                  (1, -1): self.cnw, (1, 1): self.cne}
        for (dj, di), f in fields.items():
            f = np.asarray(f)
            for j in range(L):
                jj = j + dj
                if not (0 <= jj < L):
                    continue
                for i in range(n):
                    ii = i + di
                    if 0 <= ii < n:
                        A[j * n + i, jj * n + ii] = f[j, i]
        return A


def _blocked(shape, block):
    return tuple(s // b for s, b in zip(shape, block))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "row", "col"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class COO:
    """Coordinate-format sparse matrix (static nnz)."""

    data: jax.Array  # (nnz,)
    row: jax.Array   # (nnz,) int32
    col: jax.Array   # (nnz,) int32
    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    @classmethod
    def fromdense(cls, A: jax.Array, nnz: int | None = None) -> "COO":
        A = np.asarray(A)
        r, c = np.nonzero(A)
        d = A[r, c]
        if nnz is not None:  # pad to a static size
            pad = nnz - d.shape[0]
            d = np.pad(d, (0, pad))
            r = np.pad(r, (0, pad))
            c = np.pad(c, (0, pad))
        return cls(jnp.asarray(d), jnp.asarray(r, jnp.int32),
                   jnp.asarray(c, jnp.int32), A.shape)

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, self.dtype)
        return out.at[self.row, self.col].add(self.data)

    def tocsr(self) -> "CSR":
        order = np.lexsort((np.asarray(self.col), np.asarray(self.row)))
        row = np.asarray(self.row)[order]
        indptr = np.zeros(self.shape[0] + 1, np.int32)
        np.add.at(indptr, row + 1, 1)
        indptr = np.cumsum(indptr, dtype=np.int32)
        return CSR(jnp.asarray(np.asarray(self.data)[order]),
                   jnp.asarray(np.asarray(self.col)[order], jnp.int32),
                   jnp.asarray(indptr), self.shape)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "indices", "indptr"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class CSR:
    """Compressed-sparse-row matrix (static nnz, static shape)."""

    data: jax.Array     # (nnz,)
    indices: jax.Array  # (nnz,) int32 column indices
    indptr: jax.Array   # (nrows+1,) int32
    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    @classmethod
    def fromdense(cls, A: jax.Array) -> "CSR":
        return COO.fromdense(A).tocsr()

    def todense(self) -> jax.Array:
        row = jnp.repeat(
            jnp.arange(self.shape[0], dtype=jnp.int32),
            jnp.diff(self.indptr),
            total_repeat_length=self.nnz,
        )
        out = jnp.zeros(self.shape, self.dtype)
        return out.at[row, self.indices].add(self.data)

    def tocoo(self) -> COO:
        row = jnp.repeat(
            jnp.arange(self.shape[0], dtype=jnp.int32),
            jnp.diff(self.indptr),
            total_repeat_length=self.nnz,
        )
        return COO(self.data, row, self.indices, self.shape)

    def toscipy(self):
        import scipy.sparse

        return scipy.sparse.csr_matrix(
            (np.asarray(self.data), np.asarray(self.indices),
             np.asarray(self.indptr)), shape=self.shape)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "indices", "indptr"],
    meta_fields=["shape", "blocksize"],
)
@dataclasses.dataclass(frozen=True)
class BSR:
    """Block-sparse-row matrix: CSR over dense (bm, bn) blocks.

    The MXU-friendly general format — SpGEMM and SpMM run as dense block
    matmuls (SURVEY.md section 7.3 item 5).
    """

    data: jax.Array     # (nblocks, bm, bn)
    indices: jax.Array  # (nblocks,) int32 block-column indices
    indptr: jax.Array   # (n_block_rows+1,) int32
    shape: tuple[int, int]
    blocksize: tuple[int, int]

    @property
    def nnz(self) -> int:
        return int(np.prod(self.data.shape))

    @property
    def dtype(self):
        return self.data.dtype

    @classmethod
    def fromdense(cls, A: jax.Array, blocksize: tuple[int, int]) -> "BSR":
        A = np.asarray(A)
        bm, bn = blocksize
        M, N = A.shape
        assert M % bm == 0 and N % bn == 0
        blocks = A.reshape(M // bm, bm, N // bn, bn).transpose(0, 2, 1, 3)
        mask = np.abs(blocks).sum(axis=(2, 3)) != 0
        br, bc = np.nonzero(mask)
        data = blocks[br, bc]
        indptr = np.zeros(M // bm + 1, np.int32)
        np.add.at(indptr, br + 1, 1)
        indptr = np.cumsum(indptr, dtype=np.int32)
        return cls(jnp.asarray(data), jnp.asarray(bc, jnp.int32),
                   jnp.asarray(indptr), (M, N), (bm, bn))

    def todense(self) -> jax.Array:
        bm, bn = self.blocksize
        M, N = self.shape
        brow = jnp.repeat(
            jnp.arange(M // bm, dtype=jnp.int32),
            jnp.diff(self.indptr),
            total_repeat_length=self.data.shape[0],
        )
        out = jnp.zeros((M // bm, N // bn, bm, bn), self.dtype)
        out = out.at[brow, self.indices].add(self.data)
        return out.transpose(0, 2, 1, 3).reshape(M, N)
