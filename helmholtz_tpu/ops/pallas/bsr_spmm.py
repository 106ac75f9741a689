"""Pallas TPU kernel for block-sparse (BSR) times dense — the MXU SpMM path.

Unstructured scalar gather is the one pattern TPU vector units do not
accelerate, so sparse work that wants the MXU is stored block-sparse (BSR)
and driven through dense (bm, bn) x (bn, K) block products
(BASELINE north star: "sparse ... driven through SpMV, SpMM, SpGEMM").

Kernel design — the canonical Pallas block-sparse matmul shape:
  * grid = (nblocks,), one nonzero block per step, in CSR order (all blocks
    of a block-row are consecutive);
  * `PrefetchScalarGridSpec` prefetches the block-row and block-column id
    arrays so the BlockSpec index maps can address the right X tile and
    output tile per step — the data-dependent indexing happens in the DMA
    engine addresses, never as a vector gather;
  * the output tile is revisited while the block-row stays the same (Pallas
    keeps it in VMEM and flushes on change), giving free accumulation: the
    kernel zeroes it on the first block of each row and accumulates complex
    block products on the MXU.

Complex convention (core.complexlib): split re/im f32 pairs; one complex
block product = 4 real MXU matmuls on the same resident tiles.

Reference parity: this replaces scipy.sparse's compiled block algebra
(SURVEY.md section 2.2 'scipy.sparse matrix algebra'); `ops.spmv.bsr_matmat`
is the XLA segment-sum formulation and the CPU oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.complexlib import CArray
from ...core.sparse import BSR


def _kernel(brow_ref, bcol_ref, ar, ai, xr, xi, yr, yi, *, nb):
    i = pl.program_id(0)
    row_changed = jnp.logical_or(
        i == 0, brow_ref[i] != brow_ref[jnp.maximum(i - 1, 0)])

    @pl.when(row_changed)
    def _():
        yr[...] = jnp.zeros_like(yr)
        yi[...] = jnp.zeros_like(yi)

    dot = functools.partial(
        jnp.dot, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=ar.dtype)
    a_r, a_i = ar[0], ai[0]
    x_r, x_i = xr[0], xi[0]
    yr[...] += dot(a_r, x_r) - dot(a_i, x_i)
    yi[...] += dot(a_r, x_i) + dot(a_i, x_r)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_bsr_matmat(A: BSR, X, *, interpret: bool = False) -> CArray:
    """Y = A @ X for a complex BSR matrix and dense X of shape (ncols, K).

    A.data may be a complex array or a CArray (nblocks, bm, bn); X a complex
    array or CArray (ncols, K).  Returns a CArray (nrows, K).  Block-rows
    with no stored blocks produce zero rows.
    """
    data = A.data if isinstance(A.data, CArray) else CArray.of(A.data)
    X = X if isinstance(X, CArray) else CArray.of(X)
    bm, bn = A.blocksize
    nb = data.re.shape[0]
    nrows = A.shape[0]
    nbrows = nrows // bm
    K = X.re.shape[-1]

    brow = jnp.repeat(jnp.arange(nbrows, dtype=jnp.int32), jnp.diff(A.indptr),
                      total_repeat_length=nb)
    bcol = A.indices.astype(jnp.int32)

    Xr = X.re.reshape(-1, bn, K)
    Xi = X.im.reshape(-1, bn, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, bm, bn), lambda i, br, bc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, bn), lambda i, br, bc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, K), lambda i, br, bc: (bc[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, K), lambda i, br, bc: (bc[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, K), lambda i, br, bc: (br[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i, br, bc: (br[i], 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    yr, yi = pl.pallas_call(
        functools.partial(_kernel, nb=nb),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nrows, K), X.re.dtype),
                   jax.ShapeDtypeStruct((nrows, K), X.re.dtype)),
        interpret=interpret,
    )(brow, bcol, data.re, data.im, Xr, Xi)

    # block-rows never visited by the grid keep undefined output — zero them
    counts = jnp.diff(A.indptr)
    nonempty = jnp.repeat(counts > 0, bm, total_repeat_length=nrows)[:, None]
    return CArray(jnp.where(nonempty, yr, 0), jnp.where(nonempty, yi, 0))
