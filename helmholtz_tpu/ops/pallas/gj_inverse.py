"""Pallas TPU kernel: batched unpivoted complex Gauss-Jordan panel inverse.

The preconditioner setup (precond.sweeping) inverts ~12k dense complex
Schur complements per n=1023 problem via blocked Gauss-Jordan
(ops.dense._blocked_gj).  The blocked scheme's big panel-update matmuls run
near MXU peak, but its *panel inverse* — k sequential rank-1 updates — is
hostile to XLA: every rank-1 step re-reads and re-writes the whole panel
batch from HBM and pays per-op dispatch, which made the scalar section
~60 of the 74 ms of a (85, 1023, 1023) inverse (measured).

This kernel runs the entire rank-1 recursion on panels RESIDENT IN VMEM:
one grid step owns a (BB, 2, k, k) split-complex batch, runs the k-step
Gauss-Jordan `fori_loop` on the VPU with zero HBM traffic, and writes the
inverted panels back once.

No pivoting (like the XLA scalar path it replaces): the Schur complements
are complex-shifted PML-damped Helmholtz blocks with dominant diagonals —
see ops.dense.batched_inverse for the stability contract and the
`pivoted=` escape hatch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.complexlib import CArray


def _kernel(x2, out2, *, k, bb):
    out2[...] = x2[...]
    lane_kk = jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 2)
    lane_1k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)

    # Mosaic has no value-land dynamic_slice: row j comes off the ref as a
    # sublane `pl.ds` slice (cheap); column j via a one-hot lane mask
    # multiply+reduce, and is written back as a masked blend (lane-dynamic
    # slicing is the one thing the VPU layout cannot do directly).
    def step(j, _):
        Xr = out2[:, 0]
        Xi = out2[:, 1]
        m_kk = (lane_kk == j).astype(Xr.dtype)         # one-hot column
        m_1k = (lane_1k == j).astype(Xr.dtype)
        cr = jnp.sum(Xr * m_kk, axis=2, keepdims=True)     # (bb, k, 1)
        ci = jnp.sum(Xi * m_kk, axis=2, keepdims=True)
        rr = out2[:, 0, pl.ds(j, 1), :]                    # (bb, 1, k)
        ri = out2[:, 1, pl.ds(j, 1), :]
        pr = jnp.sum(rr * m_1k, axis=2, keepdims=True)     # pivot (bb,1,1)
        pi = jnp.sum(ri * m_1k, axis=2, keepdims=True)
        d = pr * pr + pi * pi
        ir, ii = pr / d, -pi / d                           # 1 / pivot
        prow_r = ir * rr - ii * ri                         # row / pivot
        prow_i = ir * ri + ii * rr
        # rank-1 elimination X -= col (x) prow, then blend in the new
        # column -col/pivot (row j is overwritten below)
        ncr = -(cr * ir - ci * ii)
        nci = -(cr * ii + ci * ir)
        Xr = Xr - (cr * prow_r - ci * prow_i)
        Xi = Xi - (cr * prow_i + ci * prow_r)
        out2[:, 0] = Xr * (1.0 - m_kk) + ncr * m_kk
        out2[:, 1] = Xi * (1.0 - m_kk) + nci * m_kk
        # row j := row/pivot with the pivot slot = 1/pivot
        out2[:, 0, pl.ds(j, 1), :] = prow_r * (1.0 - m_1k) + ir * m_1k
        out2[:, 1, pl.ds(j, 1), :] = prow_i * (1.0 - m_1k) + ii * m_1k
        return 0

    jax.lax.fori_loop(0, k, step, 0)


@functools.partial(jax.jit, static_argnames=("batch_block", "interpret"))
def pallas_gj_inverse(X: CArray, *, batch_block: int = 8,
                      interpret: bool = False) -> CArray:
    """Inverse of a batch of complex matrices X: CArray (B, k, k), k <= 128.

    Pads the batch to a `batch_block` multiple with identity matrices (the
    recursion divides by every pivot, so padding must be nonsingular).
    """
    B, k, k2 = X.re.shape
    assert k == k2 and k <= 128, X.re.shape
    bb = min(batch_block, max(1, B))
    B_pad = -(-B // bb) * bb

    x2 = jnp.stack([X.re, X.im], axis=1)               # (B, 2, k, k)
    if B_pad != B:
        eye = jnp.zeros((B_pad - B, 2, k, k), X.re.dtype)
        eye = eye.at[:, 0].set(jnp.eye(k, dtype=X.re.dtype))
        x2 = jnp.concatenate([x2, eye], axis=0)

    spec = pl.BlockSpec((bb, 2, k, k), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, bb=bb),
        grid=(B_pad // bb,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B_pad, 2, k, k), X.re.dtype),
        interpret=interpret,
    )(x2)
    return CArray(out[:B, 0], out[:B, 1])
