"""Batched dense complex linear algebra tuned for the MXU.

`jnp.linalg.inv` lowers to partially-pivoted LU, which runs at ~1-2 TFLOP/s
on TPU (pivot selection serializes).  The Schur complements inverted by the
preconditioner setup (SURVEY.md section 3.3) are complex-shifted, PML-damped
Helmholtz blocks — far from needing global pivoting — so `batched_inverse`
uses blocked Gauss-Jordan elimination: per 128-wide panel, one small
(pivoted) inverse plus three large batched matmuls.  Everything lands on the
MXU; measured ~10x faster than `jnp.linalg.inv` at n=1023.

Within-panel stability comes from the small pivoted inverse; across panels
there is no pivoting — callers should use this for matrices with adequately
dominant (block-)diagonals and can A/B against `jnp.linalg.inv` via the
`pivoted=` switch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def gauss_jordan_inverse_unpivoted(A: jax.Array) -> jax.Array:
    """Scalar Gauss-Jordan inverse without pivoting, batched over leading
    dims — a `fori_loop` of rank-1 updates.  On TPU this beats the pivoted
    LU path by ~10x for panel-sized matrices (the pivot search serializes
    LU); use only on matrices that do not need row exchanges (diagonally
    dominant / damped blocks)."""
    n = A.shape[-1]

    def step(k, X):
        col = jax.lax.dynamic_slice_in_dim(X, k, 1, -1)        # (..., n, 1)
        pivot = jax.lax.dynamic_slice_in_dim(col, k, 1, -2)    # (..., 1, 1)
        prow = jax.lax.dynamic_slice_in_dim(X, k, 1, -2) / pivot
        X = X - col * prow
        X = jax.lax.dynamic_update_slice_in_dim(X, -col / pivot, k, -1)
        X = jax.lax.dynamic_update_slice_in_dim(X, prow, k, -2)
        patch = jnp.ones_like(pivot) / pivot
        X = jax.lax.dynamic_update_slice(
            X, patch, (0,) * (X.ndim - 2) + (k, k))
        return X

    return jax.lax.fori_loop(0, n, step, A)


def batched_inverse(A: jax.Array, *, block: int = 256,
                    pivoted: bool = False, precision=None) -> jax.Array:
    """Inverse of a batch of square matrices (..., n, n).

    On TPU: recursive blocked Gauss-Jordan without cross-panel pivoting
    (panels 256 -> 64 -> scalar), all matmuls.  On CPU (and with
    pivoted=True): `jnp.linalg.inv` — LAPACK is fast and globally pivoted
    there, and the CPU oracle suite should exercise reference numerics.

    `precision` sets the panel-update matmul precision.  The default
    (None = DEFAULT, single-pass bf16 inputs with f32 accumulation) is
    right for the diagonally dominant complex-shifted Schur blocks the
    setup inverts — elimination growth stays O(1), so bf16 panel rounding
    costs ~bf16-level G accuracy, which the preconditioner already
    tolerates (bf16 G storage leaves iteration counts unchanged), and it
    is ~1.6x faster than HIGHEST at the batched shapes (measured 41-49 vs
    26.6 complex-real TF/s amortized).  Pass HIGHEST for matrices that are
    NOT diagonally dominant (e.g. the matrix-fraction V iterates of
    precond.sweeping._schur_corner_inverse_fraction, whose unpivoted
    elimination blows up under bf16 rounding).
    """
    if pivoted or jax.default_backend() == "cpu":
        return jnp.linalg.inv(A)
    return _blocked_gj(A, block, precision)


def _gj_base_style() -> str:
    """Base-case selector (HELMHOLTZ_TPU_GJ_BASE = xla | pallas): 'pallas'
    routes the <=128 panel inverse through ops.pallas.gj_inverse — one
    opaque kernel call instead of a k-step fori_loop of dynamic slices.
    Wall-time parity inside the blocked recursion (76 vs 74 ms at
    (85, 1023, 1023), measured), but the compiled PROGRAM is far smaller,
    which matters inside the capacity-scale solver nests
    (docs/miscompile_repro.py)."""
    import os

    return os.environ.get("HELMHOLTZ_TPU_GJ_BASE", "xla")


def _blocked_gj(A: jax.Array, block: int, precision=None) -> jax.Array:
    n = A.shape[-1]
    # Note: routing the <=128 base case through ops.pallas.gj_inverse is
    # measured at wall-time parity with the XLA scalar path inside the
    # full blocked recursion — the panel-update matmuls and full-X traffic
    # dominate — so the XLA base case stays the default for simplicity;
    # HELMHOLTZ_TPU_GJ_BASE=pallas selects the kernel (program-size lever
    # for the capacity solver nests, see _gj_base_style).
    if n <= 64:
        if (_gj_base_style() == "pallas"
                and jax.default_backend() == "tpu"
                and jnp.iscomplexobj(A)):
            from ..core.complexlib import CArray
            from .pallas.gj_inverse import pallas_gj_inverse

            batch = A.shape[:-2]
            B = 1
            for d in batch:
                B *= d
            X = CArray(jnp.real(A).reshape(B, n, n),
                       jnp.imag(A).reshape(B, n, n))
            out = pallas_gj_inverse(X)
            return out.cplx.reshape(*batch, n, n)
        return gauss_jordan_inverse_unpivoted(A)
    block = min(block, max(64, -(-n // 2)))

    n_pad = -(-n // block) * block
    if n_pad != n:
        batch = A.shape[:-2]
        eye_tail = jnp.eye(n_pad, dtype=A.dtype)[n:]
        Ap = jnp.zeros((*batch, n_pad, n_pad), A.dtype)
        Ap = Ap.at[..., :n, :n].set(A)
        Ap = Ap.at[..., n:, :].set(jnp.broadcast_to(eye_tail,
                                                    (*batch, n_pad - n, n_pad)))
        A = Ap

    nb = block

    def panel_step(p, X):
        kb = p * nb
        Xkk = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(X, kb, nb, -2), kb, nb, -1)
        P = _blocked_gj(Xkk, max(64, nb // 4), precision)  # recursive panel
        rowk = jnp.matmul(
            P, jax.lax.dynamic_slice_in_dim(X, kb, nb, -2),
            precision=precision)                                # (.., nb, n)
        colk = jax.lax.dynamic_slice_in_dim(X, kb, nb, -1)      # (.., n, nb)
        X = X - jnp.matmul(colk, rowk, precision=precision)
        X = jax.lax.dynamic_update_slice_in_dim(
            X, -jnp.matmul(colk, P, precision=precision), kb, -1)
        X = jax.lax.dynamic_update_slice_in_dim(X, rowk, kb, -2)
        # pivot block: overwritten by the row write above (holds ~I); set P
        Xrow = jax.lax.dynamic_slice_in_dim(X, kb, nb, -2)
        Xrow = jax.lax.dynamic_update_slice_in_dim(Xrow, P, kb, -1)
        return jax.lax.dynamic_update_slice_in_dim(X, Xrow, kb, -2)

    X = jax.lax.fori_loop(0, n_pad // nb, panel_step, A)
    return X[..., :n, :n]
