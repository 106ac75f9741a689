"""Mixed-precision iterative refinement around the f32 GMRES core.

The TPU precision option for tight tolerances (SURVEY.md section 7.3
item 3; BASELINE metric "GMRES iters to 1e-6 on 1024^2"): plain complex64
GMRES stalls at a true relative residual of ~5e-6 at n=1023 because both
the solution accumulator and the recomputed residual b - A x are floored at
f32 working precision.  Classic mixed-precision iterative refinement fixes
both without any f64 on device:

    x carried as a double-float32 pair (core.df32.DF32);
    r_k = b - A x computed with compensated arithmetic
          (core.df32.stencil_residual_comp);
    inner: f32 preconditioned GMRES solves A d = r_k to a loose rtol;
    x <- x (+) d with an error-free two_sum update.

Because the inner solve uses the same left preconditioner M and its RHS is
the current global residual, the inner per-iteration preconditioned
residuals ARE the global ones (M r_new = M r_k - M A d), so the
concatenated history and the total inner-iteration count are directly
comparable with a single uninterrupted GMRES — the parity metric.

Convergence keeps the reference's legacy-scipy semantics (SURVEY.md
Appendix B item 7): ||M r_k|| <= rtol * ||M b||, with r_k the *compensated*
residual, so the test is trustworthy below the f32 floor.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.df32 import DF32
from .gmres import KrylovResult, gmres


def ir_gmres(matvec: Callable, residual_comp: Callable, b: jax.Array, *,
             M: Optional[Callable] = None,
             rtol: float = 1e-6,
             atol: float = 0.0,
             restart: int = 20,
             maxiter: int = 200,
             inner_rtol: float = 1e-2,
             max_outer: int = 12,
             axis_name: Optional[str] = None) -> KrylovResult:
    """Solve A x = b to rtol (legacy preconditioned semantics) in f32.

    matvec        : f32 operator v -> A v on flat (N,) vectors.
    residual_comp : (x: DF32 of flat (N,)) -> compensated b - A x (flat).
    M             : left preconditioner (None = identity).
    inner_rtol    : per-cycle residual reduction requested from the f32
                    inner GMRES (each cycle re-scales, so the overall floor
                    is set by the compensated residual, ~1e-12 relative).

    Returns a KrylovResult: `iterations` counts all inner iterations,
    `history` is the concatenated per-inner-iteration preconditioned
    residual history (nan-padded), `x` the rounded df32 solution.
    """
    if M is None:
        M = lambda v: v
    if axis_name is None:
        _psum = lambda v: v
    else:
        _psum = lambda v: jax.lax.psum(v, axis_name)

    def _norm(v):
        return jnp.sqrt(_psum(jnp.sum(jnp.abs(v) ** 2)))

    rdtype = jnp.finfo(b.dtype).dtype
    bnorm = _norm(M(b))
    tol = jnp.maximum(rtol * bnorm, atol).astype(rdtype)

    # per-cycle inner budget: full maxiter (the outer loop stops on iters)
    inner_hist = -(-maxiter // restart) * restart
    hist_len = inner_hist * max_outer

    def cond(state):
        x, r, k, iters, res, done, stalled, history = state
        return (~done) & (~stalled) & (k < max_outer) & (iters < maxiter)

    def body(state):
        x, r, k, iters, res_prev, done, stalled, history = state
        # iter_cap: the inner cycle spends only the REMAINING global budget,
        # so total reported iterations never exceed maxiter
        inner = gmres(matvec, r, M=M, restart=restart, rtol=inner_rtol,
                      atol=0.0, maxiter=maxiter, iter_cap=maxiter - iters,
                      axis_name=axis_name)
        x = x.add(inner.x)
        history = jax.lax.dynamic_update_slice(history, inner.history,
                                               (iters,))
        iters = iters + inner.iterations
        r = residual_comp(x)               # trustworthy below the f32 floor
        res = _norm(M(r))
        done = res <= tol
        stalled = (~done) & ((res >= res_prev) | ~jnp.isfinite(res))
        return (x, r, k + 1, iters, res, done, stalled, history)

    x0 = DF32.zeros_like(b)
    history0 = jnp.full((hist_len,), jnp.nan, rdtype)
    state = (x0, b, 0, 0, bnorm, bnorm <= tol, False, history0)
    x, r, k, iters, res, done, stalled, history = jax.lax.while_loop(
        cond, body, state)

    return KrylovResult(x=x.value, iterations=iters, converged=res <= tol,
                        breakdown=stalled, residual_norm=res,
                        history=history)
