"""Preconditioned BiCGStab in pure JAX (van der Vorst variant).

The second Krylov method of the north star (BASELINE.json; SURVEY.md
section 2.2 row 'SciPy GMRES' lists 'GMRES(m) + BiCGStab').  Same design as
`solve.gmres`: one jitted `lax.while_loop`, complex inner products, psum-able
via `axis_name` for the distributed path, per-iteration residual history.

Convergence follows scipy semantics for bicgstab: the *unpreconditioned*
residual ||b - A x|| <= max(rtol * ||b||, atol).  Each iteration performs
two matvecs and two preconditioner applications.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .gmres import KrylovResult


def bicgstab(matvec: Callable, b: jax.Array, *,
             M: Optional[Callable] = None,
             x0: Optional[jax.Array] = None,
             rtol: float = 1e-3,
             atol: float = 0.0,
             maxiter: int = 1000,
             axis_name: Optional[str] = None) -> KrylovResult:
    if M is None:
        M = lambda v: v
    dtype = b.dtype
    rdtype = jnp.finfo(dtype).dtype
    if x0 is None:
        x0 = jnp.zeros_like(b)

    if axis_name is None:
        _allreduce = lambda v: v
    else:
        _allreduce = lambda v: jax.lax.psum(v, axis_name)

    def _dot(a, c):
        return _allreduce(jnp.sum(jnp.conj(a) * c))

    def _norm(v):
        return jnp.sqrt(jnp.real(_allreduce(jnp.sum(jnp.abs(v) ** 2))))

    bnorm = _norm(b)
    tol = jnp.maximum(rtol * bnorm, atol).astype(rdtype)
    eps = jnp.finfo(rdtype).tiny * 1e3

    r0 = b - matvec(x0)
    rhat = r0

    def cond(state):
        (x, r, p, v, rho, alpha, omega, it, resnorm, brk, hist) = state
        return (resnorm > tol) & (it < maxiter) & (~brk)

    def step(state):
        (x, r, p, v, rho, alpha, omega, it, _, brk, hist) = state
        rho_new = _dot(rhat, r)
        breakdown = jnp.abs(rho_new) < eps
        beta = (rho_new / jnp.where(breakdown, 1.0, rho)) \
            * (alpha / jnp.where(omega == 0, 1.0, omega))
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = matvec(phat)
        denom = _dot(rhat, v)
        breakdown |= jnp.abs(denom) < eps
        alpha = rho_new / jnp.where(breakdown, 1.0, denom)
        s = r - alpha * v
        shat = M(s)
        t = matvec(shat)
        tt = _dot(t, t)
        omega = _dot(t, s) / jnp.where(jnp.abs(tt) < eps, 1.0, tt)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        resnorm = _norm(r)
        hist = hist.at[it].set(resnorm)
        return (x, r, p, v, rho_new, alpha, omega, it + 1, resnorm,
                brk | breakdown, hist)

    hist0 = jnp.full((maxiter,), jnp.nan, rdtype)
    zero = jnp.zeros_like(b)
    one = jnp.ones((), dtype)
    init = (x0, r0, zero, zero, one, one, one, 0, _norm(r0),
            bnorm == 0.0, hist0)
    (x, r, _, _, _, _, _, it, resnorm, brk, hist) = jax.lax.while_loop(
        cond, step, init)

    final = _norm(b - matvec(x))
    return KrylovResult(x=x, iterations=it, converged=final <= tol,
                        breakdown=brk, residual_norm=final, history=hist)
