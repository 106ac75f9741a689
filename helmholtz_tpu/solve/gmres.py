"""Restarted GMRES(m) in pure JAX — the framework's Krylov driver.

TPU-native replacement for the reference's `scipy.sparse.linalg.gmres` call
(code.py:516; SURVEY.md section 2.2 row "SciPy GMRES"):

  * the whole solve is one `jit`-compiled `lax.while_loop` nest — no
    host round-trips per iteration;
  * Arnoldi orthogonalization runs as batched complex dot products
    (a (m+1, N) @ (N,) matmul against the whole Krylov buffer, MXU-friendly
    and directly `psum`-able for the distributed path);
  * the least-squares problem is solved incrementally with complex Givens
    rotations, so the preconditioned residual norm is available every inner
    iteration for scipy-compatible convergence checks and for the
    `gmres_counter`-style residual history (code.py:413-420).

Semantics match legacy scipy `tol`: left preconditioning, convergence on
||M r|| <= rtol * ||M b||, restart default 20, zero initial guess
(SURVEY.md Appendix B item 7).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "iterations", "converged", "breakdown", "residual_norm",
                 "history"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class KrylovResult:
    """Solve outcome + observability artifacts (SURVEY.md section 5,
    'Metrics / logging')."""

    x: jax.Array
    iterations: jax.Array        # total inner iterations performed
    converged: jax.Array         # bool
    breakdown: jax.Array         # bool: happy breakdown / stagnation guard
    residual_norm: jax.Array     # final preconditioned ||M(b - A x)||
    history: jax.Array           # per-iteration preconditioned residuals
                                 # (nan-padded to the static maxiter)


def _givens(a, b):
    """Complex Givens rotation zeroing b against a.

    Returns (c, s, r) with c real, s complex such that
      [c, s; -conj(s), c] @ [a; b] = [r; 0].
    """
    eps = jnp.finfo(jnp.abs(a).dtype).tiny
    absa = jnp.abs(a)
    denom = jnp.sqrt(absa**2 + jnp.abs(b) ** 2)
    safe = denom > eps
    denom_s = jnp.where(safe, denom, 1.0)
    phase = jnp.where(absa > eps, a / jnp.where(absa > eps, absa, 1.0), 1.0)
    c = jnp.where(safe, absa / denom_s, 1.0)
    s = jnp.where(safe, phase * jnp.conj(b) / denom_s, 0.0 * b)
    r = phase * denom
    return c, s, r


def gmres(matvec: Callable, b: jax.Array, *,
          M: Optional[Callable] = None,
          x0: Optional[jax.Array] = None,
          restart: int = 20,
          rtol: float = 1e-3,
          atol: float = 0.0,
          maxiter: int = 1000,
          iter_cap=None,
          axis_name: Optional[str] = None) -> KrylovResult:
    """Left-preconditioned restarted GMRES. `matvec`/`M` map (N,) -> (N,).

    Fully jittable: restart/maxiter are static, everything else traced.
    `iter_cap` (optional, may be traced) caps total inner iterations below
    the static maxiter — the enforcement handle for callers with a shared
    budget (solve.ir.ir_gmres); the inner loop also respects it, so the
    count never exceeds the cap.

    With `axis_name` set, the solver runs SPMD inside `shard_map`: `b`/`x`
    are the locally-owned vector rows and every inner product / norm is
    all-reduced with `lax.psum` over the named mesh axis (the distributed
    Krylov dots of SURVEY.md section 2.3); `matvec`/`M` are then expected
    to be distributed operators (halo-exchange SpMV, staged sweep).
    """
    if M is None:
        M = lambda v: v
    N = b.shape[0]
    dtype = b.dtype
    rdtype = jnp.finfo(dtype).dtype
    x0_default = x0 is None
    if x0_default:
        x0 = jnp.zeros_like(b)

    if axis_name is None:
        _allreduce = lambda v: v
    else:
        _allreduce = lambda v: jax.lax.psum(v, axis_name)

    def _norm(v):
        return jnp.sqrt(_allreduce(jnp.sum(jnp.abs(v) ** 2)))

    Mb = M(b)
    bnorm = _norm(Mb)
    tol = jnp.maximum(rtol * bnorm, atol).astype(rdtype)
    n_outer = -(-maxiter // restart)
    hist_len = n_outer * restart
    cap = (jnp.asarray(maxiter) if iter_cap is None
           else jnp.minimum(maxiter, iter_cap))

    hi = jax.lax.Precision.HIGHEST  # MXU bf16 default breaks Arnoldi in fp32

    def inner_cond_of(j_limit):
        def inner_cond(state):
            j, _, _, _, _, _, _, res, brk = state
            return (j < j_limit) & (res > tol) & (~brk)
        return inner_cond

    def inner_step(state):
        j, V, H, cs, sn, g, _, _, brk = state
        # Arnoldi: one batched projection against the whole Krylov buffer.
        w = M(matvec(V[j]))
        h = _allreduce(jnp.matmul(jnp.conj(V), w, precision=hi))
        w = w - jnp.matmul(h, V, precision=hi)    # rows > j of h are 0
        # one re-orthogonalization pass for fp32 robustness
        h2 = _allreduce(jnp.matmul(jnp.conj(V), w, precision=hi))
        w = w - jnp.matmul(h2, V, precision=hi)
        h = h + h2
        hnorm = _norm(w)
        happy = hnorm <= jnp.finfo(rdtype).eps * 100 * bnorm
        V = V.at[j + 1].set(jnp.where(happy, 0.0, w / jnp.where(happy, 1.0, hnorm)))
        h = h.at[j + 1].set(hnorm.astype(dtype))

        # apply the accumulated rotations to the new column
        def rot_body(i, hcol):
            hi, hi1 = hcol[i], hcol[i + 1]
            hcol = hcol.at[i].set(cs[i] * hi + sn[i] * hi1)
            return hcol.at[i + 1].set(-jnp.conj(sn[i]) * hi + cs[i] * hi1)
        h = jax.lax.fori_loop(0, j, rot_body, h)

        c_new, s_new, r_new = _givens(h[j], h[j + 1])
        h = h.at[j].set(r_new).at[j + 1].set(0.0)
        cs = cs.at[j].set(c_new.astype(rdtype))
        sn = sn.at[j].set(s_new)
        gj = g[j]
        g = g.at[j].set(c_new * gj).at[j + 1].set(-jnp.conj(s_new) * gj)
        H = H.at[:, j].set(h)
        res = jnp.abs(g[j + 1])
        # happy breakdown: the Krylov space is exact; residual is |g[j+1]|
        return (j + 1, V, H, cs, sn, g, j + 1, res, brk | happy)

    def outer_cond(state):
        _, _, _, iters, done, _, _ = state
        return (~done) & (iters < cap)

    def outer_step(state):
        # r / beta are the preconditioned residual of x, carried in from the
        # previous cycle's convergence check (or the init) — recomputing them
        # here would cost an extra matvec + preconditioner application per
        # restart cycle, and the apply is this workload's dominant kernel.
        x, r, beta, iters, _, stalled, history = state
        j_limit = jnp.minimum(restart, cap - iters)  # shared-budget cap
        safe_beta = jnp.where(beta > 0, beta, 1.0)

        V = jnp.zeros((restart + 1, N), dtype).at[0].set(r / safe_beta)
        H = jnp.zeros((restart + 1, restart), dtype)
        cs = jnp.zeros((restart,), rdtype)
        sn = jnp.zeros((restart,), dtype)
        g = jnp.zeros((restart + 1,), dtype).at[0].set(beta.astype(dtype))

        init = (0, V, H, cs, sn, g, 0, beta, beta == 0.0)
        j, V, H, cs, sn, g, k, res, brk = jax.lax.while_loop(
            inner_cond_of(j_limit), inner_step, init)

        # record the per-iteration residual history from the Givens recurrence
        step_hist = jnp.where(
            jnp.arange(restart) < k,
            jnp.abs(g[1:]),
            jnp.nan,
        )
        history = jax.lax.dynamic_update_slice(history, step_hist, (iters,))

        # back-substitution on the k x k leading system (masked to full size)
        mask = jnp.arange(restart) < k
        Hs = jnp.where(jnp.eye(restart, dtype=bool) & ~mask[None, :],
                       jnp.ones((), dtype), H[:restart, :])
        y = jax.scipy.linalg.solve_triangular(
            Hs, jnp.where(mask, g[:restart], 0.0), lower=False)
        x = x + y @ V[:restart]

        # Convergence is decided on a *recomputed* preconditioned residual,
        # not the Givens estimate: in fp32 the Arnoldi recurrence drifts and
        # the estimate can undershoot by orders of magnitude.  The recomputed
        # residual vector is carried into the next cycle (and out of the
        # loop), so the trustworthy stopping test costs nothing extra.
        r_new = M(b - matvec(x))
        res_true = _norm(r_new)
        done = res_true <= tol
        # stagnation guards (SURVEY.md section 5 'failure detection'):
        # a breakdown cycle that did not converge, a cycle with no residual
        # reduction at all, or a cycle that performed zero inner iterations
        # (NaN/Inf residuals make every comparison false, so without the
        # k == 0 guard the outer loop would spin forever without ever
        # advancing `iters`) will not improve on repeat.
        stalled = (~done) & (brk | (res_true >= beta) | (k == 0)
                             | ~jnp.isfinite(res_true))
        return (x, r_new, res_true, iters + k, done | stalled, stalled,
                history)

    history0 = jnp.full((hist_len,), jnp.nan, rdtype)
    # x0 = 0 (the reference setting) makes the initial residual Mb, already
    # in hand for the tolerance; a caller-supplied x0 pays one extra
    # matvec + apply.
    if x0_default:
        r0, beta0 = Mb, bnorm
    else:
        r0 = M(b - matvec(x0))
        beta0 = _norm(r0)
    x, r_fin, final_res, iters, done, stalled, history = jax.lax.while_loop(
        outer_cond, outer_step,
        (x0, r0, beta0, 0, beta0 <= tol, False, history0))

    return KrylovResult(x=x, iterations=iters,
                        converged=final_res <= tol,
                        breakdown=stalled,
                        residual_norm=final_res,
                        history=history)
