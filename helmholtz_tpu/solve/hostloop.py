"""Host-driven restarted GMRES: the structurally-minimal Krylov driver.

`solve.gmres` compiles the whole solve as one `while_loop` nest — the
right shape for production (zero host round-trips per iteration).  But on
the current TPU backend that nest MISCOMPILES when the preconditioner is
the recompute sweep at n >= 1407: the same apply runs correctly
standalone and inside plain GMRES at smaller n, while the 6-deep loop
nest (outer while -> inner while -> recompute fori -> scan -> factor
scan -> blocked-GJ fori) hard-crashes the TPU worker ("kernel fault";
precond/recompute.py module docstring records the envelope).

This driver removes the two solver loops from the compiled program
entirely: each Arnoldi step is ONE jitted dispatch (apply + batched
projection + re-orthogonalization + normalization), and the Givens
recurrence / least-squares / convergence logic runs on the host in
complex128.  At the capacity scales where it matters the apply costs
seconds while a dispatch round-trip costs ~27 ms through the tunnel, so
the host loop is free — and it is also the failure-isolation tool: any
divergence between this driver and `solve.gmres` on the same operators
localizes a miscompile to the loop nest.

Semantics mirror `solve.gmres` (left preconditioning, legacy-scipy tol,
recomputed-residual stopping, happy-breakdown/stagnation guards).  All
device-resident state is split-real pairs (`core.complexlib.CArray`) —
this backend cannot hold complex buffers at rest — and every operand is
passed as a runtime argument, never a closure constant (closed-over
arrays ship to the remote compiler as literals).

Iteration-count parity with `solve.gmres` is pinned by
tests/test_gmres.py::test_hostloop_matches_jitted_gmres.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.complexlib import CArray
from .gmres import KrylovResult


def _get(x):
    return np.asarray(jax.device_get(x))


def gmres_hostloop(matvec_of: Callable, A_ops, b_pair: CArray, *,
                   M_of: Optional[Callable] = None, M_ops=None,
                   restart: int = 20, rtol: float = 1e-3, atol: float = 0.0,
                   maxiter: int = 60,
                   verbose: bool = False) -> KrylovResult:
    """Left-preconditioned GMRES(restart) with host-side control flow.

    `matvec_of(A_ops, v)` and `M_of(M_ops, v)` are PURE functions of their
    operand pytrees and a flat complex vector — the pytrees are passed
    through jit as arguments on every dispatch.  `b_pair` is the flat RHS
    as a split-real pair.  Returns a `KrylovResult` whose `x` is a CArray
    pair and whose scalar fields are host values.
    """
    if M_of is None:
        M_of = lambda _, v: v
    m = restart
    N = b_pair.re.shape[0]

    def _apply(Ao, Mo, v):
        return M_of(Mo, matvec_of(Ao, v))

    @jax.jit
    def prep(Ao, Mo, bp):
        Mb = M_of(Mo, bp.cplx)
        return CArray.of(Mb), jnp.linalg.norm(Mb)

    @jax.jit
    def start_cycle(rp, beta):
        V = jnp.zeros((m + 1, N), rp.re.dtype)
        r = rp.cplx / jnp.where(beta > 0, beta, 1.0).astype(rp.re.dtype)
        return CArray(V.at[0].set(jnp.real(r)), V.at[0].set(jnp.imag(r)))

    @jax.jit
    def step(Ao, Mo, Vp, j, bnorm):
        """One Arnoldi step at traced column j: returns the updated basis,
        the (m+1,) projection column, and the new-vector norm."""
        V = Vp.cplx
        vj = jax.lax.dynamic_index_in_dim(V, j, 0, keepdims=False)
        w = _apply(Ao, Mo, vj)
        hi = jax.lax.Precision.HIGHEST
        h = jnp.matmul(jnp.conj(V), w, precision=hi)
        w = w - jnp.matmul(h, V, precision=hi)
        h2 = jnp.matmul(jnp.conj(V), w, precision=hi)   # re-orthogonalize
        w = w - jnp.matmul(h2, V, precision=hi)
        h = h + h2
        hnorm = jnp.linalg.norm(w)
        eps = jnp.finfo(hnorm.dtype).eps
        happy = hnorm <= eps * 100 * bnorm
        vnew = jnp.where(happy, 0.0, w / jnp.where(happy, 1.0, hnorm))
        V = jax.lax.dynamic_update_index_in_dim(V, vnew, j + 1, 0)
        return (CArray(jnp.real(V), jnp.imag(V)),
                jnp.real(h), jnp.imag(h), hnorm)

    @jax.jit
    def form_x(xp, Vp, yp):
        x = xp.cplx + jnp.matmul(yp.cplx, Vp.cplx[:m],
                                 precision=jax.lax.Precision.HIGHEST)
        return CArray.of(x)

    @jax.jit
    def resid(Ao, Mo, bp, xp):
        r = M_of(Mo, bp.cplx - matvec_of(Ao, xp.cplx))
        return CArray.of(r), jnp.linalg.norm(r)

    Mb_pair, bnorm_dev = prep(A_ops, M_ops, b_pair)
    bnorm = float(_get(bnorm_dev))
    tol = max(rtol * bnorm, atol)

    cdt = np.complex128
    x_pair = CArray(jnp.zeros_like(b_pair.re), jnp.zeros_like(b_pair.im))
    r_pair, beta = Mb_pair, bnorm
    iters = 0
    history: list[float] = []
    converged = beta <= tol
    stalled = False

    while not converged and not stalled and iters < maxiter:
        V_pair = start_cycle(r_pair, jnp.asarray(beta, b_pair.re.dtype))
        H = np.zeros((m + 1, m), cdt)
        cs = np.zeros((m,), np.float64)
        sn = np.zeros((m,), cdt)
        g = np.zeros((m + 1,), cdt)
        g[0] = beta
        k = 0
        brk = False
        for j in range(min(m, maxiter - iters)):
            V_pair, h_re, h_im, hnorm = step(
                A_ops, M_ops, V_pair, jnp.asarray(j, jnp.int32),
                jnp.asarray(bnorm, b_pair.re.dtype))
            h = (_get(h_re) + 1j * _get(h_im)).astype(cdt)
            hn_np = _get(hnorm)
            hn = float(hn_np)
            happy = hn <= np.finfo(hn_np.dtype).eps * 100 * bnorm
            h[j + 1] = hn
            # accumulated Givens rotations on the new column (host)
            for i in range(j):
                hi_, hi1 = h[i], h[i + 1]
                h[i] = cs[i] * hi_ + sn[i] * hi1
                h[i + 1] = -np.conj(sn[i]) * hi_ + cs[i] * hi1
            denom = np.hypot(abs(h[j]), abs(h[j + 1]))
            if denom > 0:
                phase = h[j] / abs(h[j]) if abs(h[j]) > 0 else 1.0
                c_new = abs(h[j]) / denom
                s_new = phase * np.conj(h[j + 1]) / denom
                h[j], h[j + 1] = phase * denom, 0.0
            else:
                c_new, s_new = 1.0, 0.0
            cs[j], sn[j] = c_new, s_new
            gj = g[j]
            g[j], g[j + 1] = c_new * gj, -np.conj(s_new) * gj
            H[: j + 2, j] = h[: j + 2]
            k = j + 1
            res_est = abs(g[j + 1])
            history.append(res_est)
            if verbose:
                print(f"  iter {iters + k}: |g| = {res_est:.3e}")
            if happy:
                brk = True
                break
            if res_est <= tol:
                break
        iters += k

        if k:
            # Givens can rotate a new column to a zero diagonal without
            # tripping the happy-breakdown threshold — treat a singular
            # (or non-finite) triangular system as breakdown, matching
            # solve.gmres's breakdown semantics, instead of letting
            # LinAlgError crash the solver.
            try:
                y = np.zeros((m,), cdt)
                y[:k] = np.linalg.solve(H[:k, :k], g[:k])
            except np.linalg.LinAlgError:
                stalled = True
                break
            if not np.all(np.isfinite(y[:k])):
                stalled = True
                break
            y_pair = CArray(jnp.asarray(np.real(y), b_pair.re.dtype),
                            jnp.asarray(np.imag(y), b_pair.re.dtype))
            x_pair = form_x(x_pair, V_pair, y_pair)

        # convergence on the RECOMPUTED preconditioned residual (the Givens
        # estimate drifts in fp32 — same policy as solve.gmres.outer_step)
        r_pair, res_dev = resid(A_ops, M_ops, b_pair, x_pair)
        res_true = float(_get(res_dev))
        converged = res_true <= tol
        stalled = (not converged) and (brk or res_true >= beta or k == 0
                                       or not np.isfinite(res_true))
        beta = res_true
        if verbose:
            print(f"cycle end: iters={iters} recomputed |Mr| = {res_true:.3e}")

    hist = np.asarray(history, np.float64)
    return KrylovResult(x=x_pair, iterations=jnp.asarray(iters),
                        converged=jnp.asarray(bool(converged)),
                        breakdown=jnp.asarray(bool(stalled)),
                        residual_norm=jnp.asarray(beta),
                        history=jnp.asarray(hist))


def gmres_hostloop_batched(matvec_of: Callable, A_ops, B_pair: CArray, *,
                           M_of: Optional[Callable] = None, M_ops=None,
                           restart: int = 20, rtol: float = 1e-3,
                           atol: float = 0.0, maxiter: int = 60,
                           verbose: bool = False) -> KrylovResult:
    """Batched-RHS host-driven GMRES: B right-hand sides in LOCKSTEP.

    The batch shares every device dispatch — `matvec_of(A_ops, V)` and
    `M_of(M_ops, V)` take the whole (B, N) block, so a recompute
    preconditioner re-factors its chunk G ONCE per Arnoldi step for all B
    vectors (precond.recompute.apply_recompute_multi).  That is the
    capacity-scale amortization VERDICT round 3 item 7 asks for: at
    n >= 1407 (the compiled-nest miscompile envelope) this is the only
    driver, and per-RHS wall drops ~B-fold against B sequential
    `gmres_hostloop` runs.

    Each RHS keeps its OWN Arnoldi/Givens recurrence on the host
    (complex128) and its own convergence bookkeeping; the lockstep cycle
    ends when every still-active RHS has crossed its tolerance estimate
    (converged members idle inside the shared dispatches — wasted flops,
    not wasted HBM passes).  Per-RHS `iterations` is the inner step at
    which that RHS's estimate first crossed tol in its final cycle
    (confirmed by the recomputed residual), matching the per-RHS counts
    of `solve.batched.solve_multi_rhs`.
    """
    if M_of is None:
        M_of = lambda _, v: v
    m = restart
    Bn, N = B_pair.re.shape

    def _apply(Ao, Mo, V):
        return M_of(Mo, matvec_of(Ao, V))

    @jax.jit
    def prep(Ao, Mo, bp):
        Mb = M_of(Mo, bp.cplx)
        return CArray.of(Mb), jnp.linalg.norm(Mb, axis=1)

    @jax.jit
    def start_cycle(rp, beta):
        V = jnp.zeros((Bn, m + 1, N), rp.re.dtype)
        scale = jnp.where(beta > 0, beta, 1.0).astype(rp.re.dtype)[:, None]
        r = rp.cplx / scale
        return CArray(V.at[:, 0].set(jnp.real(r)),
                      V.at[:, 0].set(jnp.imag(r)))

    @jax.jit
    def step(Ao, Mo, Vp, j, bnorm):
        V = Vp.cplx
        vj = jax.lax.dynamic_index_in_dim(V, j, 1, keepdims=False)
        w = _apply(Ao, Mo, vj)                          # ONE batched apply
        hi = jax.lax.Precision.HIGHEST
        h = jnp.einsum("bkn,bn->bk", jnp.conj(V), w, precision=hi)
        w = w - jnp.einsum("bk,bkn->bn", h, V, precision=hi)
        h2 = jnp.einsum("bkn,bn->bk", jnp.conj(V), w, precision=hi)
        w = w - jnp.einsum("bk,bkn->bn", h2, V, precision=hi)
        h = h + h2
        hnorm = jnp.linalg.norm(w, axis=1)
        eps = jnp.finfo(hnorm.dtype).eps
        happy = hnorm <= eps * 100 * bnorm
        denom = jnp.where(happy, 1.0, hnorm)[:, None]
        vnew = jnp.where(happy[:, None], 0.0, w / denom)
        V = jax.lax.dynamic_update_index_in_dim(V, vnew, j + 1, 1)
        return (CArray(jnp.real(V), jnp.imag(V)),
                jnp.real(h), jnp.imag(h), hnorm)

    @jax.jit
    def form_x(xp, Vp, yp):
        x = xp.cplx + jnp.einsum(
            "bk,bkn->bn", yp.cplx, Vp.cplx[:, :m],
            precision=jax.lax.Precision.HIGHEST)
        return CArray.of(x)

    @jax.jit
    def resid(Ao, Mo, bp, xp):
        r = M_of(Mo, bp.cplx - matvec_of(Ao, xp.cplx))
        return CArray.of(r), jnp.linalg.norm(r, axis=1)

    Mb_pair, bnorm_dev = prep(A_ops, M_ops, B_pair)
    bnorm = _get(bnorm_dev).astype(np.float64)            # (B,)
    tol = np.maximum(rtol * bnorm, atol)

    cdt = np.complex128
    x_pair = CArray(jnp.zeros_like(B_pair.re), jnp.zeros_like(B_pair.im))
    r_pair, beta = Mb_pair, bnorm.copy()
    steps_total = 0
    iters_out = np.zeros((Bn,), np.int64)
    history: list[np.ndarray] = []
    converged = beta <= tol
    stalled = np.zeros((Bn,), bool)

    while not np.all(converged | stalled) and steps_total < maxiter:
        V_pair = start_cycle(r_pair, jnp.asarray(beta, B_pair.re.dtype))
        H = np.zeros((Bn, m + 1, m), cdt)
        cs = np.zeros((Bn, m), np.float64)
        sn = np.zeros((Bn, m), cdt)
        g = np.zeros((Bn, m + 1), cdt)
        g[:, 0] = beta
        crossed = converged | stalled      # already-done members idle
        cross_step = np.where(crossed, 0, 0).astype(np.int64)
        happy_any = np.zeros((Bn,), bool)
        k = 0
        for j in range(min(m, maxiter - steps_total)):
            V_pair, h_re, h_im, hnorm = step(
                A_ops, M_ops, V_pair, jnp.asarray(j, jnp.int32),
                jnp.asarray(bnorm, B_pair.re.dtype))
            h_all = (_get(h_re) + 1j * _get(h_im)).astype(cdt)  # (B, m+1)
            hn_np = _get(hnorm)
            res_est = np.empty((Bn,), np.float64)
            for q in range(Bn):
                h = h_all[q]
                hn = float(hn_np[q])
                happy = hn <= np.finfo(hn_np.dtype).eps * 100 * bnorm[q]
                happy_any[q] |= happy
                h[j + 1] = hn
                for i in range(j):
                    hi_, hi1 = h[i], h[i + 1]
                    h[i] = cs[q, i] * hi_ + sn[q, i] * hi1
                    h[i + 1] = -np.conj(sn[q, i]) * hi_ + cs[q, i] * hi1
                denom = np.hypot(abs(h[j]), abs(h[j + 1]))
                if denom > 0:
                    phase = h[j] / abs(h[j]) if abs(h[j]) > 0 else 1.0
                    c_new = abs(h[j]) / denom
                    s_new = phase * np.conj(h[j + 1]) / denom
                    h[j], h[j + 1] = phase * denom, 0.0
                else:
                    c_new, s_new = 1.0, 0.0
                cs[q, j], sn[q, j] = c_new, s_new
                gj = g[q, j]
                g[q, j], g[q, j + 1] = c_new * gj, -np.conj(s_new) * gj
                H[q, : j + 2, j] = h[: j + 2]
                res_est[q] = abs(g[q, j + 1])
            k = j + 1
            history.append(res_est.copy())
            newly = (~crossed) & ((res_est <= tol) | happy_any)
            cross_step[newly] = k
            crossed |= newly
            if verbose:
                print(f"  step {steps_total + k}: |g| = {res_est}")
            if np.all(crossed):
                break
        steps_total += k

        if k:
            y = np.zeros((Bn, m), cdt)
            for q in range(Bn):
                try:
                    y[q, :k] = np.linalg.solve(H[q, :k, :k], g[q, :k])
                except np.linalg.LinAlgError:
                    stalled[q] = True
                    y[q] = 0.0
                if not np.all(np.isfinite(y[q, :k])):
                    stalled[q] = True
                    y[q] = 0.0
                if stalled[q] and iters_out[q] == 0:
                    # the residual-bookkeeping loop below skips stalled
                    # members — record the steps they consumed here
                    iters_out[q] = steps_total
            y_pair = CArray(jnp.asarray(np.real(y), B_pair.re.dtype),
                            jnp.asarray(np.imag(y), B_pair.re.dtype))
            x_pair = form_x(x_pair, V_pair, y_pair)

        r_pair, res_dev = resid(A_ops, M_ops, B_pair, x_pair)
        res_true = _get(res_dev).astype(np.float64)
        for q in range(Bn):
            if converged[q] or stalled[q]:
                continue
            if res_true[q] <= tol[q]:
                converged[q] = True
                iters_out[q] = steps_total - k + int(cross_step[q] or k)
            elif happy_any[q] or res_true[q] >= beta[q] or k == 0 \
                    or not np.isfinite(res_true[q]):
                stalled[q] = True
                iters_out[q] = steps_total
            beta[q] = res_true[q]
        if verbose:
            print(f"cycle end: steps={steps_total} |Mr| = {res_true}")

    iters_out[~(converged | stalled)] = steps_total
    hist = (np.stack(history, axis=1) if history
            else np.zeros((Bn, 0), np.float64))
    return KrylovResult(x=x_pair,
                        iterations=jnp.asarray(iters_out),
                        converged=jnp.asarray(converged),
                        breakdown=jnp.asarray(stalled),
                        residual_norm=jnp.asarray(beta),
                        history=jnp.asarray(hist))
