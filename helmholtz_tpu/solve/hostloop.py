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
