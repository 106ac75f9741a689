"""Batched Krylov solves: multi-RHS and multi-frequency.

The sweep recursion leaves the MXU underutilized for a single RHS
(SURVEY.md section 7.3 item 2); batching is the remedy (section 2.3
'batched RHS parallelism', BASELINE config 5).  `vmap` turns every scan
step's dense (n, n) matvec into an (n, n) x (n, B) matmul and the SpMV into
an SpMM — the whole solver, preconditioner included, vectorizes without new
kernels.

  * multi-RHS: one operator/preconditioner, a batch of forcings
    (e.g. many sources at one frequency);
  * multi-frequency: a batch of (A, P, f) triples — assembly, factorization,
    and solve all vmapped over the frequency axis (each frequency has its
    own operator and factor stack).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax

from .gmres import KrylovResult, gmres
from .bicgstab import bicgstab

_METHODS = {"gmres": gmres, "bicgstab": bicgstab}


def solve_multi_rhs(matvec: Callable, B: jax.Array, *,
                    M: Optional[Callable] = None,
                    method: str = "gmres", **kw) -> KrylovResult:
    """Solve A X = B for B of shape (batch, N).  Per-RHS convergence: each
    batch element runs its own iteration count (batched while_loop runs
    until the slowest member finishes; finished members idle).

    A SweepingPreconditioner passed as `M` is wrapped so the whole batch
    rides one stream of its G stack per application (custom vmap rule ->
    the batched Pallas sweep) instead of vmap re-reading the multi-GB
    factor stack per RHS; a RecomputeSweepingPreconditioner likewise
    shares one chunk-G rematerialization across the batch."""
    from ..precond.recompute import (RecomputeSweepingPreconditioner,
                                     batchable_recompute_operator)
    from ..precond.sweeping import SweepingPreconditioner, batchable_operator

    if isinstance(M, SweepingPreconditioner):
        M = batchable_operator(M)
    elif isinstance(M, RecomputeSweepingPreconditioner):
        M = batchable_recompute_operator(M)
    solver = _METHODS[method]
    return jax.vmap(lambda f: solver(matvec, f, M=M, **kw))(B)


def solve_multi_problem(matvecs_data, apply_matvec: Callable,
                        B: jax.Array, *,
                        precond_data=None, apply_precond=None,
                        method: str = "gmres", **kw) -> KrylovResult:
    """Solve a batch of independent systems {A_i x_i = b_i, M_i}.

    `matvecs_data` / `precond_data` are pytrees with a leading batch axis
    (e.g. batched Stencil5 fields, batched SweepingPreconditioner state);
    `apply_matvec(data_i, v)` / `apply_precond(pdata_i, v)` define the
    per-problem operators.  The multi-frequency sweep of the reference
    (sequential `run_solver` calls, code.py:574-592) becomes one vmapped
    solve."""
    solver = _METHODS[method]

    def one(data_i, pdata_i, f_i):
        mv = lambda v: apply_matvec(data_i, v)
        M = (lambda v: apply_precond(pdata_i, v)) if apply_precond else None
        return solver(mv, f_i, M=M, **kw)

    if precond_data is None:
        return jax.vmap(lambda d, f: one(d, None, f))(matvecs_data, B)
    return jax.vmap(one)(matvecs_data, precond_data, B)
