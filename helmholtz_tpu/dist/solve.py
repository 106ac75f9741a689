"""Distributed preconditioned solve over a layer-partitioned mesh.

One `shard_map` wraps the entire GMRES loop: the matvec is the
halo-exchange stencil SpMV, the preconditioner is the staged distributed
sweep, and every Krylov inner product is a `psum` over the mesh axis
(SURVEY.md section 2.3).  No per-iteration host round-trips, no
gather-to-one-device: vectors, stencil fields, and the G factor stack stay
sharded for the whole solve — the multi-chip memory scaling that breaks the
reference's 15 GB wall.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.complexlib import complexify, pairify
from ..core.sparse import Stencil5, Stencil9
from ..solve.gmres import KrylovResult, gmres
from .partition import (LAYER_AXIS, DistSweepState, DistSweepState9,
                        shard_problem, state_partition_specs)
from .spmv import halo_stencil9_matvec, halo_stencil_matvec
from .sweep import dist_apply_preconditioner, dist_apply_preconditioner9

_SOLVE_CACHE: dict = {}


def distributed_solve(mesh: Mesh, A: Stencil5 | Stencil9,
                      state: DistSweepState | DistSweepState9 | None,
                      f_grid: jax.Array, *, rtol: float = 1e-3,
                      restart: int = 20, maxiter: int = 200,
                      axis_name: str = LAYER_AXIS,
                      sweep_impl: str = "auto",
                      precision: str = "f32",
                      precond_refine: int = 0,
                      inner_rtol: float = 1e-2) -> KrylovResult:
    """Row-shard the problem on `mesh` and run distributed GMRES.

    `precision="ir-df32"` runs mixed-precision iterative refinement
    (solve.ir.ir_gmres) with the HALO-exchanged compensated residual
    (core.df32.halo_stencil_residual_comp) — the path that reaches
    rtol 1e-6 in f32, now available distributed (VERDICT round 2 item 5).
    `precond_refine` applies Newton refinement to the preconditioner
    exactly like driver._solve_stage.

    f_grid: (L, n), or (B, L, n) for a batch of right-hand sides — the
    batch is vmapped through the solver while every preconditioner
    application rides ONE staged schedule and one pass of the local G
    shards (dist_apply_preconditioner's batched path, dispatched through a
    custom-vmap rule exactly like the single-chip
    `precond.sweeping.batchable_operator`).

    Returns a KrylovResult whose `x` is the global (sharded) flat solution
    as a split-real `CArray` pair (batch leading when batched) — complex
    buffers cannot rest on the TPU backend; use `x.cplx` in flight or
    `x.to_np()` on the host.  Constraints: L % n_devices == 0 and (with a
    preconditioner) b < L // n_devices, so the F band lives on device 0.
    """
    L, n = A.cc.shape
    ndev = mesh.shape[axis_name]
    if L % ndev:
        raise ValueError(f"grid rows {L} not divisible by {ndev} devices")
    n_loc = L // ndev
    use_precond = state is not None
    if use_precond and state.b >= n_loc:
        raise ValueError(
            f"PML width b={state.b} must be < rows-per-device {n_loc}")
    from ..core.complexlib import CArray
    f_leaf = f_grid.re if isinstance(f_grid, CArray) else f_grid
    batched = f_leaf.ndim == 3
    nine = isinstance(A, Stencil9)

    A_sh, state_sh, f_sh = shard_problem(
        mesh, A, state if use_precond else _empty_state(A), f_grid,
        axis_name, f_axis=1 if batched else 0)

    # distributed_solve is a host-level entry point called repeatedly by
    # benchmarks and sweeps — cache the jitted shard_map executable by its
    # static configuration so repeat calls do not retrace/recompile
    # (jax.jit keys on function identity, and local_solve is a fresh
    # closure per call).
    cache_key = (mesh, axis_name, L, n, ndev, use_precond, batched, nine,
                 f_grid.shape, str(f_grid.dtype), str(A.cc.dtype),
                 state_sh.b, state_sh.d2_replace, state_sh.g_stride,
                 restart, float(rtol),
                 int(maxiter), sweep_impl, precision, int(precond_refine),
                 float(inner_rtol))
    cached = _SOLVE_CACHE.get(cache_key)
    if cached is not None:
        return cached(A_sh, state_sh, f_sh)

    halo_mv = halo_stencil9_matvec if nine else halo_stencil_matvec
    apply_fn = (dist_apply_preconditioner9 if nine
                else dist_apply_preconditioner)

    def local_solve(A_pair, S_loc, f_pair):
        # pairs at rest, complex in flight (core.complexlib): inputs arrive
        # as split-real shards, outputs leave as split-real shards
        A_loc = complexify(A_pair)
        f_loc = complexify(f_pair)

        def matvec(v):
            return halo_mv(
                A_loc, v.reshape(n_loc, n), axis_name, ndev).reshape(-1)

        M = None
        if use_precond:
            def apply_one(v):
                return apply_fn(
                    S_loc, v.reshape(n_loc, n), axis_name=axis_name,
                    n_devices=ndev, n_rows_global=L,
                    impl=sweep_impl).reshape(-1)

            if batched:
                # the batched dispatch must receive the (shard_map-traced)
                # state leaves as explicit custom_vmap arguments — closing
                # over them leaks tracers into the vmap rule
                s_leaves, s_tree = jax.tree.flatten(S_loc)

                @jax.custom_batching.custom_vmap
                def M_impl(v, *leaves):
                    S_ = jax.tree.unflatten(s_tree, leaves)
                    return apply_fn(
                        S_, v.reshape(n_loc, n), axis_name=axis_name,
                        n_devices=ndev, n_rows_global=L,
                        impl=sweep_impl).reshape(-1)

                @M_impl.def_vmap
                def _rule(axis_size, in_batched, v, *leaves):
                    S_ = jax.tree.unflatten(s_tree, leaves)
                    out = apply_fn(
                        S_, v.reshape(axis_size, n_loc, n),
                        axis_name=axis_name, n_devices=ndev,
                        n_rows_global=L, impl=sweep_impl)
                    return (out.reshape(axis_size, n_loc * n),
                            True)

                M = lambda v: M_impl(v, *s_leaves)
            else:
                M = apply_one

            if precond_refine:
                # Newton refinement of the preconditioner solve, same as
                # driver._solve_stage: M_k+1 = M_k + M (I - A M_k) squares
                # the deviation from A^{-1} per step
                M0 = M

                def M(v):
                    u = M0(v)
                    for _ in range(precond_refine):
                        u = u + M0(v - matvec(u))
                    return u

        if precision == "ir-df32":
            from ..core.df32 import (DF32, halo_stencil9_residual_comp,
                                     halo_stencil_residual_comp)
            from ..solve.ir import ir_gmres

            halo_rc = (halo_stencil9_residual_comp if nine
                       else halo_stencil_residual_comp)

            def solver(f):
                def residual_comp(x):
                    r = halo_rc(
                        A_loc, f.reshape(n_loc, n),
                        DF32(x.hi.reshape(n_loc, n), x.lo.reshape(n_loc, n)),
                        axis_name, ndev)
                    return r.reshape(-1)

                return ir_gmres(matvec, residual_comp, f, M=M, rtol=rtol,
                                restart=restart, maxiter=maxiter,
                                inner_rtol=inner_rtol, axis_name=axis_name)
        elif precision == "f32":
            solver = partial(gmres, matvec, M=M, restart=restart, rtol=rtol,
                             maxiter=maxiter, axis_name=axis_name)
        else:
            raise ValueError(f"unknown precision {precision!r}")
        if batched:
            res = jax.vmap(lambda f: solver(f.reshape(-1)))(f_loc)
        else:
            res = solver(f_loc.reshape(-1))
        return pairify(res)

    row = P(axis_name) if not batched else P(None, axis_name)
    repl = P()
    in_specs = (
        jax.tree.map(lambda _: P(axis_name), A_sh),
        state_partition_specs(state_sh, axis_name),
        row,
    )
    out_specs = KrylovResult(
        x=row, iterations=repl, converged=repl, breakdown=repl,
        residual_norm=repl, history=repl)

    fn = jax.jit(jax.shard_map(local_solve, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False))
    _SOLVE_CACHE[cache_key] = fn
    return fn(A_sh, state_sh, f_sh)


def _empty_state(A):
    """Placeholder state for the unpreconditioned path (never applied)."""
    from ..core.complexlib import CArray

    L, n = A.cc.shape
    rdt = A.cc.real.dtype
    z = lambda *s: CArray(jnp.zeros(s, rdt), jnp.zeros(s, rdt))
    if isinstance(A, Stencil9):
        return DistSweepState9(G_pad=z(L, 1, 1), TF=z(1, 1, 1),
                               hf_l=z(1, 3, 1), hf_u=z(1, 3, 1),
                               a_l=z(L, 3, 1), a_u=z(L, 3, 1),
                               b=1, d2_replace=True)
    return DistSweepState(G_pad=z(L, 1, 1), TF=z(1, 1, 1), hf_cs=z(1, 1),
                          hf_cn=z(1, 1), a_cs=z(L, 1), a_cn=z(L, 1),
                          b=1, d2_replace=True)
