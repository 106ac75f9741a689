"""Distributed assembly + factorization: setup memory scales with devices.

Round 2's distributed path required the G factor stack to be built on ONE
device before sharding (`dist_state_from_preconditioner`) — the apply
scaled, the setup did not, so grids whose full G exceeds one chip's HBM
(2048^2: ~67 GB f32 / ~33 GB bf16) could not be factored at all (VERDICT
round 2, Missing #1).

This module closes that gap.  The per-m subgrid factorizations are
embarrassingly parallel (`/root/reference/code.py:349-352`, SURVEY.md
section 3.3) and the assembly of any row band needs only the replicated
(n+2, n+2) velocity field plus scalar parameters — so inside one
`shard_map` each device:

  1. assembles its own band of the global operator A
     (`fd.stencil.build_a_stencil_rows`);
  2. assembles its ROW-ALIGNED band of the moving-PML subgrid family
     (`build_hm_stencils_rows` — entry k is the H_m acting on global row
     rows[k], so shard boundaries coincide with the row shards);
  3. factors that band into its G_pad shard
     (`precond.sweeping.factor_corner_inverses`, F rows zeroed);
  4. computes the small replicated H_F block-Thomas factors locally
     (every device derives the identical T_F from the same scalars —
     cheaper than factoring on device 0 and broadcasting).

No single-device G stack, no gather, no per-band communication: total
setup memory is ~(1/D)-th of the single-chip setup per device, which is
what unblocks the 2048^2 BASELINE configs on >= 4 chips (bench.plan).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.complexlib import CArray, pairify
from ..fd import problems as fd_problems
from ..fd import stencil as fd_stencil
from ..precond.sweeping import _schur_t_stack, factor_corner_inverses
from .partition import LAYER_AXIS, DistSweepState

_SETUP_CACHE: dict = {}

_G_DTYPES = {"working": None, "f32": jnp.float32, "bf16": jnp.bfloat16}


def distributed_setup(mesh: Mesh, n: int, b: int, wave_num, const,
                      alpha=2.0, problem: str = "c1_f1", *,
                      fidelity: str = "corrected",
                      g_dtype: str = "working",
                      hf_full_coupling: bool = True,
                      d2_replace: bool = True,
                      setup_chunk: int = 128,
                      pad_lanes: bool | None = None,
                      complex_dtype=None,
                      axis_name: str = LAYER_AXIS):
    """Assemble AND factor the problem with every device owning only its
    row band — the distributed `algo2_3` (code.py:345-353).

    Returns `(A_sh, state_sh, f_sh)`: the row-sharded operator stencil
    (split-real pairs), a row-sharded `DistSweepState` ready for
    `distributed_solve`, and the row-sharded RHS grid — all already placed
    on `mesh`, G never materialized whole anywhere.

    Static configuration is compile-time; (wave_num, const, alpha) are
    traced, so frequency/C sweeps reuse the compiled executable (the same
    contract as driver._assemble_stage/_factor_stage).
    """
    ndev = mesh.shape[axis_name]
    if n % ndev:
        raise ValueError(f"grid rows {n} not divisible by {ndev} devices")
    n_loc = n // ndev
    if b >= n_loc:
        raise ValueError(f"PML width b={b} must be < rows-per-device {n_loc}")
    if complex_dtype is None:
        from ..driver import default_complex_dtype
        complex_dtype = default_complex_dtype()
    if pad_lanes is None:
        pad_lanes = jax.default_backend() == "tpu"
    n_pad = (-(-n // 128) * 128) if pad_lanes else n
    gdt = _G_DTYPES[g_dtype] or jnp.finfo(
        jnp.result_type(complex_dtype, jnp.float32)).dtype

    wf = jnp.result_type(float)
    cache_key = (mesh, axis_name, n, b, problem, fidelity, g_dtype,
                 hf_full_coupling, d2_replace, int(setup_chunk),
                 bool(pad_lanes), str(jnp.dtype(complex_dtype)))
    fn = _SETUP_CACHE.get(cache_key)
    if fn is not None:
        return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
                  jnp.asarray(alpha, wf))

    cdtype = complex_dtype

    def local_setup(wn, C, al):
        d = jax.lax.axis_index(axis_name)
        rows = d * n_loc + jnp.arange(n_loc)          # global 0-based rows
        omega = (2.0 * jnp.pi * wn + 1j * al).astype(cdtype)
        h = 1.0 / (n + 1)
        eta = b * h
        c_full, f_grid = fd_problems.PROBLEMS[problem](
            omega, n, complex_dtype=cdtype)
        f_loc = jax.lax.dynamic_slice_in_dim(
            f_grid.astype(cdtype), d * n_loc, n_loc, 0)

        A_loc = fd_stencil.build_a_stencil_rows(
            rows, n, b, C, eta, omega, h, c_full,
            fidelity=fidelity, complex_dtype=cdtype)
        HF = fd_stencil.build_hf_stencil(
            n, b, C, eta, omega, h, c_full,
            full_coupling=hf_full_coupling, fidelity=fidelity,
            complex_dtype=cdtype)
        TF = _schur_t_stack(HF)

        hm_loc = fd_stencil.build_hm_stencils_rows(
            rows, n, b, C, eta, omega, h, c_full,
            fidelity=fidelity, complex_dtype=cdtype)
        G_loc = factor_corner_inverses(
            hm_loc, n_pad=n_pad, g_dtype=gdt, setup_chunk=setup_chunk,
            zero_mask=rows < b)

        state = DistSweepState(
            G_pad=G_loc, TF=CArray.of(TF),
            hf_cs=CArray.of(HF.cs), hf_cn=CArray.of(HF.cn),
            a_cs=CArray.of(A_loc.cs), a_cn=CArray.of(A_loc.cn),
            b=b, d2_replace=d2_replace)
        return pairify(A_loc), state, pairify(f_loc)

    row = P(axis_name)
    repl = P()
    # probe the output pytree once (abstract eval) to build matching specs
    out_specs = (
        jax.tree.map(lambda _: row, _a_stencil_struct()),
        DistSweepState(
            G_pad=CArray(row, row), TF=CArray(repl, repl),
            hf_cs=CArray(repl, repl), hf_cn=CArray(repl, repl),
            a_cs=CArray(row, row), a_cn=CArray(row, row),
            b=b, d2_replace=d2_replace),
        CArray(row, row),
    )

    fn = jax.jit(jax.shard_map(
        local_setup, mesh=mesh, in_specs=(repl, repl, repl),
        out_specs=out_specs, check_vma=False))
    _SETUP_CACHE[cache_key] = fn
    return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
              jnp.asarray(alpha, wf))


def _a_stencil_struct():
    """A Stencil5-of-CArray skeleton for building out_specs trees."""
    from ..core.sparse import Stencil5

    leaf = CArray(0, 0)
    return Stencil5(cc=leaf, cw=leaf, ce=leaf, cs=leaf, cn=leaf)
