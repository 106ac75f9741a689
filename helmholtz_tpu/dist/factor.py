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

Round 4: the single-chip strided (`factor_stride`) and sample-compressed
(`g_compress`) setup wins COMPOSE with this path — each device factors
only the globally-anchored samples bracketing its band (positions and
weights identical to `precond.sweeping._factor_strided`, so the factors
are leaf-exact vs the single-chip strided stack), and compressed bands
keep only the sample panels with per-row weights applied in the sweep
kernels (`bench.plan.plan_distributed` budgets the 2047/8-device/stride-8
point: ~13% of dense setup flops, 0.57 GB G per device vs 4.3 GB dense).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.complexlib import CArray, pairify
from ..fd import problems as fd_problems
from ..fd import stencil as fd_stencil
from ..precond.sweeping import _schur_t_stack, factor_corner_inverses
from .partition import (LAYER_AXIS, DistSweepState, DistSweepState9,
                        state_partition_specs)

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
                      factor_stride: int = 1,
                      g_compress: bool = False,
                      complex_dtype=None,
                      axis_name: str = LAYER_AXIS):
    """Assemble AND factor the problem with every device owning only its
    row band — the distributed `algo2_3` (code.py:345-353).

    Returns `(A_sh, state_sh, f_sh)`: the row-sharded operator stencil
    (split-real pairs), a row-sharded `DistSweepState` ready for
    `distributed_solve`, and the row-sharded RHS grid — all already placed
    on `mesh`, G never materialized whole anywhere.

    `factor_stride` > 1 factors only the globally-anchored sample subgrids
    (k = 0 mod stride in sweep space, plus the endpoint) that fall in each
    device's band — per-device setup flops drop ~stride-fold, composing
    the single-chip strided setup win with the distributed memory scaling
    (VERDICT round 3, Missing #1).  Each device factors its own bracketing
    samples (any device can assemble any subgrid from the replicated
    velocity field), so no sample ever crosses a shard boundary.  Sample
    positions and interpolation weights are IDENTICAL to the single-chip
    strided path, so the resulting factors match it leaf-for-leaf.

    `g_compress=True` (requires factor_stride > 1) keeps only the sample
    panels per device (at-rest factor memory drops ~stride-fold on every
    device — the 2048^2 configs 4/5 point) with per-row weights applied
    in the sweep kernels; values equal the expanded strided stack, so
    iteration counts match the compressed single-chip path exactly.

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
    M = n - b
    R = int(factor_stride)
    if R > 1 and M <= R:
        if g_compress:
            raise ValueError(
                f"grid too small for the requested stride: M = n - b = {M} "
                f"sweep rows cannot be sampled at factor_stride = {R} "
                "(need M > stride); drop g_compress or reduce the stride")
        R = 1                      # quietly exact — nothing to interpolate
    if R <= 1:
        R = 1
    if g_compress and R == 1:
        raise ValueError("g_compress requires factor_stride > 1")

    wf = jnp.result_type(float)
    cache_key = (mesh, axis_name, n, b, problem, fidelity, g_dtype,
                 hf_full_coupling, d2_replace, int(setup_chunk),
                 bool(pad_lanes), R, bool(g_compress),
                 str(jnp.dtype(complex_dtype)))
    fn = _SETUP_CACHE.get(cache_key)
    if fn is not None:
        return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
                  jnp.asarray(alpha, wf))

    cdtype = complex_dtype

    if R > 1:
        # static sample-window geometry (python ints): device d needs the
        # contiguous run of global samples bracketing its rows — windows
        # overlap by at most one sample; Ms_loc is the widest window
        # (band_sample_window is the shared geometry source, also used by
        # dist.partition and bench.plan)
        from ..precond.sweeping import band_sample_window

        Ms = (M - 1) // R + 2
        windows = [band_sample_window(M, R, max(d_ * n_loc, b) - b,
                                      (d_ + 1) * n_loc - 1 - b)
                   for d_ in range(ndev)]
        Ms_loc = max(s1 - s0 + 1 for s0, s1 in windows)

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

        g_w = g_lo = None
        g_stride = 0
        if R == 1:
            hm_loc = fd_stencil.build_hm_stencils_rows(
                rows, n, b, C, eta, omega, h, c_full,
                fidelity=fidelity, complex_dtype=cdtype)
            G_loc = factor_corner_inverses(
                hm_loc, n_pad=n_pad, g_dtype=gdt, setup_chunk=setup_chunk,
                zero_mask=rows < b)
        else:
            # strided: factor only this band's bracketing samples (same
            # positions/weights as sweeping._factor_strided — leaf-exact
            # vs the single-chip strided stack)
            s0 = jnp.minimum((jnp.maximum(d * n_loc, b) - b) // R, Ms - 2)
            sidx = jnp.minimum(s0 + jnp.arange(Ms_loc), Ms - 1)
            pos = jnp.minimum(sidx * R, M - 1)        # sample k positions
            hm_s = fd_stencil.build_hm_stencils_rows(
                b + pos, n, b, C, eta, omega, h, c_full,
                fidelity=fidelity, complex_dtype=cdtype)
            sample_dt = gdt if g_compress else wf
            Gs = factor_corner_inverses(
                hm_s, n_pad=n_pad, g_dtype=sample_dt,
                setup_chunk=setup_chunk)
            k = jnp.clip(rows - b, 0, M - 1)
            valid = rows >= b
            lo_g = jnp.minimum(k // R, Ms - 2)
            lo_loc = jnp.where(valid, lo_g - s0, 0).astype(jnp.int32)
            pos_lo = jnp.minimum(lo_g * R, M - 1)
            pos_hi = jnp.minimum((lo_g + 1) * R, M - 1)
            t = ((k - pos_lo) / jnp.maximum(pos_hi - pos_lo, 1)).astype(wf)
            if g_compress:
                w = jnp.where(valid[:, None],
                              jnp.stack([1.0 - t, t], axis=1), 0.0)
                G_loc = Gs
                g_w = w.astype(jnp.float32)
                g_lo = lo_loc
                g_stride = R
            else:
                take = lambda a, i: jnp.take(a, i, axis=0)
                tt = t[:, None, None]
                mask = valid[:, None, None]

                def expand(a):
                    dense = ((1.0 - tt) * take(a, lo_loc)
                             + tt * take(a, lo_loc + 1))
                    return jnp.where(mask, dense, 0).astype(gdt)

                G_loc = CArray(expand(Gs.re), expand(Gs.im))

        state = DistSweepState(
            G_pad=G_loc, TF=CArray.of(TF),
            hf_cs=CArray.of(HF.cs), hf_cn=CArray.of(HF.cn),
            a_cs=CArray.of(A_loc.cs), a_cn=CArray.of(A_loc.cn),
            b=b, d2_replace=d2_replace,
            g_w=g_w, g_lo=g_lo, g_stride=g_stride)
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
            b=b, d2_replace=d2_replace,
            g_w=row if g_compress else None,
            g_lo=row if g_compress else None,
            g_stride=R if g_compress else 0),
        CArray(row, row),
    )

    fn = jax.jit(jax.shard_map(
        local_setup, mesh=mesh, in_specs=(repl, repl, repl),
        out_specs=out_specs, check_vma=False))
    _SETUP_CACHE[cache_key] = fn
    return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
              jnp.asarray(alpha, wf))


def distributed_setup9(mesh: Mesh, n: int, b: int, wave_num, const,
                       alpha=2.0, problem: str = "c1_f1", *,
                       gamma: float = 2.0 / 3.0,
                       fidelity: str = "corrected",
                       g_dtype: str = "working",
                       d2_replace: bool = True,
                       setup_chunk: int = 128,
                       pad_lanes: bool | None = None,
                       factor_stride: int = 1,
                       g_compress: bool = False,
                       complex_dtype=None,
                       axis_name: str = LAYER_AXIS):
    """Distributed 9-POINT assembly + factorization: `distributed_setup`
    with the tridiagonal-coupling Schur recursion
    (precond.sweeping9._schur_corner_inverse9) factoring each device's
    row-aligned band of the 9-point subgrid family, and coupling TRIPLES
    in the state.  Composes the full strided / sample-compressed layout
    exactly like the 5-point path (identical global sample anchoring, so
    factors are leaf-exact vs the single-chip 9-point strided stack).
    Closes the last leg of the round-4 '9-point island' (VERDICT round 4,
    Missing #1 / next-round task 1d)."""
    from ..precond.sweeping9 import (_coupling_triples,
                                     _schur_corner_inverse9,
                                     _schur_t_stack9)

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
    M = n - b
    R = int(factor_stride)
    if R > 1 and M <= R:
        if g_compress:
            raise ValueError(
                f"grid too small for the requested stride: M = {M} sweep "
                f"rows cannot be sampled at factor_stride = {R}")
        R = 1
    if R <= 1:
        R = 1
    if g_compress and R == 1:
        raise ValueError("g_compress requires factor_stride > 1")

    wf = jnp.result_type(float)
    cache_key = ("9pt", mesh, axis_name, n, b, problem, float(gamma),
                 fidelity, g_dtype, d2_replace, int(setup_chunk),
                 bool(pad_lanes), R, bool(g_compress),
                 str(jnp.dtype(complex_dtype)))
    fn = _SETUP_CACHE.get(cache_key)
    if fn is not None:
        return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
                  jnp.asarray(alpha, wf))

    cdtype = complex_dtype

    if R > 1:
        from ..precond.sweeping import band_sample_window

        Ms = (M - 1) // R + 2
        windows = [band_sample_window(M, R, max(d_ * n_loc, b) - b,
                                      (d_ + 1) * n_loc - 1 - b)
                   for d_ in range(ndev)]
        Ms_loc = max(s1 - s0 + 1 for s0, s1 in windows)

    def local_setup(wn, C, al):
        d = jax.lax.axis_index(axis_name)
        rows = d * n_loc + jnp.arange(n_loc)
        omega = (2.0 * jnp.pi * wn + 1j * al).astype(cdtype)
        h = 1.0 / (n + 1)
        eta = b * h
        c_full, f_grid = fd_problems.PROBLEMS[problem](
            omega, n, complex_dtype=cdtype)
        # Mehrstellen RHS filter BEFORE slicing (the full f is already
        # replicated per device; zero extra communication)
        f_flt = fd_stencil.mass_filter9(n, b, C, eta, omega, h,
                                        f_grid.astype(cdtype))
        f_loc = jax.lax.dynamic_slice_in_dim(f_flt, d * n_loc, n_loc, 0)

        A_loc = fd_stencil.build_a_stencil9_rows(
            rows, n, b, C, eta, omega, h, c_full, gamma=gamma,
            fidelity=fidelity, complex_dtype=cdtype)
        HF = fd_stencil.build_hf_stencil9(
            n, b, C, eta, omega, h, c_full, gamma=gamma,
            fidelity=fidelity, complex_dtype=cdtype)
        TF = _schur_t_stack9(HF)
        TF = CArray(TF.real.astype(gdt), TF.imag.astype(gdt))
        hf_lo, hf_up = _coupling_triples(HF)
        a_lo, a_up = _coupling_triples(A_loc)

        g_w = g_lo = None
        g_stride = 0
        if R == 1:
            # row-aligned family: F rows get a valid clamped subgrid whose
            # corner inverse is zeroed (the G_pad convention)
            hm_loc = fd_stencil.build_hm_stencils9(
                n, b, C, eta, omega, h, c_full, gamma=gamma,
                fidelity=fidelity, complex_dtype=cdtype,
                rows=jnp.maximum(rows, b))
            G_loc = factor_corner_inverses(
                hm_loc, n_pad=n_pad, g_dtype=gdt, setup_chunk=setup_chunk,
                zero_mask=rows < b, corner_fn=_schur_corner_inverse9)
        else:
            s0 = jnp.minimum((jnp.maximum(d * n_loc, b) - b) // R, Ms - 2)
            sidx = jnp.minimum(s0 + jnp.arange(Ms_loc), Ms - 1)
            pos = jnp.minimum(sidx * R, M - 1)
            hm_s = fd_stencil.build_hm_stencils9(
                n, b, C, eta, omega, h, c_full, gamma=gamma,
                fidelity=fidelity, complex_dtype=cdtype, rows=b + pos)
            sample_dt = gdt if g_compress else wf
            Gs = factor_corner_inverses(
                hm_s, n_pad=n_pad, g_dtype=sample_dt,
                setup_chunk=setup_chunk,
                corner_fn=_schur_corner_inverse9)
            k = jnp.clip(rows - b, 0, M - 1)
            valid = rows >= b
            lo_g = jnp.minimum(k // R, Ms - 2)
            lo_loc = jnp.where(valid, lo_g - s0, 0).astype(jnp.int32)
            pos_lo = jnp.minimum(lo_g * R, M - 1)
            pos_hi = jnp.minimum((lo_g + 1) * R, M - 1)
            t = ((k - pos_lo) / jnp.maximum(pos_hi - pos_lo, 1)).astype(wf)
            if g_compress:
                w = jnp.where(valid[:, None],
                              jnp.stack([1.0 - t, t], axis=1), 0.0)
                G_loc = Gs
                g_w = w.astype(jnp.float32)
                g_lo = lo_loc
                g_stride = R
            else:
                take = lambda a, i: jnp.take(a, i, axis=0)
                tt = t[:, None, None]
                mask = valid[:, None, None]

                def expand(a):
                    dense = ((1.0 - tt) * take(a, lo_loc)
                             + tt * take(a, lo_loc + 1))
                    return jnp.where(mask, dense, 0).astype(gdt)

                G_loc = CArray(expand(Gs.re), expand(Gs.im))

        state = DistSweepState9(
            G_pad=G_loc, TF=TF,
            hf_l=CArray.of(hf_lo), hf_u=CArray.of(hf_up),
            a_l=CArray.of(a_lo), a_u=CArray.of(a_up),
            b=b, d2_replace=d2_replace,
            g_w=g_w, g_lo=g_lo, g_stride=g_stride)
        return pairify(A_loc), state, pairify(f_loc)

    row = P(axis_name)
    repl = P()
    state_spec = state_partition_specs(DistSweepState9(
        G_pad=CArray(0, 0), TF=CArray(0, 0),
        hf_l=CArray(0, 0), hf_u=CArray(0, 0),
        a_l=CArray(0, 0), a_u=CArray(0, 0),
        b=b, d2_replace=d2_replace,
        g_w=0 if g_compress else None,
        g_lo=0 if g_compress else None,
        g_stride=R if g_compress else 0), axis_name)
    out_specs = (
        jax.tree.map(lambda _: row, _a_stencil9_struct()),
        state_spec,
        CArray(row, row),
    )

    fn = jax.jit(jax.shard_map(
        local_setup, mesh=mesh, in_specs=(repl, repl, repl),
        out_specs=out_specs, check_vma=False))
    _SETUP_CACHE[cache_key] = fn
    return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
              jnp.asarray(alpha, wf))


def distributed_assemble9(mesh: Mesh, n: int, b: int, wave_num, const,
                          alpha=2.0, problem: str = "c1_f1", *,
                          gamma: float = 2.0 / 3.0,
                          fidelity: str = "corrected",
                          d2_replace: bool = True,
                          complex_dtype=None,
                          axis_name: str = LAYER_AXIS):
    """Per-band 9-point assembly + H_F9 factorization WITHOUT the G
    factorization — the cheap per-frequency work of an omega-amortized
    DISTRIBUTED 9-point sweep (`distributed_assemble` for Stencil9);
    `state.G_pad` is a placeholder the caller replaces with the
    omega-lerp of anchor sample shards."""
    from ..precond.sweeping9 import _coupling_triples, _schur_t_stack9

    ndev = mesh.shape[axis_name]
    if n % ndev:
        raise ValueError(f"grid rows {n} not divisible by {ndev} devices")
    n_loc = n // ndev
    if b >= n_loc:
        raise ValueError(f"PML width b={b} must be < rows-per-device {n_loc}")
    if complex_dtype is None:
        from ..driver import default_complex_dtype
        complex_dtype = default_complex_dtype()
    wf = jnp.result_type(float)
    cache_key = ("assemble9", mesh, axis_name, n, b, problem, float(gamma),
                 fidelity, d2_replace, str(jnp.dtype(complex_dtype)))
    fn = _SETUP_CACHE.get(cache_key)
    if fn is not None:
        return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
                  jnp.asarray(alpha, wf))
    cdtype = complex_dtype

    def local_assemble(wn, C, al):
        d = jax.lax.axis_index(axis_name)
        rows = d * n_loc + jnp.arange(n_loc)
        omega = (2.0 * jnp.pi * wn + 1j * al).astype(cdtype)
        h = 1.0 / (n + 1)
        eta = b * h
        c_full, f_grid = fd_problems.PROBLEMS[problem](
            omega, n, complex_dtype=cdtype)
        f_flt = fd_stencil.mass_filter9(n, b, C, eta, omega, h,
                                        f_grid.astype(cdtype))
        f_loc = jax.lax.dynamic_slice_in_dim(f_flt, d * n_loc, n_loc, 0)
        A_loc = fd_stencil.build_a_stencil9_rows(
            rows, n, b, C, eta, omega, h, c_full, gamma=gamma,
            fidelity=fidelity, complex_dtype=cdtype)
        HF = fd_stencil.build_hf_stencil9(
            n, b, C, eta, omega, h, c_full, gamma=gamma,
            fidelity=fidelity, complex_dtype=cdtype)
        TF = _schur_t_stack9(HF)
        hf_lo, hf_up = _coupling_triples(HF)
        a_lo, a_up = _coupling_triples(A_loc)
        rdt = jnp.finfo(jnp.result_type(cdtype, jnp.float32)).dtype
        G_ph = CArray(jnp.zeros((n_loc, 1, 1), rdt),
                      jnp.zeros((n_loc, 1, 1), rdt))
        state = DistSweepState9(
            G_pad=G_ph, TF=CArray.of(TF),
            hf_l=CArray.of(hf_lo), hf_u=CArray.of(hf_up),
            a_l=CArray.of(a_lo), a_u=CArray.of(a_up),
            b=b, d2_replace=d2_replace)
        return pairify(A_loc), state, pairify(f_loc)

    row = P(axis_name)
    repl = P()
    out_specs = (
        jax.tree.map(lambda _: row, _a_stencil9_struct()),
        state_partition_specs(DistSweepState9(
            G_pad=CArray(0, 0), TF=CArray(0, 0),
            hf_l=CArray(0, 0), hf_u=CArray(0, 0),
            a_l=CArray(0, 0), a_u=CArray(0, 0),
            b=b, d2_replace=d2_replace), axis_name),
        CArray(row, row),
    )
    fn = jax.jit(jax.shard_map(
        local_assemble, mesh=mesh, in_specs=(repl, repl, repl),
        out_specs=out_specs, check_vma=False))
    _SETUP_CACHE[cache_key] = fn
    return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
              jnp.asarray(alpha, wf))


def distributed_assemble(mesh: Mesh, n: int, b: int, wave_num, const,
                         alpha=2.0, problem: str = "c1_f1", *,
                         fidelity: str = "corrected",
                         d2_replace: bool = True,
                         hf_full_coupling: bool = True,
                         complex_dtype=None,
                         axis_name: str = LAYER_AXIS):
    """Per-band assembly + H_F factorization WITHOUT the G factorization —
    the cheap per-frequency work of an omega-amortized DISTRIBUTED sweep
    (driver.run_multisolve freq_anchor_every + mesh_devices): the caller
    replaces the returned state's placeholder G_pad with the omega-lerp of
    two anchor frequencies' per-band sample shards (same lerp tables —
    `compress_tables` is frequency-independent).

    Returns `(A_sh, state_sh, f_sh)` exactly like `distributed_setup`,
    except `state_sh.G_pad` is a (L, 1, 1) zero placeholder."""
    ndev = mesh.shape[axis_name]
    if n % ndev:
        raise ValueError(f"grid rows {n} not divisible by {ndev} devices")
    n_loc = n // ndev
    if b >= n_loc:
        raise ValueError(f"PML width b={b} must be < rows-per-device {n_loc}")
    if complex_dtype is None:
        from ..driver import default_complex_dtype
        complex_dtype = default_complex_dtype()
    wf = jnp.result_type(float)
    cache_key = ("assemble", mesh, axis_name, n, b, problem, fidelity,
                 hf_full_coupling, d2_replace, str(jnp.dtype(complex_dtype)))
    fn = _SETUP_CACHE.get(cache_key)
    if fn is not None:
        return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
                  jnp.asarray(alpha, wf))
    cdtype = complex_dtype

    def local_assemble(wn, C, al):
        d = jax.lax.axis_index(axis_name)
        rows = d * n_loc + jnp.arange(n_loc)
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
        rdt = jnp.finfo(jnp.result_type(cdtype, jnp.float32)).dtype
        G_ph = CArray(jnp.zeros((n_loc, 1, 1), rdt),
                      jnp.zeros((n_loc, 1, 1), rdt))
        state = DistSweepState(
            G_pad=G_ph, TF=CArray.of(TF),
            hf_cs=CArray.of(HF.cs), hf_cn=CArray.of(HF.cn),
            a_cs=CArray.of(A_loc.cs), a_cn=CArray.of(A_loc.cn),
            b=b, d2_replace=d2_replace)
        return pairify(A_loc), state, pairify(f_loc)

    row = P(axis_name)
    repl = P()
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
        local_assemble, mesh=mesh, in_specs=(repl, repl, repl),
        out_specs=out_specs, check_vma=False))
    _SETUP_CACHE[cache_key] = fn
    return fn(jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
              jnp.asarray(alpha, wf))


def _a_stencil_struct():
    """A Stencil5-of-CArray skeleton for building out_specs trees."""
    from ..core.sparse import Stencil5

    leaf = CArray(0, 0)
    return Stencil5(cc=leaf, cw=leaf, ce=leaf, cs=leaf, cn=leaf)


def _a_stencil9_struct():
    """A Stencil9-of-CArray skeleton for building out_specs trees."""
    from ..core.sparse import Stencil9

    leaf = CArray(0, 0)
    return Stencil9(cc=leaf, cw=leaf, ce=leaf, cs=leaf, cn=leaf,
                    csw=leaf, cse=leaf, cnw=leaf, cne=leaf)
