"""Tests for the TPU precision story: df32 primitives, compensated
residuals, mixed-precision IR-GMRES, and preconditioner refinement
(SURVEY.md section 7.3 item 3; VERDICT round 1 item 1).

All f32/complex64 computations here exercise exactly the arithmetic the TPU
runs; float64/complex128 references are the oracles (x64 is on in
conftest).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helmholtz_tpu.core.df32 import (DF32, stencil_residual_comp, two_prod,
                                     two_sum)


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=1000) * 1e6, jnp.float32)
    b = jnp.asarray(rng.normal(size=1000), jnp.float32)
    s, e = jax.jit(two_sum)(a, b)
    # f64 add of two f32 values is exact, so s + e must reproduce it exactly
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=1000) * 1e3, jnp.float32)
    b = jnp.asarray(rng.normal(size=1000) * 1e-2, jnp.float32)
    p, e = jax.jit(two_prod)(a, b)
    # the product of two 24-bit mantissas fits f64 exactly
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_df32_accumulation_beats_f32():
    """Accumulating many small corrections: DF32 tracks f64, f32 drifts."""
    rng = np.random.default_rng(2)
    deltas = rng.normal(size=400).astype(np.float32) * 1e-4
    x0 = jnp.asarray(rng.normal(size=()) * 10, jnp.float32)

    acc = DF32(x0, jnp.zeros_like(x0))
    plain = x0
    for d in deltas:
        acc = acc.add(jnp.float32(d))
        plain = plain + jnp.float32(d)
    exact = float(np.float64(x0) + np.sum(deltas.astype(np.float64)))
    err_df = abs(float(acc.hi) + float(acc.lo) - exact)
    err_f32 = abs(float(plain) - exact)
    assert err_df < 1e-10
    assert err_df < err_f32 / 50


def _small_problem(n=31, cdtype=jnp.complex64):
    from helmholtz_tpu.driver import _assemble_stage
    wf = jnp.result_type(float)
    (A_pair, hm_pair, f_pair), _ = _assemble_stage(
        jnp.asarray(4.0, wf), jnp.asarray(30.0, wf), jnp.asarray(2.0, wf),
        n=n, b=12, problem="c1_f1", fidelity="as-shipped", cdtype=cdtype)
    return A_pair, hm_pair, f_pair


def test_compensated_residual_accuracy():
    """r = b - A x compensated in complex64 must track the complex128
    oracle far below the plain-f32 cancellation floor."""
    from helmholtz_tpu.core.complexlib import complexify, tree_to_np
    from helmholtz_tpu.ops.spmv import stencil_matvec

    n = 31
    A_pair, _, f_pair = _small_problem(n)
    A = complexify(A_pair)
    f = complexify(f_pair).reshape(n, n)

    # an x whose residual is small: a few digits of the true solution
    A_np = tree_to_np(A_pair)
    import scipy.sparse.linalg as spla
    from helmholtz_tpu.core.sparse import Stencil5
    A128 = Stencil5(cc=A_np.cc, cw=A_np.cw, ce=A_np.ce, cs=A_np.cs,
                    cn=A_np.cn)
    x128 = spla.spsolve(A128.toscipy().tocsc(),
                        f_pair.to_np().reshape(-1)).reshape(n, n)
    x_hi = jnp.asarray(x128.astype(np.complex64))
    x_lo = jnp.asarray((x128 - np.asarray(x_hi, np.complex128))
                       .astype(np.complex64))

    r_comp = np.asarray(
        jax.jit(stencil_residual_comp)(A, f, DF32(x_hi, x_lo)),
        np.complex128)
    r_plain = np.asarray(f - stencil_matvec(A, x_hi + x_lo), np.complex128)

    # complex128 oracle residual of the SAME complex64 operator and x pair
    def mv128(u):
        from helmholtz_tpu.driver import _host_stencil_matvec
        return _host_stencil_matvec(A_np, u)

    x_full = (np.asarray(x_hi, np.complex128)
              + np.asarray(x_lo, np.complex128))
    r_exact = f_pair.to_np().reshape(n, n).astype(np.complex128) \
        - mv128(x_full)
    fnorm = np.linalg.norm(np.asarray(f))
    err_comp = np.linalg.norm(r_comp - r_exact) / fnorm
    err_plain = np.linalg.norm(r_plain - r_exact) / fnorm
    assert err_comp < 1e-10
    assert err_comp < err_plain / 100


def test_ir_gmres_beats_f32_floor_in_complex64():
    """The mixed-precision path converges past the f32 floor (preconditioned
    legacy semantics) in complex64 where plain f32 GMRES stalls, with an
    iteration count within +1 of the complex128 oracle run.  (At n=63 the
    plain-f32 floor sits near rtol 1e-8 — at n=1023 it is already ~1e-6,
    measured — so the test pins rtol below it.)"""
    from helmholtz_tpu.driver import run_solver

    rtol = 1e-9
    kw = dict(problem="c1_f1", maxiter=60, complex_dtype=jnp.complex64)
    r_plain = run_solver(63, 12, 8.0, 61.0, rtol=rtol, **kw)
    r_ir = run_solver(63, 12, 8.0, 61.0, rtol=rtol, precision="ir-df32",
                      **kw)
    r_oracle = run_solver(63, 12, 8.0, 61.0, rtol=rtol,
                          problem="c1_f1", maxiter=60,
                          complex_dtype=jnp.complex128)
    assert not r_plain.converged          # the f32 floor (measured ~5e-6)
    assert r_ir.converged
    assert r_oracle.converged
    assert r_ir.iterations <= r_oracle.iterations + 1
    # preconditioned residual actually met the tolerance scale
    assert r_ir.residual_norm < r_plain.residual_norm


def test_precond_refine_reduces_iterations():
    from helmholtz_tpu.driver import run_solver

    kw = dict(problem="c1_f1", maxiter=60, complex_dtype=jnp.complex64)
    r0 = run_solver(63, 12, 8.0, 61.0, rtol=1e-3, **kw)
    r1 = run_solver(63, 12, 8.0, 61.0, rtol=1e-3, precond_refine=1, **kw)
    assert r0.converged and r1.converged
    assert r1.iterations <= r0.iterations
    assert r1.true_residual < 2e-3


def test_ir_gmres_history_concatenates():
    """History from IR cycles is a usable global residual history."""
    from helmholtz_tpu.driver import run_solver

    r = run_solver(31, 12, 4.0, 30.0, rtol=1e-6, precision="ir-df32",
                   maxiter=60, complex_dtype=jnp.complex64)
    assert r.converged
    h = r.history
    assert h.size >= r.iterations
    assert np.all(np.isfinite(h[:r.iterations]))
    # monotone-ish: last recorded inner residual below the first
    assert h[r.iterations - 1] < h[0]


def test_bf16_g_storage_converges():
    """Reduced-precision G storage (setup_preconditioner g_dtype=bf16):
    iteration counts match the f32-stored G within +2 (measured identical
    at n=511 on chip), and the Pallas-layout apply path accepts the mixed
    dtype."""
    from helmholtz_tpu.driver import run_solver

    kw = dict(problem="c1_f1", maxiter=60, complex_dtype=jnp.complex64,
              rtol=1e-3)
    r32 = run_solver(63, 12, 8.0, 61.0, g_dtype="f32", **kw)
    rbf = run_solver(63, 12, 8.0, 61.0, g_dtype="bf16", **kw)
    assert r32.converged and rbf.converged
    assert rbf.iterations <= r32.iterations + 2
    assert rbf.true_residual < 5e-3


def test_bf16_g_pallas_sweep_matches_xla():
    """The Pallas sweep kernel (interpret mode) with bf16-stored G agrees
    with the XLA scan path on the same bf16 G."""
    from helmholtz_tpu import HelmholtzConfig, assemble_problem
    from helmholtz_tpu.fd import stencil as fd_stencil
    from helmholtz_tpu.precond import setup_preconditioner
    from helmholtz_tpu.precond.sweeping import apply_preconditioner

    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1", complex_dtype=jnp.complex64)
    hm = fd_stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                      cfg.omega, cfg.h, prob.c_full,
                                      fidelity=cfg.fidelity,
                                      complex_dtype=jnp.complex64)
    P_ = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=True,
                              g_dtype=jnp.bfloat16)
    assert P_.G.re.dtype == jnp.bfloat16
    rng = np.random.default_rng(5)
    f = jnp.asarray((rng.standard_normal((cfg.n, cfg.n))
                     + 1j * rng.standard_normal((cfg.n, cfg.n)))
                    .astype(np.complex64))
    u_xla = np.asarray(apply_preconditioner(P_, f, impl="xla"))
    u_pal = np.asarray(apply_preconditioner(P_, f, impl="pallas"))
    np.testing.assert_allclose(u_pal, u_xla, rtol=2e-2,
                               atol=2e-2 * np.abs(u_xla).max())
