"""Sweeping-preconditioner oracles (SURVEY.md section 4):
factorization exactness, corner-inverse parity with dense linear algebra,
and the headline 2-3-iteration GMRES convergence (Appendix A verification
matrix)."""
import numpy as np
import pytest
import scipy.sparse.linalg

import jax.numpy as jnp

from helmholtz_tpu import HelmholtzConfig, assemble_problem, stencil_matvec_flat
from helmholtz_tpu.fd import stencil
from helmholtz_tpu.precond import (factor_exact, rebuild_error,
                                   setup_preconditioner)
from helmholtz_tpu.solve import gmres

import reference_oracle as oracle


def _setup(n, b, wave_num, const, problem="c1_f1", **pk):
    # as-shipped pinned: several tests below compare against the scalar
    # oracle (tests/reference_oracle.py), which implements the reference's
    # as-shipped velocity sampling (framework default is "corrected")
    cfg = HelmholtzConfig(n=n, b=b, wave_num=wave_num, const=const,
                          fidelity="as-shipped")
    prob = assemble_problem(cfg, problem)
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P = setup_preconditioner(prob.A, hm, cfg.b, **pk)
    return cfg, prob, P


def test_exact_factorization_solves_exactly():
    # algo2_1/2_2 oracle: solve == direct sparse solve to ~1e-12
    cfg = HelmholtzConfig(n=31, b=8, wave_num=2.0, const=30.0)
    prob = assemble_problem(cfg)
    F = factor_exact(prob.A)
    f = np.asarray(prob.f_vec)
    u = np.asarray(F(jnp.asarray(f)))
    A = prob.A.toscipy().tocsc()
    u_direct = scipy.sparse.linalg.spsolve(A, f)
    np.testing.assert_allclose(u, u_direct, rtol=1e-10)
    # factor self-check (code.py:309-330 analog): A @ A^{-1} == I
    assert float(rebuild_error(prob.A, F)) < 1e-9


def test_corner_inverse_matches_dense():
    # G_m must equal the (b,b) corner block of the dense H_m inverse
    cfg, prob, P = _setup(n=15, b=4, wave_num=2.0, const=20.0)
    c_full = oracle.velocity_c1(0.5, 0.5, cfg.n)
    n, b = cfg.n, cfg.b
    G_np = P.G.to_np()
    for k, m in enumerate(range(b + 1, n + 1)):
        H = oracle.build_hm_dense(m, n, b, cfg.const, cfg.eta, cfg.omega,
                                  cfg.h, c_full)
        Ginv = np.linalg.inv(H)[-n:, -n:]
        np.testing.assert_allclose(G_np[k], Ginv,
                                   rtol=1e-9, atol=1e-9 * np.abs(Ginv).max())


def test_hf_solve_matches_direct():
    cfg, prob, P = _setup(n=15, b=4, wave_num=2.0, const=20.0)
    bn = cfg.b * cfg.n
    A_dense = prob.A.todense()[:bn, :bn]
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal((cfg.b, cfg.n)) + 1j * rng.standard_normal((cfg.b, cfg.n))
    from helmholtz_tpu.precond.sweeping import _block_thomas_solve
    u = np.asarray(_block_thomas_solve(P.TF.cplx, P.hf_cs.cplx, P.hf_cn.cplx,
                                       jnp.asarray(rhs)))
    u_direct = np.linalg.solve(A_dense, rhs.reshape(-1)).reshape(cfg.b, cfg.n)
    np.testing.assert_allclose(u, u_direct, rtol=1e-9)


@pytest.mark.parametrize("n,b,wn,C,max_iters", [
    (31, 12, 2.0, 30.0, 4),   # SURVEY 6.2: corrected converges in 3
    (63, 12, 4.0, 61.0, 4),   # SURVEY 6.2: corrected converges in 3
])
def test_corrected_sweep_converges_in_few_iterations(n, b, wn, C, max_iters):
    cfg, prob, P = _setup(n=n, b=b, wave_num=wn, const=C)
    res = gmres(lambda v: stencil_matvec_flat(prob.A, v), prob.f_vec,
                M=P, restart=20, rtol=1e-3, maxiter=200)
    A = prob.A.toscipy()
    f = np.asarray(prob.f_vec)
    true_res = np.linalg.norm(A @ np.asarray(res.x) - f) / np.linalg.norm(f)
    assert bool(res.converged)
    assert int(res.iterations) <= max_iters, int(res.iterations)
    assert true_res <= 1.5e-3


def test_d3_blockdiag_hf_degrades_to_tens_of_iterations():
    # Appendix A verification matrix: fix D1+D2, keep D3 -> 37 iters at n=63
    cfg, prob, P = _setup(n=63, b=12, wave_num=4.0, const=61.0,
                          hf_full_coupling=False)
    res = gmres(lambda v: stencil_matvec_flat(prob.A, v), prob.f_vec,
                M=P, restart=20, rtol=1e-3, maxiter=400)
    assert bool(res.converged)
    assert 15 <= int(res.iterations) <= 80, int(res.iterations)


def test_preconditioner_is_linear():
    cfg, prob, P = _setup(n=31, b=8, wave_num=2.0, const=30.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(cfg.n**2)
                    + 1j * rng.standard_normal(cfg.n**2))
    y = jnp.asarray(rng.standard_normal(cfg.n**2)
                    + 1j * rng.standard_normal(cfg.n**2))
    lhs = np.asarray(P(2.0 * x + 3.0 * y))
    rhs = 2.0 * np.asarray(P(x)) + 3.0 * np.asarray(P(y))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10, atol=1e-12)


def test_apply_fixed_rhs_emulates_d1():
    """Deviation D1 (code.py:510-511): the as-shipped 'preconditioner'
    ignores its argument — M(random) == M(f) exactly (SURVEY.md Appendix A,
    verified against the reference empirically)."""
    import jax.numpy as jnp
    from helmholtz_tpu import HelmholtzConfig, assemble_problem
    from helmholtz_tpu.fd import stencil as fd_stencil
    from helmholtz_tpu.precond import setup_preconditioner
    from helmholtz_tpu.precond.sweeping import (apply_fixed_rhs,
                                                apply_preconditioner)

    cfg = HelmholtzConfig(n=31, b=5, wave_num=2.0, const=20.0,
                          fidelity="as-shipped")
    prob = assemble_problem(cfg, "c1_f1")
    hm = fd_stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                      cfg.omega, cfg.h, prob.c_full,
                                      fidelity=cfg.fidelity)
    P_ = setup_preconditioner(prob.A, hm, cfg.b)
    M_d1 = apply_fixed_rhs(P_, prob.f_vec)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(cfg.n**2)
                    + 1j * rng.standard_normal(cfg.n**2))
    out_rand = np.asarray(M_d1(z))
    out_f = np.asarray(M_d1(prob.f_vec))
    np.testing.assert_array_equal(out_rand, out_f)
    # and the fixed output is the true sweep of f
    ref = np.asarray(apply_preconditioner(
        P_, prob.f_grid).reshape(-1))
    np.testing.assert_allclose(out_f, ref, rtol=1e-12)


def test_run_solver_exact_precond():
    """precond='exact' through the driver: the exact block-LDL^T is a
    perfect preconditioner, so GMRES converges in ~1 iteration."""
    from helmholtz_tpu.driver import run_solver

    r = run_solver(31, 5, 2.0, 20.0, precond="exact", rtol=1e-8,
                   maxiter=20)
    assert r.converged
    assert r.iterations <= 2
    assert r.true_residual < 1e-6


@pytest.mark.parametrize("problem,C,expected_max", [
    ("c1_f1", 61.0, 8), ("c1_f2", 61.0, 8),
    ("c2_f1", 61.0, 8), ("c2_f2", 61.0, 8),
])
def test_all_four_problem_instances_solve(problem, C, expected_max):
    """End-to-end preconditioned convergence for every canonical problem
    instance (PDF p.2: velocity c1/c2 x forcing f1/f2; code.py:390-408) —
    the reference's four experiment families, at oracle size."""
    from helmholtz_tpu.driver import run_solver

    r = run_solver(63, 12, 8.0, C, problem=problem, rtol=1e-3, maxiter=60)
    assert r.converged, (problem, r.iterations, r.residual_norm)
    assert r.iterations <= expected_max
    assert r.true_residual < 5e-2    # legacy preconditioned-tol semantics


@pytest.mark.parametrize("k", [2, 3, 4])
def test_fraction_schur_matches_direct(k):
    """The matrix-fraction corner-inverse recursion (one inversion per
    `schur_block` layers, O(n^2) propagation between — the TPU setup fast
    path) must agree with the direct per-layer Schur recursion, which is
    itself pinned to dense numpy inverses by
    test_corner_inverse_matches_dense."""
    from helmholtz_tpu.precond.sweeping import (
        _schur_corner_inverse, _schur_corner_inverse_fraction)

    cfg = HelmholtzConfig(n=63, b=12, wave_num=4.0, const=61.0,
                          fidelity="as-shipped")
    prob = assemble_problem(cfg)
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    T_direct = np.asarray(_schur_corner_inverse(hm))
    T_frac = np.asarray(_schur_corner_inverse_fraction(hm, block_layers=k))
    scale = np.abs(T_direct).max()
    # f64: growth rho^k of the fraction iterates costs ~k digits; k=4
    # measured at 1.5e-13 relative on this family
    np.testing.assert_allclose(T_frac, T_direct, rtol=0, atol=1e-9 * scale)


def test_fraction_schur_via_setup_converges():
    """End-to-end: setup with schur_block=4 (the TPU default) preserves
    the few-iteration GMRES convergence on the oracle problem."""
    cfg, prob, P = _setup(n=63, b=12, wave_num=4.0, const=61.0,
                          schur_block=4)
    mv = lambda v: stencil_matvec_flat(prob.A, v)
    res = gmres(mv, prob.f_vec, M=P, rtol=1e-3, restart=20, maxiter=30)
    assert bool(res.converged)
    assert int(res.iterations) <= 4


def test_factor_stride_interpolation_accuracy():
    """Strided factorization (factor every R-th subgrid, lerp between) must
    stay within the bf16-G-storage tolerance that is known to preserve
    iteration counts, and must leave end-to-end GMRES iterations unchanged
    at oracle scale."""
    from helmholtz_tpu.precond.sweeping import factor_corner_inverses

    cfg, prob, P = _setup(n=63, b=12, wave_num=4.0, const=61.0)
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    G1 = factor_corner_inverses(hm, n_pad=cfg.n, g_dtype=jnp.float64,
                                setup_chunk=16)
    G2 = factor_corner_inverses(hm, n_pad=cfg.n, g_dtype=jnp.float64,
                                setup_chunk=16, stride=2)
    scale = float(jnp.abs(G1.re).max())
    err = max(float(jnp.abs(G2.re - G1.re).max()),
              float(jnp.abs(G2.im - G1.im).max())) / scale
    assert err < 4e-3, err                  # bf16-storage-level tolerance

    from helmholtz_tpu.driver import run_solver
    r1 = run_solver(63, 12, 4.0, 61.0, rtol=1e-3, maxiter=30,
                    factor_stride=1)
    r2 = run_solver(63, 12, 4.0, 61.0, rtol=1e-3, maxiter=30,
                    factor_stride=2)
    assert r2.converged and r2.iterations == r1.iterations


def test_recompute_preconditioner_matches_stored():
    """The factor-free recompute apply (precond.recompute) must reproduce
    the stored-G apply bit-for-bit up to roundoff, for both D2 variants and
    chunk sizes that do / do not divide M."""
    import dataclasses
    from helmholtz_tpu.precond.recompute import (apply_recompute,
                                                 setup_recompute)
    from helmholtz_tpu.precond.sweeping import apply_preconditioner

    cfg, prob, P = _setup(n=33, b=6, wave_num=2.0, const=20.0,
                          pad_lanes=False)
    hm = None  # unused; _setup already factored P
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))
    for d2 in (True, False):
        R = setup_recompute(cfg.n, cfg.b, cfg.wave_num, cfg.const,
                            cfg.alpha, prob.c_full, A=prob.A,
                            fidelity=cfg.fidelity, d2_replace=d2, chunk=7)
        Pd = dataclasses.replace(P, d2_replace=d2)
        ref = apply_preconditioner(Pd, f, impl="xla")
        got = apply_recompute(R, f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12 * float(
                                       np.abs(np.asarray(ref)).max()))


def test_recompute_precond_solves_end_to_end():
    from helmholtz_tpu.driver import run_solver

    r = run_solver(63, 12, 4.0, 61.0, precond="recompute", rtol=1e-3,
                   maxiter=30)
    assert r.converged
    assert r.iterations <= 4


def test_recompute_stride_interpolates_within_tolerance():
    """Strided recompute (factor every R-th subgrid inside each apply
    chunk, lerp between) must stay within interpolation-error distance of
    the exact recompute apply — same smoothness argument as
    test_factor_stride_interpolation_accuracy."""
    from helmholtz_tpu.precond.recompute import (apply_recompute,
                                                 setup_recompute)

    cfg, prob, _ = _setup(n=63, b=12, wave_num=4.0, const=61.0)
    rng = np.random.default_rng(11)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))
    mk = lambda st, ch: setup_recompute(
        cfg.n, cfg.b, cfg.wave_num, cfg.const, cfg.alpha, prob.c_full,
        A=prob.A, fidelity=cfg.fidelity, chunk=ch, factor_stride=st)
    ref = apply_recompute(mk(1, 16), f)
    for st, ch in ((2, 13), (2, None), (4, 16)):
        got = apply_recompute(mk(st, ch), f)
        rel = float(np.abs(np.asarray(got - ref)).max()
                    / np.abs(np.asarray(ref)).max())
        assert rel < 3e-2 * st, (st, ch, rel)   # interp error, not a bug


def test_recompute_batched_apply_matches_single():
    """apply_recompute_multi: the batch rides one chunk-G rematerialization
    and must equal per-RHS applies to roundoff (linearity included)."""
    from helmholtz_tpu.precond.recompute import (apply_recompute,
                                                 apply_recompute_multi,
                                                 setup_recompute)

    cfg, prob, _ = _setup(n=33, b=6, wave_num=2.0, const=20.0,
                          pad_lanes=False)
    R = setup_recompute(cfg.n, cfg.b, cfg.wave_num, cfg.const, cfg.alpha,
                        prob.c_full, A=prob.A, fidelity=cfg.fidelity,
                        chunk=7, factor_stride=2)
    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))
    u1 = apply_recompute(R, f)
    F = jnp.stack([f, 2.0 * f, 1j * f])
    U = apply_recompute_multi(R, F)
    scale = float(np.abs(np.asarray(u1)).max())
    for got, want in ((U[0], u1), (U[1], 2.0 * u1), (U[2], 1j * u1)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12 * scale)


def test_multisolve_recompute_batched_rhs():
    """run_multisolve(precond='recompute'): batched sources through the
    factor-free path converge with per-RHS counts matching the stored
    path (VERDICT round 3, item 7)."""
    from helmholtz_tpu.driver import run_multisolve

    kw = dict(consts=[61.0], n_sources=3, rtol=1e-3, maxiter=60,
              factor_stride=2)
    [stored] = run_multisolve(63, 12, [4.0], **kw)
    [rec] = run_multisolve(63, 12, [4.0], precond="recompute", **kw)
    assert rec["converged"] == [True, True, True]
    assert all(r < 1e-2 for r in rec["true_residuals"])
    for a, s in zip(rec["iterations"], stored["iterations"]):
        assert abs(a - s) <= 1, (rec["iterations"], stored["iterations"])


def test_recompute_strided_misaligned_chunk_matches_stored():
    """Misaligned chunks (chunk % stride != 0) must see the SAME globally
    anchored interpolant as the stored strided path — the round-4 window
    sizing bug made trailing rows of misaligned chunks extrapolate
    (w > 1) instead of bracketing (code-review round 4)."""
    import dataclasses

    from helmholtz_tpu.precond.recompute import (apply_recompute,
                                                 setup_recompute)
    from helmholtz_tpu.precond.sweeping import apply_preconditioner

    cfg, prob, P = _setup(n=63, b=12, wave_num=4.0, const=61.0,
                          pad_lanes=False, factor_stride=4)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))
    ref = apply_preconditioner(P, f, impl="xla")
    scale = float(np.abs(np.asarray(ref)).max())
    for chunk in (6, 13, 7):          # none divisible by stride 4
        R = setup_recompute(cfg.n, cfg.b, cfg.wave_num, cfg.const,
                            cfg.alpha, prob.c_full, A=prob.A,
                            fidelity=cfg.fidelity, chunk=chunk,
                            factor_stride=4)
        got = apply_recompute(R, f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-10 * scale,
                                   err_msg=f"chunk={chunk}")
