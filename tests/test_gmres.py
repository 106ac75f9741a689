"""GMRES oracle tests: exactness on small systems, scipy-comparable iteration
behavior on the Helmholtz problem (SURVEY.md section 4 'solve oracles')."""
import numpy as np
import pytest
import scipy.sparse.linalg

import jax.numpy as jnp

from helmholtz_tpu import HelmholtzConfig, assemble_problem, stencil_matvec_flat
from helmholtz_tpu.solve import gmres


def _random_system(n, seed=0, diag_boost=4.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = A + diag_boost * np.sqrt(n) * np.eye(n)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    return A, b


def test_gmres_matches_direct_solve():
    A, b = _random_system(120)
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                restart=30, rtol=1e-12, maxiter=600)
    x_direct = np.linalg.solve(A, b)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_direct, rtol=1e-8)


def test_gmres_residual_history_monotone_and_scipy_comparable():
    A, b = _random_system(150, seed=1)
    rtol = 1e-8
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                restart=20, rtol=rtol, maxiter=400)
    hist = np.asarray(res.history)
    hist = hist[~np.isnan(hist)]
    assert len(hist) == int(res.iterations)
    # non-increasing within fp tolerance (GMRES minimizes the residual)
    assert np.all(np.diff(hist) <= 1e-8 * hist[:-1] + 1e-12)

    counter = []
    scipy.sparse.linalg.gmres(A, b, rtol=rtol, restart=20,
                              callback=lambda rk: counter.append(rk),
                              callback_type="pr_norm", maxiter=400)
    assert abs(int(res.iterations) - len(counter)) <= max(3, len(counter) // 5)


def test_gmres_left_preconditioning():
    A, b = _random_system(100, seed=2, diag_boost=1.0)
    Minv = np.linalg.inv(A + 0.1 * np.eye(100))  # good approximate inverse
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                M=lambda v: jnp.asarray(Minv) @ v,
                restart=20, rtol=1e-10, maxiter=200)
    assert bool(res.converged)
    assert int(res.iterations) < 25  # strong preconditioner => few iterations
    x_direct = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), x_direct, rtol=1e-6)


def test_gmres_zero_rhs():
    A, _ = _random_system(50)
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.zeros(50, complex))
    assert bool(res.converged)
    assert int(res.iterations) == 0
    np.testing.assert_array_equal(np.asarray(res.x), 0)


@pytest.mark.parametrize("rtol", [3e-2])
def test_gmres_helmholtz_unpreconditioned_tracks_scipy(rtol):
    """Unpreconditioned GMRES on the true Helmholtz matrix: our iteration
    count must track scipy's on the identical matrix (SURVEY.md section 4
    oracle 2).  Loose tol keeps the test fast; the full 1e-3 run at n=63
    takes ~9447 iterations (BASELINE.md)."""
    cfg = HelmholtzConfig(n=31, b=8, wave_num=2.0, const=30.0)
    prob = assemble_problem(cfg, "c1_f1")
    A = prob.A.toscipy()
    f = np.asarray(prob.f_vec)

    counter = []
    scipy.sparse.linalg.gmres(A, f, rtol=rtol, restart=20, maxiter=5000,
                              callback=lambda rk: counter.append(rk),
                              callback_type="pr_norm")
    res = gmres(lambda v: stencil_matvec_flat(prob.A, v), jnp.asarray(f),
                restart=20, rtol=rtol, maxiter=5000)
    true_res = np.linalg.norm(A @ np.asarray(res.x) - f) / np.linalg.norm(f)
    assert true_res <= rtol * 1.01
    assert abs(int(res.iterations) - len(counter)) <= max(5, len(counter) // 4)


def test_gmres_nonzero_initial_guess():
    """x0 != 0 pays one extra residual evaluation but must converge to the
    same solution (exercises the carried-residual init path)."""
    A, b = _random_system(90, seed=5)
    x_direct = np.linalg.solve(A, b)
    x0 = jnp.asarray(x_direct + 0.01 * (np.arange(90) % 3 - 1))
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), x0=x0,
                restart=20, rtol=1e-10, maxiter=200)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_direct, rtol=1e-7)
    # warm start near the solution must beat the cold start
    cold = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                 restart=20, rtol=1e-10, maxiter=200)
    assert int(res.iterations) <= int(cold.iterations)


def test_gmres_exact_x0_converges_immediately():
    A, b = _random_system(60, seed=6)
    x_direct = np.linalg.solve(A, b)
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                x0=jnp.asarray(x_direct), restart=10, rtol=1e-8, maxiter=50)
    assert bool(res.converged)
    assert int(res.iterations) == 0


def test_gmres_nan_rhs_terminates_with_breakdown():
    """NaN data must terminate promptly with the breakdown flag set, not
    spin the outer loop (SURVEY.md section 5 'failure detection')."""
    A, b = _random_system(40, seed=7)
    b = np.asarray(b)
    b[3] = np.nan
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                restart=10, rtol=1e-8, maxiter=100)
    assert not bool(res.converged)
    assert bool(res.breakdown)
    assert int(res.iterations) <= 10


def test_gmres_deterministic_history():
    """Same inputs => bitwise-identical residual history (SURVEY.md
    section 5 'race detection / determinism checks')."""
    cfg = HelmholtzConfig(n=31, b=6, wave_num=2.0, const=30.0)
    prob = assemble_problem(cfg, "c1_f1")
    mv = lambda v: stencil_matvec_flat(prob.A, v)
    r1 = gmres(mv, prob.f_vec, restart=20, rtol=1e-6, maxiter=200)
    r2 = gmres(mv, prob.f_vec, restart=20, rtol=1e-6, maxiter=200)
    h1, h2 = np.asarray(r1.history), np.asarray(r2.history)
    mask = ~np.isnan(h1)
    assert np.array_equal(mask, ~np.isnan(h2))
    assert np.array_equal(h1[mask], h2[mask])
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_hostloop_matches_jitted_gmres():
    """The host-driven driver (solve.hostloop) must replicate the compiled
    solver's iteration count and solution on the same operators — the
    parity that makes it a valid capacity fallback AND a miscompile
    isolator (any divergence localizes a bug to the compiled loop nest)."""
    from helmholtz_tpu.core.complexlib import CArray
    from helmholtz_tpu.solve.hostloop import gmres_hostloop

    A, b = _random_system(150, seed=7, diag_boost=2.0)
    Aj = jnp.asarray(A)
    ref = gmres(lambda v: Aj @ v, jnp.asarray(b),
                restart=20, rtol=1e-8, maxiter=200)
    got = gmres_hostloop(lambda Ao, v: Ao @ v, Aj,
                         CArray.of(jnp.asarray(b)),
                         restart=20, rtol=1e-8, maxiter=200)
    assert bool(got.converged)
    assert abs(int(got.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(got.x.cplx), np.asarray(ref.x),
                               rtol=1e-6, atol=1e-10)
    # preconditioned variant
    Minv = jnp.asarray(np.linalg.inv(A + 0.1 * np.eye(150)))
    refp = gmres(lambda v: Aj @ v, jnp.asarray(b), M=lambda v: Minv @ v,
                 restart=20, rtol=1e-10, maxiter=200)
    gotp = gmres_hostloop(lambda Ao, v: Ao @ v, Aj,
                          CArray.of(jnp.asarray(b)),
                          M_of=lambda Mo, v: Mo @ v, M_ops=Minv,
                          restart=20, rtol=1e-10, maxiter=200)
    assert bool(gotp.converged)
    assert abs(int(gotp.iterations) - int(refp.iterations)) <= 1


def test_hostloop_end_to_end_recompute():
    """run_solver(method='gmres-hostloop', precond='recompute'): the exact
    configuration the driver exists for (the compiled nest miscompiles on
    the TPU backend at n >= 1407), pinned at oracle scale on CPU."""
    from helmholtz_tpu.driver import run_solver

    ref = run_solver(63, 12, 4.0, 61.0, precond="recompute", rtol=1e-3,
                     maxiter=30)
    r = run_solver(63, 12, 4.0, 61.0, precond="recompute", rtol=1e-3,
                   maxiter=30, method="gmres-hostloop")
    assert r.converged
    assert r.iterations == ref.iterations
    assert r.true_residual < 2e-3


def test_hostloop_batched_matches_single():
    """gmres_hostloop_batched: per-RHS iteration counts and solutions must
    match B independent gmres_hostloop runs on the same operators — the
    lockstep batching shares dispatches, not semantics."""
    from helmholtz_tpu.core.complexlib import CArray
    from helmholtz_tpu.solve.hostloop import (gmres_hostloop,
                                              gmres_hostloop_batched)

    A, b = _random_system(150, seed=3, diag_boost=2.0)
    Aj = jnp.asarray(A)
    rng = np.random.default_rng(9)
    B = np.stack([b, 2.0 * b,
                  rng.standard_normal(150) + 1j * rng.standard_normal(150)])
    singles = [gmres_hostloop(lambda Ao, v: Ao @ v, Aj,
                              CArray.of(jnp.asarray(B[q])),
                              restart=20, rtol=1e-8, maxiter=200)
               for q in range(3)]
    got = gmres_hostloop_batched(
        lambda Ao, V: jnp.einsum("ij,bj->bi", Ao, V), Aj,
        CArray.of(jnp.asarray(B)), restart=20, rtol=1e-8, maxiter=200)
    assert np.asarray(got.converged).all()
    X = np.asarray(got.x.cplx)
    for q, ref in enumerate(singles):
        assert abs(int(np.asarray(got.iterations)[q])
                   - int(ref.iterations)) <= 1, q
        np.testing.assert_allclose(X[q], np.asarray(ref.x.cplx),
                                   rtol=1e-6, atol=1e-9)
