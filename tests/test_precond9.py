"""9-point sweeping preconditioner (precond.sweeping9) oracles.

Mirrors the 5-point oracle hierarchy (SURVEY.md section 4): dense-algebra
checks of the tridiagonal-coupling Schur recursion and block-Thomas solve,
then end-to-end convergence of the 9-point discretization under its own
moving-PML preconditioner — beyond-reference scope (the reference is
5-point only, code.py:70-115)."""
import numpy as np
import jax.numpy as jnp

from helmholtz_tpu.fd import problems as fd_problems
from helmholtz_tpu.fd.stencil import (build_a_stencil9, build_hm_stencils9,
                                      extract_hf_stencil9)
from helmholtz_tpu.precond.sweeping9 import (_block_thomas_solve9,
                                             _coupling_triples,
                                             _schur_corner_inverse9,
                                             _schur_t_stack9,
                                             _tridiag_matvec)


def _setup9(n=31, b=6, wave_num=2.0, const=20.0):
    omega = 2 * jnp.pi * wave_num + 2j
    h = 1.0 / (n + 1)
    eta = b * h
    c_full, f = fd_problems.PROBLEMS["c1_f1"](omega, n)
    A9 = build_a_stencil9(n, b, const, eta, omega, h, c_full,
                          fidelity="corrected")
    hm9 = build_hm_stencils9(n, b, const, eta, omega, h, c_full)
    return A9, hm9, f


def _dense_of_s9(S, idx=None):
    """Dense (L*n, L*n) matrix of a Stencil9 (fields (L, n)) or of entry
    `idx` of a batched family (fields (M, L, n))."""
    g = lambda f: np.asarray(f if idx is None else f[idx])
    cc, cw, ce = g(S.cc), g(S.cw), g(S.ce)
    cs, cn = g(S.cs), g(S.cn)
    csw, cse, cnw, cne = g(S.csw), g(S.cse), g(S.cnw), g(S.cne)
    L, n = cc.shape
    N = L * n
    A = np.zeros((N, N), complex)
    k = lambda j, i: j * n + i
    for j in range(L):
        for i in range(n):
            A[k(j, i), k(j, i)] = cc[j, i]
            if i > 0:
                A[k(j, i), k(j, i - 1)] = cw[j, i]
            if i < n - 1:
                A[k(j, i), k(j, i + 1)] = ce[j, i]
            if j > 0:
                A[k(j, i), k(j - 1, i)] = cs[j, i]
                if i > 0:
                    A[k(j, i), k(j - 1, i - 1)] = csw[j, i]
                if i < n - 1:
                    A[k(j, i), k(j - 1, i + 1)] = cse[j, i]
            if j < L - 1:
                A[k(j, i), k(j + 1, i)] = cn[j, i]
                if i > 0:
                    A[k(j, i), k(j + 1, i - 1)] = cnw[j, i]
                if i < n - 1:
                    A[k(j, i), k(j + 1, i + 1)] = cne[j, i]
    return A


def test_stencil9_complex_symmetric():
    A9, _, _ = _setup9()
    D = _dense_of_s9(A9)
    assert np.abs(D - D.T).max() < 1e-12 * np.abs(D).max()


def test_corner_inverse9_matches_dense():
    """G_m from the tridiagonal-coupling Schur recursion == the corner
    block of the dense subgrid inverse."""
    _, hm9, _ = _setup9()
    n = hm9.cc.shape[-1]
    for mi in (0, 7, hm9.cc.shape[0] - 1):
        H = _dense_of_s9(hm9, mi)
        ref = np.linalg.inv(H)[-n:, -n:]
        got = np.asarray(_schur_corner_inverse9(
            type(hm9)(*[f[mi] for f in
                        (hm9.cc, hm9.cw, hm9.ce, hm9.cs, hm9.cn,
                         hm9.csw, hm9.cse, hm9.cnw, hm9.cne)])))
        assert np.abs(got - ref).max() < 1e-9 * np.abs(ref).max(), mi


def test_corner_inverse9_batched_matches_per_entry():
    _, hm9, _ = _setup9()
    got = np.asarray(_schur_corner_inverse9(hm9))
    n = hm9.cc.shape[-1]
    H = _dense_of_s9(hm9, 3)
    ref = np.linalg.inv(H)[-n:, -n:]
    assert np.abs(got[3] - ref).max() < 1e-9 * np.abs(ref).max()


def test_block_thomas9_solves_hf_exactly():
    A9, _, f = _setup9()
    b = 6
    HF = extract_hf_stencil9(A9, b)
    T = _schur_t_stack9(HF)
    lo, up = _coupling_triples(HF)
    trip = lambda t: (t[:, 0, :], t[:, 1, :], t[:, 2, :])
    rng = np.random.default_rng(0)
    n = A9.cc.shape[-1]
    rhs = jnp.asarray(rng.standard_normal((b, n))
                      + 1j * rng.standard_normal((b, n)))
    u = np.asarray(_block_thomas_solve9(T, trip(lo), trip(up), rhs))
    D = _dense_of_s9(HF)
    ref = np.linalg.solve(D, np.asarray(rhs).reshape(-1)).reshape(b, n)
    assert np.abs(u - ref).max() < 1e-9 * np.abs(ref).max()


def test_tridiag_matvec_matches_dense():
    rng = np.random.default_rng(1)
    n = 17
    sub, diag, sup = (jnp.asarray(rng.standard_normal(n)) for _ in range(3))
    sub = sub.at[0].set(0)
    sup = sup.at[-1].set(0)
    v = jnp.asarray(rng.standard_normal(n))
    T = np.diag(np.asarray(diag)) + np.diag(np.asarray(sub)[1:], -1) \
        + np.diag(np.asarray(sup)[:-1], 1)
    np.testing.assert_allclose(np.asarray(_tridiag_matvec(sub, diag, sup, v)),
                               T @ np.asarray(v), rtol=1e-12)


def test_run_solver_9pt_end_to_end():
    """The 9-point scheme under its OWN moving-PML preconditioner: few
    GMRES iterations (vs ~50-70 borrowing the 5-point preconditioner and
    no convergence unpreconditioned — measured)."""
    from helmholtz_tpu.driver import run_solver

    r = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3, maxiter=60)
    assert r.converged
    assert r.iterations <= 12
    assert r.true_residual < 2e-2
    assert r.config["stencil"] == "9pt"


def test_run_solver_9pt_strided_factor_parity():
    """factor_stride composes with the 9-point factorization (the shared
    chunk/stride machinery): iteration counts match exact stride 1."""
    from helmholtz_tpu.driver import run_solver

    r1 = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3,
                    maxiter=60, factor_stride=1)
    r2 = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3,
                    maxiter=60, factor_stride=4)
    assert r2.converged
    assert abs(r2.iterations - r1.iterations) <= 1


def test_apply9_pallas_matches_xla():
    """The Pallas tridiagonal-coupling sweep (lane-roll coupling mode)
    must reproduce the XLA scan formulation (interpret mode on CPU), with
    lane padding exercised (n not a multiple of 128)."""
    import jax

    from helmholtz_tpu.precond.sweeping9 import (apply_preconditioner9,
                                                 setup_preconditioner9)

    A9, hm9, f = _setup9(n=31, b=6)
    P = setup_preconditioner9(A9, hm9, 6, pad_lanes=True)
    assert P.G.re.shape[-1] == 128          # padded layout
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((31, 31))
                    + 1j * rng.standard_normal((31, 31)))
    ref = apply_preconditioner9(P, x, impl="xla")
    got = apply_preconditioner9(P, x, impl="pallas")
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5 * scale)
    # as-shipped D2 variant through the kernel too
    import dataclasses
    Pd = dataclasses.replace(P, d2_replace=False)
    ref2 = apply_preconditioner9(Pd, x, impl="xla")
    got2 = apply_preconditioner9(Pd, x, impl="pallas")
    scale2 = float(np.abs(np.asarray(ref2)).max())
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=5e-5, atol=5e-5 * scale2)


def test_apply9_batched_matches_single():
    """Batched 9-point apply (one G stream for the whole batch through
    the tridiagonal Pallas kernel) == per-RHS single applies."""
    import jax

    from helmholtz_tpu.precond.sweeping9 import (apply_preconditioner9,
                                                 apply_preconditioner9_multi,
                                                 setup_preconditioner9)

    A9, hm9, _ = _setup9(n=31, b=6)
    P = setup_preconditioner9(A9, hm9, 6, pad_lanes=True)
    rng = np.random.default_rng(4)
    F = jnp.asarray(rng.standard_normal((3, 31, 31))
                    + 1j * rng.standard_normal((3, 31, 31)))
    ref = jnp.stack([apply_preconditioner9(P, F[i], impl="xla")
                     for i in range(3)])
    got = apply_preconditioner9_multi(P, F, impl="pallas")
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5 * scale)


def test_multisolve_9pt_batched_sources():
    """run_multisolve(stencil='9pt'): batched sources through the 9-point
    scheme and its preconditioner, per-source counts matching the
    single-RHS solve."""
    from helmholtz_tpu.driver import run_multisolve, run_solver

    r1 = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3,
                    maxiter=60)
    [rec] = run_multisolve(63, 12, [4.0], consts=[61.0], n_sources=3,
                           rtol=1e-3, maxiter=60, stencil="9pt")
    assert rec["converged"] == [True, True, True]
    assert rec["stencil"] == "9pt"
    assert all(r < 1e-2 for r in rec["true_residuals"])
    for it in rec["iterations"]:
        assert abs(it - r1.iterations) <= 1
