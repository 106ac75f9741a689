"""BiCGStab + batched-solve oracles."""
import numpy as np
import scipy.sparse.linalg

import jax
import jax.numpy as jnp

from helmholtz_tpu import HelmholtzConfig, assemble_problem, stencil_matvec_flat
from helmholtz_tpu.fd import stencil
from helmholtz_tpu.precond import setup_preconditioner
from helmholtz_tpu.solve.batched import solve_multi_problem, solve_multi_rhs
from helmholtz_tpu.solve.bicgstab import bicgstab


def _random_system(n, seed=0, diag_boost=4.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = A + diag_boost * np.sqrt(n) * np.eye(n)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    return A, b


def test_bicgstab_matches_direct():
    A, b = _random_system(100)
    res = bicgstab(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                   rtol=1e-10, maxiter=500)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               rtol=1e-6)


def test_bicgstab_sweeping_preconditioner_few_iterations():
    cfg = HelmholtzConfig(n=63, b=12, wave_num=4.0, const=61.0)
    prob = assemble_problem(cfg)
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P = setup_preconditioner(prob.A, hm, cfg.b)
    res = bicgstab(lambda v: stencil_matvec_flat(prob.A, v), prob.f_vec,
                   M=P, rtol=1e-3, maxiter=100)
    A = prob.A.toscipy()
    f = np.asarray(prob.f_vec)
    true_res = np.linalg.norm(A @ np.asarray(res.x) - f) / np.linalg.norm(f)
    assert bool(res.converged)
    assert int(res.iterations) <= 6, int(res.iterations)
    assert true_res <= 1.1e-3


def test_multi_rhs_batch():
    cfg = HelmholtzConfig(n=31, b=8, wave_num=2.0, const=30.0)
    prob = assemble_problem(cfg)
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P = setup_preconditioner(prob.A, hm, cfg.b)
    rng = np.random.default_rng(0)
    Bmat = jnp.asarray(rng.standard_normal((4, cfg.n**2))
                       + 1j * rng.standard_normal((4, cfg.n**2)))
    res = solve_multi_rhs(lambda v: stencil_matvec_flat(prob.A, v), Bmat,
                          M=P, rtol=1e-3, maxiter=100)
    A = prob.A.toscipy()
    X = np.asarray(res.x)
    assert bool(res.converged.all())
    for i in range(4):
        # assert the ACTUAL convergence semantics (scipy-legacy: tolerance
        # on the preconditioned residual), not a loose true-residual proxy
        r_vec = np.asarray(Bmat[i]) - A @ X[i]
        Mr = np.asarray(P(jnp.asarray(r_vec)))
        Mb = np.asarray(P(Bmat[i]))
        assert np.linalg.norm(Mr) <= 1.2e-3 * np.linalg.norm(Mb)
        # and a sane (if weaker) true-residual bound
        assert (np.linalg.norm(r_vec)
                / np.linalg.norm(np.asarray(Bmat[i]))) < 0.05


def test_multi_frequency_sweep():
    """BASELINE config 5 in miniature: a batch of frequencies, each with its
    own operator + factor stack, solved in one vmapped call."""
    n, b = 31, 8
    wave_nums = jnp.asarray([1.0, 2.0, 3.0])
    const = 30.0

    def build(wn):
        cfg_omega = 2 * jnp.pi * wn + 2j
        h = 1.0 / (n + 1)
        from helmholtz_tpu.fd import problems
        c_full, f = problems.init_c1_f1(cfg_omega, n)
        A = stencil.build_a_stencil(n, b, const, b * h, cfg_omega, h, c_full)
        hm = stencil.build_hm_stencils(n, b, const, b * h, cfg_omega, h,
                                       c_full)
        P = setup_preconditioner(A, hm, b)
        return A, P, f.reshape(-1)

    A_b, P_b, f_b = jax.vmap(build)(wave_nums)

    from helmholtz_tpu.precond.sweeping import apply_preconditioner
    res = solve_multi_problem(
        A_b, lambda A, v: stencil_matvec_flat(A, v), f_b,
        precond_data=P_b,
        apply_precond=lambda P_, v: apply_preconditioner(
            P_, v.reshape(n, n)).reshape(-1),
        rtol=1e-3, maxiter=100)

    assert bool(res.converged.all())
    assert int(res.iterations.max()) <= 6
    # cross-check one frequency against an independent single solve
    A1, P1, f1 = build(2.0)
    from helmholtz_tpu.solve import gmres
    res1 = gmres(lambda v: stencil_matvec_flat(A1, v), f1, M=P1,
                 rtol=1e-3, maxiter=100)
    np.testing.assert_allclose(np.asarray(res.x[1]), np.asarray(res1.x),
                               rtol=1e-8, atol=1e-10)


def test_apply_preconditioner_multi_matches_single():
    """Batched-RHS apply (XLA fallback on CPU, incl. the padded layout +
    batched Pallas path in interpret mode) == stacked single applies."""
    import jax.numpy as jnp
    from helmholtz_tpu import HelmholtzConfig, assemble_problem
    from helmholtz_tpu.fd import stencil
    from helmholtz_tpu.precond.sweeping import (apply_preconditioner,
                                                apply_preconditioner_multi,
                                                setup_preconditioner)

    cfg = HelmholtzConfig(n=25, b=5, wave_num=2.0, const=25.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=True)

    rng = np.random.default_rng(2)
    F = jnp.asarray(rng.standard_normal((3, cfg.n, cfg.n))
                    + 1j * rng.standard_normal((3, cfg.n, cfg.n)))
    singles = jnp.stack([apply_preconditioner(P, F[i], impl="xla")
                         for i in range(3)])
    multi_xla = apply_preconditioner_multi(P, F, impl="xla")
    multi_pl = apply_preconditioner_multi(P, F, impl="pallas")
    np.testing.assert_allclose(np.asarray(multi_xla), np.asarray(singles),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(multi_pl), np.asarray(singles),
                               rtol=1e-10, atol=1e-10)
