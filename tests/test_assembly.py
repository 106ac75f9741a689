"""Assembly parity: vectorized Stencil5 builders vs the scalar-loop oracle
and vs scipy-computed reference quantities (SURVEY.md section 4 "unit (kernel)
oracles")."""
import numpy as np
import pytest

from helmholtz_tpu import HelmholtzConfig, assemble_problem, stencil_matvec_flat
from helmholtz_tpu.fd import problems, stencil

import reference_oracle as oracle


def _cfg(n=15, b=4, wave_num=2.0, const=20.0):
    # the scalar oracle (tests/reference_oracle.py) implements the
    # reference's as-shipped velocity sampling, so parity tests pin it
    # (the framework default is "corrected")
    return HelmholtzConfig(n=n, b=b, wave_num=wave_num, const=const,
                           alpha=2.0, fidelity="as-shipped")


@pytest.mark.parametrize("n,b", [(15, 4), (31, 12)])
def test_a_matches_oracle(n, b):
    cfg = _cfg(n=n, b=b, wave_num=4.0, const=30.0)
    prob = assemble_problem(cfg, "c1_f1")
    A_dense = prob.A.todense()

    c_full = oracle.velocity_c1(0.5, 0.5, cfg.n)
    A_ref = oracle.build_a_dense(cfg.n, cfg.b, cfg.const, cfg.eta, cfg.omega,
                                 cfg.h, c_full)
    np.testing.assert_allclose(A_dense, A_ref, rtol=1e-12, atol=1e-8)


def test_a_nnz_count():
    # reference nnz = 5n^2 - 4n (SURVEY.md section 0)
    cfg = _cfg(n=15)
    prob = assemble_problem(cfg)
    A = prob.A.toscipy()
    assert A.nnz == 5 * cfg.n**2 - 4 * cfg.n


def test_a_complex_symmetric():
    # A is complex-symmetric: A == A.T (not Hermitian) — SURVEY.md fd/stencil.
    cfg = _cfg(n=15)
    A = assemble_problem(cfg).A.todense()
    np.testing.assert_allclose(A, A.T, rtol=1e-12, atol=1e-10)


def test_hm_matches_oracle():
    cfg = _cfg(n=15, b=4, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg)
    H_all = stencil.build_hm_stencils(
        cfg.n, cfg.b, cfg.const, cfg.eta, cfg.omega, cfg.h, prob.c_full,
        fidelity=cfg.fidelity)
    c_full = oracle.velocity_c1(0.5, 0.5, cfg.n)
    from helmholtz_tpu.core.sparse import Stencil5
    for mi, m in enumerate(range(cfg.b + 1, cfg.n + 1)):
        Hm = Stencil5(*(f[mi] for f in
                        (H_all.cc, H_all.cw, H_all.ce, H_all.cs, H_all.cn)))
        H_ref = oracle.build_hm_dense(m, cfg.n, cfg.b, cfg.const, cfg.eta,
                                      cfg.omega, cfg.h, c_full)
        np.testing.assert_allclose(Hm.todense(), H_ref, rtol=1e-12, atol=1e-8)


def test_hf_is_leading_principal_submatrix():
    cfg = _cfg(n=15, b=4)
    prob = assemble_problem(cfg)
    A_dense = prob.A.todense()
    bn = cfg.b * cfg.n
    HF = stencil.extract_hf_stencil(prob.A, cfg.b, full_coupling=True)
    np.testing.assert_allclose(HF.todense(), A_dense[:bn, :bn],
                               rtol=1e-13, atol=0)
    # as-shipped D3 variant: block-diagonal only (code.py:178-183)
    HF_bd = stencil.extract_hf_stencil(prob.A, cfg.b, full_coupling=False)
    expect = A_dense[:bn, :bn].copy()
    for l in range(cfg.b - 1):
        expect[(l + 1) * cfg.n:(l + 2) * cfg.n, l * cfg.n:(l + 1) * cfg.n] = 0
        expect[l * cfg.n:(l + 1) * cfg.n, (l + 1) * cfg.n:(l + 2) * cfg.n] = 0
    np.testing.assert_allclose(HF_bd.todense(), expect, rtol=1e-13, atol=0)


def test_forcing_matches_oracle():
    cfg = _cfg(n=15)
    prob = assemble_problem(cfg, "c1_f1")
    f_ref = oracle.forcing_f1(0.5, 0.125, cfg.omega, cfg.n)
    np.testing.assert_allclose(np.asarray(prob.f_grid), f_ref, rtol=1e-12)


def test_stencil_matvec_matches_dense():
    cfg = _cfg(n=15)
    prob = assemble_problem(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(cfg.n**2) + 1j * rng.standard_normal(cfg.n**2)
    y = np.asarray(stencil_matvec_flat(prob.A, x))
    y_ref = prob.A.todense() @ x
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-8)


def test_corrected_velocity_sampling_transposes():
    # corrected sampling must equal as-shipped sampling of the transposed,
    # shifted velocity field (SURVEY.md Appendix B item 3)
    cfg_s = _cfg(n=15)
    cfg_c = HelmholtzConfig(**{**cfg_s.__dict__, "fidelity": "corrected"})
    c_full = problems.init_c1_mat(0.3, 0.6, cfg_s.n)  # asymmetric lens
    A_ship = stencil.build_a_stencil(cfg_s.n, cfg_s.b, cfg_s.const, cfg_s.eta,
                                     cfg_s.omega, cfg_s.h, c_full,
                                     fidelity="as-shipped")
    import numpy as np_
    c_np = np.asarray(c_full)
    # as-shipped reads c_full[i-1, j-1]; feeding it a field c2 with
    # c2[i-1, j-1] = c_full[j, i] makes the two paths agree.
    c_equiv = np.zeros_like(c_np)
    c_equiv[0:cfg_s.n, 0:cfg_s.n] = c_np[1:cfg_s.n + 1, 1:cfg_s.n + 1].T
    A_corr = stencil.build_a_stencil(cfg_s.n, cfg_s.b, cfg_s.const, cfg_s.eta,
                                     cfg_s.omega, cfg_s.h, c_equiv,
                                     fidelity="as-shipped")
    A_corr2 = stencil.build_a_stencil(cfg_s.n, cfg_s.b, cfg_s.const, cfg_s.eta,
                                      cfg_s.omega, cfg_s.h, c_full,
                                      fidelity="corrected")
    np.testing.assert_allclose(np.asarray(A_corr.cc), np.asarray(A_corr2.cc),
                               rtol=1e-12)
    # and for the radially-symmetric centered c1 the two fidelities differ
    # only by the one-point shift (sanity: matrices are close but not equal)
    assert not np.allclose(np.asarray(A_ship.cc), np.asarray(A_corr2.cc))


def test_stencil9_gamma1_reduces_to_5point():
    """gamma=1 must reproduce the 5-point operator exactly (the footprint
    is a representation parameter, SURVEY.md section 0)."""
    import jax.numpy as jnp
    from helmholtz_tpu.fd.stencil import build_a_stencil, build_a_stencil9

    n, b = 17, 4
    h = 1.0 / (n + 1)
    eta = b * h
    omega = 2.0 * jnp.pi * 2.0 + 2.0j
    c_full = jnp.ones((n + 2, n + 2))
    A5 = build_a_stencil(n, b, 20.0, eta, omega, h, c_full)
    A9 = build_a_stencil9(n, b, 20.0, eta, omega, h, c_full, gamma=1.0,
                          mehrstellen=False)
    for f in ("cc", "cw", "ce", "cs", "cn"):
        np.testing.assert_allclose(np.asarray(getattr(A9, f)),
                                   np.asarray(getattr(A5, f)),
                                   rtol=1e-14, atol=0)
    for f in ("csw", "cse", "cnw", "cne"):
        np.testing.assert_array_equal(np.asarray(getattr(A9, f)), 0)


def test_stencil9_classical_compact_weights():
    """gamma=2/3 with no PML == the classical 4th-order compact Helmholtz
    scheme: Laplacian [1 4 1; 4 -20 4; 1 4 1]/(6h^2) + Mehrstellen mass
    [0 1 0; 1 8 1; 0 1 0]/12 * omega^2 (round 5 — the round-4 point-mass
    variant is kept under mehrstellen=False)."""
    import jax.numpy as jnp
    from helmholtz_tpu.fd.stencil import build_a_stencil9

    n = 9
    h = 1.0 / (n + 1)
    omega = 2.0 * jnp.pi * 1.0 + 0.0j
    c_full = jnp.ones((n + 2, n + 2))
    A9 = build_a_stencil9(n, 2, 0.0, 2 * h, omega, h, c_full)  # const=0: s==1
    k = n // 2  # interior point
    ih2 = 1.0 / h**2
    mass = complex(omega**2)
    assert np.isclose(complex(A9.cw[k, k]), 4.0 / 6.0 * ih2 + mass / 12.0)
    assert np.isclose(complex(A9.cne[k, k]), 1.0 / 6.0 * ih2)
    assert np.isclose(complex(A9.cc[k, k]),
                      -20.0 / 6.0 * ih2 + 8.0 / 12.0 * mass)
    # point-mass variant preserved behind the switch
    A9p = build_a_stencil9(n, 2, 0.0, 2 * h, omega, h, c_full,
                           mehrstellen=False)
    assert np.isclose(complex(A9p.cw[k, k]), 4.0 / 6.0 * ih2)
    assert np.isclose(complex(A9p.cc[k, k]), -20.0 / 6.0 * ih2 + mass)


def test_stencil9_truncation_and_solve():
    """The 9-point operator is a consistent Helmholtz discretization: its
    action on a smooth eigenfunction matches (omega^2 - 2 pi^2) u, and the
    system solves through the Stencil9 matvec path."""
    import jax.numpy as jnp
    from helmholtz_tpu.fd.stencil import build_a_stencil9
    from helmholtz_tpu.ops.spmv import stencil9_matvec
    from helmholtz_tpu.solve import gmres

    n = 31
    h = 1.0 / (n + 1)
    omega = 2.0 * jnp.pi * 1.0 + 2.0j
    c_full = jnp.ones((n + 2, n + 2))
    A9 = build_a_stencil9(n, 2, 0.0, 2 * h, omega, h, c_full)

    x = np.linspace(0, 1, n + 2)[1:-1]
    xx, yy = np.meshgrid(x, x)
    u = np.sin(np.pi * xx) * np.sin(np.pi * yy)
    Au = np.asarray(stencil9_matvec(A9, jnp.asarray(u, A9.cc.dtype)))
    # Mehrstellen identity: A9 u ~= M (Delta u + omega^2 u) to O(h^4)
    from helmholtz_tpu.fd.stencil import mass_filter9
    expect = np.asarray(mass_filter9(
        n, 2, 0.0, 2 * h, omega, h,
        jnp.asarray((complex(omega**2) - 2 * np.pi**2) * u, A9.cc.dtype)))
    interior = np.abs(Au - expect)[2:-2, 2:-2].max()
    assert interior < 20 * np.pi**6 * h**4        # O(h^4) truncation

    # solve A9 x = f via GMRES through the 9-point matvec; verify against
    # the dense oracle
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal((n, n))
                    + 1j * rng.standard_normal((n, n)), A9.cc.dtype)
    mv = lambda v: stencil9_matvec(A9, v.reshape(n, n)).reshape(-1)
    res = gmres(mv, f.reshape(-1), restart=50, rtol=1e-8, maxiter=5000)
    x_dense = np.linalg.solve(A9.todense(), np.asarray(f).reshape(-1))
    np.testing.assert_allclose(np.asarray(res.x), x_dense, rtol=1e-5,
                               atol=1e-7)
