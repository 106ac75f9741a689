"""Sparse format / algebra oracles vs scipy + dense numpy."""
import numpy as np
import scipy.sparse

import jax.numpy as jnp

from helmholtz_tpu import BSR, COO, CSR, HelmholtzConfig, assemble_problem
from helmholtz_tpu.ops import spmv
from helmholtz_tpu.ops.sparse_algebra import (bsr_spgemm, csr_add,
                                              csr_add_same_pattern,
                                              csr_scale, stencil_add,
                                              stencil_diag_update,
                                              stencil_scale)


def _rand_sparse(m, n, density, seed, complex_=True):
    rng = np.random.default_rng(seed)
    M = scipy.sparse.random(m, n, density=density, random_state=rng,
                            dtype=np.float64).toarray()
    if complex_:
        M = M + 1j * scipy.sparse.random(m, n, density=density,
                                         random_state=rng).toarray()
    return M


def test_csr_coo_roundtrip_and_matvec():
    A = _rand_sparse(40, 56, 0.1, 0)
    x = np.random.default_rng(1).standard_normal(56) + 0j
    csr = CSR.fromdense(jnp.asarray(A))
    coo = COO.fromdense(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(csr.todense()), A)
    np.testing.assert_allclose(np.asarray(coo.todense()), A)
    np.testing.assert_allclose(np.asarray(spmv.csr_matvec(csr, jnp.asarray(x))),
                               A @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(spmv.coo_matvec(coo, jnp.asarray(x))),
                               A @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(csr.tocoo().todense()), A)
    np.testing.assert_allclose(np.asarray(coo.tocsr().todense()), A)


def test_csr_spmm():
    A = _rand_sparse(32, 24, 0.15, 2)
    X = np.random.default_rng(3).standard_normal((24, 5)) + 0j
    csr = CSR.fromdense(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(spmv.csr_matmat(csr, jnp.asarray(X))),
                               A @ X, rtol=1e-12)


def test_bsr_matvec_matmat():
    A = _rand_sparse(32, 48, 0.3, 4)
    # zero out some blocks to make it block-sparse
    A[:8, :16] = 0
    bsr = BSR.fromdense(jnp.asarray(A), (8, 16))
    np.testing.assert_allclose(np.asarray(bsr.todense()), A)
    x = np.random.default_rng(5).standard_normal(48) + 0j
    np.testing.assert_allclose(np.asarray(spmv.bsr_matvec(bsr, jnp.asarray(x))),
                               A @ x, rtol=1e-12)
    X = np.random.default_rng(6).standard_normal((48, 7)) + 0j
    np.testing.assert_allclose(np.asarray(spmv.bsr_matmat(bsr, jnp.asarray(X))),
                               A @ X, rtol=1e-12)


def test_bsr_spgemm_matches_dense():
    A = _rand_sparse(32, 48, 0.25, 7)
    B = _rand_sparse(48, 40, 0.25, 8)
    A[8:16, :] = 0
    B[:, 8:16] = 0
    bA = BSR.fromdense(jnp.asarray(A), (8, 8))
    bB = BSR.fromdense(jnp.asarray(B), (8, 8))
    C = bsr_spgemm(bA, bB)
    np.testing.assert_allclose(np.asarray(C.todense()), A @ B,
                               rtol=1e-10, atol=1e-10)


def test_bsr_spgemm_schur_style_product():
    # the preconditioner-setup shape: coupling @ inverse @ coupling
    rng = np.random.default_rng(9)
    D1 = np.diag(rng.standard_normal(24) + 1j)
    T = rng.standard_normal((24, 24)) + 1j * rng.standard_normal((24, 24))
    D2 = np.diag(rng.standard_normal(24) + 1j)
    b1, bt = (BSR.fromdense(jnp.asarray(D1), (8, 8)),
              BSR.fromdense(jnp.asarray(T), (8, 8)))
    b2 = BSR.fromdense(jnp.asarray(D2), (8, 8))
    C = bsr_spgemm(bsr_spgemm(b1, bt), b2)
    np.testing.assert_allclose(np.asarray(C.todense()), D1 @ T @ D2,
                               rtol=1e-10, atol=1e-12)


def test_csr_add_general_and_same_pattern():
    A = _rand_sparse(30, 30, 0.1, 10)
    B = _rand_sparse(30, 30, 0.1, 11)
    cA, cB = CSR.fromdense(jnp.asarray(A)), CSR.fromdense(jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(csr_add(cA, cB).todense()), A + B,
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(csr_add_same_pattern(cA, csr_scale(cA, 2.0)).todense()),
        3.0 * A, rtol=1e-12)


def test_stencil_algebra():
    cfg = HelmholtzConfig(n=15, b=4, wave_num=2.0, const=20.0)
    A = assemble_problem(cfg).A
    Ad = A.todense()
    np.testing.assert_allclose(stencil_add(A, A).todense(), 2 * Ad)
    np.testing.assert_allclose(stencil_scale(A, 3.0).todense(), 3 * Ad)
    d = jnp.asarray(np.random.default_rng(0).standard_normal((15, 15)) + 0j)
    np.testing.assert_allclose(stencil_diag_update(A, d).todense(),
                               Ad + np.diag(np.asarray(d).reshape(-1)))


def test_stencil9_matvec_matches_dense():
    from helmholtz_tpu.core.sparse import Stencil9
    from helmholtz_tpu.ops.spmv import stencil9_matvec
    rng = np.random.default_rng(12)
    L, n = 9, 11
    fields = [jnp.asarray(rng.standard_normal((L, n))
                          + 1j * rng.standard_normal((L, n)))
              for _ in range(9)]
    A = Stencil9(*fields)
    u = rng.standard_normal((L, n)) + 1j * rng.standard_normal((L, n))
    y = np.asarray(stencil9_matvec(A, jnp.asarray(u)))
    y_ref = (A.todense() @ u.reshape(-1)).reshape(L, n)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_stencil_to_bsr_matches_scipy():
    import jax.numpy as jnp
    from helmholtz_tpu.fd.stencil import build_a_stencil
    from helmholtz_tpu.ops.sparse_algebra import stencil_to_bsr

    n, b = 24, 4
    h = 1.0 / (n + 1)
    omega = 2.0 * jnp.pi * 2.0 + 2.0j
    c_full = jnp.ones((n + 2, n + 2))
    A = build_a_stencil(n, b, 20.0, b * h, omega, h, c_full)
    B = stencil_to_bsr(A)
    assert B.data.shape == (3 * n - 2, n, n)
    np.testing.assert_allclose(np.asarray(B.todense()), A.todense(),
                               rtol=1e-14, atol=0)


def test_bsr_spgemm_setup_sized_product():
    """SpGEMM on a real setup-sized operator: A @ A at n=127 (the VERDICT
    round 1 item 8 scale test — 379 blocks of 127x127, vectorized symbolic
    phase), verified against scipy."""
    import jax.numpy as jnp
    from helmholtz_tpu.fd.stencil import build_a_stencil
    from helmholtz_tpu.ops.sparse_algebra import bsr_spgemm, stencil_to_bsr
    import scipy.sparse

    n, b = 127, 12
    h = 1.0 / (n + 1)
    omega = 2.0 * jnp.pi * 16.0 + 2.0j
    c_full = jnp.ones((n + 2, n + 2))
    A = build_a_stencil(n, b, 81.0, b * h, omega, h, c_full)
    A_bsr = stencil_to_bsr(A)
    C = bsr_spgemm(A_bsr, A_bsr)

    A_sp = A.toscipy()
    C_ref = (A_sp @ A_sp).tocsr()
    C_got = scipy.sparse.bsr_matrix(
        (np.asarray(C.data), np.asarray(C.indices), np.asarray(C.indptr)),
        shape=C.shape).tocsr()
    diff = abs(C_got - C_ref)
    max_diff = diff.max() if diff.nnz else 0.0
    assert max_diff < 1e-8 * abs(C_ref).max()
    # block-tridiagonal squared -> block-pentadiagonal: 5n - 6 blocks
    assert C.data.shape[0] == 5 * n - 6


def test_exact_rebuild_via_spgemm():
    """The reference's algo2_1 factorization self-check (code.py:309-330)
    through the BSR SpGEMM path: rebuild max diff ~1e-11 (reference
    measured 4.6e-12 at n=31)."""
    import jax.numpy as jnp
    from helmholtz_tpu import HelmholtzConfig, assemble_problem
    from helmholtz_tpu.precond.exact import factor_exact, rebuild_via_spgemm

    cfg = HelmholtzConfig(n=31, b=5, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    F = factor_exact(prob.A)
    err = float(rebuild_via_spgemm(prob.A, F))
    scale = float(np.abs(prob.A.todense()).max())
    assert err < 1e-10 * scale
