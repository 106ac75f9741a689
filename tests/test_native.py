"""Native host runtime (csrc/hostlin.cpp via ctypes) vs scipy/numpy oracles."""
import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

from helmholtz_tpu import HelmholtzConfig, assemble_problem
from helmholtz_tpu.core import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable")


def _problem(n=31, b=8):
    cfg = HelmholtzConfig(n=n, b=b, wave_num=2.0, const=30.0)
    return cfg, assemble_problem(cfg)


def test_stencil_to_csr_matches_scipy():
    cfg, prob = _problem()
    indptr, indices, data = native.stencil_to_csr(
        np.asarray(prob.A.cc), np.asarray(prob.A.cw), np.asarray(prob.A.ce),
        np.asarray(prob.A.cs), np.asarray(prob.A.cn))
    A_native = scipy.sparse.csr_matrix((data, indices, indptr),
                                       shape=(cfg.n**2, cfg.n**2))
    A_ref = prob.A.toscipy()
    assert A_native.nnz == A_ref.nnz == 5 * cfg.n**2 - 4 * cfg.n
    assert abs(A_native - A_ref).max() == 0.0


def test_coo_to_csr_matches_scipy():
    rng = np.random.default_rng(0)
    nnz, nrows, ncols = 500, 40, 30
    row = rng.integers(0, nrows, nnz).astype(np.int32)
    col = rng.integers(0, ncols, nnz).astype(np.int32)
    val = rng.standard_normal(nnz) + 1j * rng.standard_normal(nnz)
    indptr, indices, data = native.coo_to_csr(row, col, val, nrows)
    A_native = scipy.sparse.csr_matrix((data, indices, indptr),
                                       shape=(nrows, ncols))
    A_ref = scipy.sparse.coo_matrix((val, (row, col)),
                                    shape=(nrows, ncols)).tocsr()
    assert abs(A_native - A_ref).max() < 1e-15


def test_native_csr_spmv():
    cfg, prob = _problem()
    A = prob.A.toscipy()
    x = (np.random.default_rng(1).standard_normal(cfg.n**2)
         + 1j * np.random.default_rng(2).standard_normal(cfg.n**2))
    y = native.csr_spmv(A.indptr, A.indices, A.data, x)
    np.testing.assert_allclose(y, A @ x, rtol=1e-13)


def test_native_block_thomas_is_direct_solver():
    # factor the whole operator A and solve: must equal scipy spsolve
    cfg, prob = _problem(n=23, b=6)
    F = native.BlockThomasFactorization(
        np.asarray(prob.A.cw), np.asarray(prob.A.cc), np.asarray(prob.A.ce),
        np.asarray(prob.A.cs), np.asarray(prob.A.cn))
    f = np.asarray(prob.f_vec)
    u = F.solve(f).reshape(-1)
    A = prob.A.toscipy().tocsc()
    u_ref = scipy.sparse.linalg.spsolve(A, f)
    np.testing.assert_allclose(u, u_ref, rtol=1e-9)
    # second solve reuses the factorization
    u2 = F.solve(2.0 * f).reshape(-1)
    np.testing.assert_allclose(u2, 2.0 * u_ref, rtol=1e-9)
