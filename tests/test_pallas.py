"""Pallas kernel oracles (interpreter mode on CPU — SURVEY.md section 7.1
'interpret-mode path so the whole stack runs on CPU')."""
import numpy as np

import jax.numpy as jnp

from helmholtz_tpu import HelmholtzConfig, assemble_problem
from helmholtz_tpu.core.complexlib import CArray, pairify
from helmholtz_tpu.ops.pallas.spmv_stencil import pallas_stencil_matvec


def test_pallas_stencil_spmv_matches_dense():
    cfg = HelmholtzConfig(n=33, b=6, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1", complex_dtype=jnp.complex64)
    A_pair = pairify(prob.A)
    rng = np.random.default_rng(0)
    u = (rng.standard_normal((cfg.n, cfg.n))
         + 1j * rng.standard_normal((cfg.n, cfg.n))).astype(np.complex64)

    y = pallas_stencil_matvec(A_pair, CArray.of(jnp.asarray(u)),
                              block_layers=16, interpret=True)
    y_ref = (prob.A.todense() @ u.reshape(-1)).reshape(cfg.n, cfg.n)
    np.testing.assert_allclose(y.to_np(), y_ref, rtol=2e-5,
                               atol=2e-5 * np.abs(y_ref).max())


def test_pallas_stencil_spmv_block_not_dividing():
    # L=33 with block 8 exercises the layer padding path
    cfg = HelmholtzConfig(n=33, b=6, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1", complex_dtype=jnp.complex64)
    A_pair = pairify(prob.A)
    u = jnp.ones((cfg.n, cfg.n), jnp.complex64)
    y = pallas_stencil_matvec(A_pair, CArray.of(u), block_layers=8,
                              interpret=True)
    y_ref = (prob.A.todense() @ np.ones(cfg.n**2)).reshape(cfg.n, cfg.n)
    np.testing.assert_allclose(y.to_np(), y_ref, rtol=2e-5,
                               atol=2e-5 * np.abs(y_ref).max())
