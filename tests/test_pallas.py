"""Pallas kernel oracles (interpreter mode on CPU — SURVEY.md section 7.1
'interpret-mode path so the whole stack runs on CPU')."""
import jax
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


def _padded_preconditioner(cfg, prob, cdtype):
    from helmholtz_tpu.fd import stencil
    from helmholtz_tpu.precond.sweeping import setup_preconditioner

    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity,
                                   complex_dtype=cdtype)
    P_plain = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=False)
    P_pad = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=True)
    return P_plain, P_pad


def test_pallas_sweep_matches_xla_apply():
    """The Pallas sweep kernel (interpret mode) must reproduce the XLA scan
    apply on the lane-padded layout, for both D2 variants."""
    from helmholtz_tpu.precond.sweeping import apply_preconditioner
    import dataclasses

    cfg = HelmholtzConfig(n=33, b=6, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1", complex_dtype=jnp.complex128)
    P_plain, P_pad = _padded_preconditioner(cfg, prob, jnp.complex128)
    assert P_pad.G.re.shape[-1] == 128     # actually padded
    assert P_plain.G.re.shape[-1] == cfg.n

    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))

    for d2 in (True, False):
        Pp = dataclasses.replace(P_pad, d2_replace=d2)
        P0 = dataclasses.replace(P_plain, d2_replace=d2)
        ref = apply_preconditioner(P0, f, impl="xla")
        pad_xla = apply_preconditioner(Pp, f, impl="xla")
        pad_pallas = apply_preconditioner(Pp, f, impl="pallas")
        np.testing.assert_allclose(np.asarray(pad_xla), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(pad_pallas), np.asarray(ref),
                                   rtol=1e-10, atol=1e-10)


def test_pallas_bsr_spmm_matches_dense():
    """Scalar-prefetch BSR SpMM kernel (interpret mode) vs dense product,
    including an empty block-row."""
    from helmholtz_tpu.core.sparse import BSR
    from helmholtz_tpu.ops.pallas.bsr_spmm import pallas_bsr_matmat

    rng = np.random.default_rng(3)
    bm = bn = 8
    nbr, nbc, K = 6, 5, 16
    dense = (rng.standard_normal((nbr * bm, nbc * bn))
             + 1j * rng.standard_normal((nbr * bm, nbc * bn)))
    # sparsify: keep ~40% of blocks, empty out block-row 3 entirely
    blocks = dense.reshape(nbr, bm, nbc, bn)
    keep = rng.random((nbr, nbc)) < 0.4
    keep[3, :] = False
    keep[0, 0] = True
    dense = (blocks * keep[:, None, :, None]).reshape(nbr * bm, nbc * bn)

    A = BSR.fromdense(jnp.asarray(dense, jnp.complex64), (bm, bn))
    X = (rng.standard_normal((nbc * bn, K))
         + 1j * rng.standard_normal((nbc * bn, K))).astype(np.complex64)
    Y = pallas_bsr_matmat(A, jnp.asarray(X), interpret=True)
    np.testing.assert_allclose(Y.to_np(), dense @ X, rtol=1e-4, atol=1e-4)


def test_pallas_gj_inverse_matches_linalg():
    from helmholtz_tpu.ops.pallas.gj_inverse import pallas_gj_inverse

    rng = np.random.default_rng(4)
    B, k = 5, 96          # odd batch exercises identity padding
    A = (rng.standard_normal((B, k, k))
         + 1j * rng.standard_normal((B, k, k))) / k
    A = A + 2.0 * np.eye(k)
    X = pallas_gj_inverse(CArray.of(jnp.asarray(A)), interpret=True)
    np.testing.assert_allclose(X.to_np(), np.linalg.inv(A),
                               rtol=1e-9, atol=1e-9)


def test_pallas_sweep_shared_g_matches_full_stack():
    """Shared-G broadcast (Mg == 1, the row-invariant-velocity fast path)
    must reproduce the full-stack sweep when every G entry is identical —
    c2 problems under corrected sampling (problems.ROW_INVARIANT_VELOCITY),
    both Pallas (interpret) and XLA paths, single and batched RHS."""
    import dataclasses
    from helmholtz_tpu.core.complexlib import CArray as CA
    from helmholtz_tpu.fd import stencil
    from helmholtz_tpu.precond.sweeping import (
        apply_preconditioner, apply_preconditioner_multi,
        setup_preconditioner)

    cfg = HelmholtzConfig(n=33, b=6, wave_num=2.0, const=20.0,
                          fidelity="corrected")
    prob = assemble_problem(cfg, "c2_f1", complex_dtype=jnp.complex128)
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity,
                                   complex_dtype=jnp.complex128)
    # c2 really is row-invariant: the whole family equals its first entry
    for f in (hm.cc, hm.cw, hm.ce, hm.cs, hm.cn):
        np.testing.assert_array_equal(np.asarray(f),
                                      np.asarray(f[:1]).repeat(f.shape[0], 0))
    P_full = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=True)
    hm1 = jax.tree.map(lambda f: f[:1], hm)
    P_one = setup_preconditioner(prob.A, hm1, cfg.b, pad_lanes=True)
    assert P_one.G.re.shape[0] == 1

    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))
    for impl in ("xla", "pallas"):
        ref = apply_preconditioner(P_full, f, impl=impl)
        got = apply_preconditioner(P_one, f, impl=impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)
    F = jnp.stack([f, 2.0 * f, f.conj()])
    refm = apply_preconditioner_multi(P_full, F, impl="pallas")
    gotm = apply_preconditioner_multi(P_one, F, impl="pallas")
    np.testing.assert_allclose(np.asarray(gotm), np.asarray(refm),
                               rtol=1e-12, atol=1e-12)


def test_pallas_sweep_compressed_g_matches_expanded():
    """Sample-compressed G (g_compress: store every R-th corner inverse,
    lerp the bracketing panels inside the kernel) must reproduce the
    expanded strided stack bit-for-bit up to roundoff on both impls and
    the batched path — the interpolated operator is the same, only its
    materialization differs."""
    from helmholtz_tpu.fd import stencil
    from helmholtz_tpu.precond.sweeping import (
        apply_preconditioner, apply_preconditioner_multi,
        setup_preconditioner)

    cfg = HelmholtzConfig(n=33, b=6, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_exp = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=True,
                                 factor_stride=4)
    P_cmp = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=True,
                                 factor_stride=4, g_compress=True)
    M = cfg.n - cfg.b
    assert P_cmp.G.re.shape[0] == (M - 1) // 4 + 2     # samples only
    assert P_cmp.g_stride == 4 and P_cmp.g_w.shape == (M, 2)
    assert P_cmp.g_lo.shape == (M,)

    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))
    for impl in ("xla", "pallas"):
        a = apply_preconditioner(P_exp, f, impl=impl)
        b = apply_preconditioner(P_cmp, f, impl=impl)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12)
    F = jnp.stack([f, 2.0 * f, f.conj()])
    am = apply_preconditioner_multi(P_exp, F, impl="pallas")
    bm = apply_preconditioner_multi(P_cmp, F, impl="pallas")
    np.testing.assert_allclose(np.asarray(bm), np.asarray(am),
                               rtol=1e-12, atol=1e-12)

    # checkpoint round trip preserves the compressed layout
    import tempfile, os
    from helmholtz_tpu.utils.checkpoint import (load_preconditioner,
                                                save_preconditioner)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.npz")
        save_preconditioner(path, P_cmp)
        P2 = load_preconditioner(path)
    assert P2.g_stride == 4
    c = apply_preconditioner(P2, f, impl="xla")
    np.testing.assert_allclose(np.asarray(c),
                               np.asarray(apply_preconditioner(
                                   P_cmp, f, impl="xla")),
                               rtol=1e-12, atol=1e-12)
