"""Distributed 9-POINT path (round 5: the last leg of the 9-point island
burn-down — VERDICT round 4 task 1d): per-band tridiagonal-coupling
factorization, staged triple-coupling sweep, halo 9-point SpMV, and the
distributed solve certified against the single-chip 9-point pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helmholtz_tpu.dist import (distributed_setup9, distributed_solve,
                                make_mesh)
from helmholtz_tpu.fd import problems as fd_problems
from helmholtz_tpu.fd import stencil

NDEV = 8
N, B = 32, 3
WN, C = 2.0, 20.0


def _single9(n=N, b=B, wave_num=WN, const=C, **setup_kw):
    from helmholtz_tpu.precond.sweeping9 import setup_preconditioner9

    omega = 2 * jnp.pi * wave_num + 2j
    h = 1.0 / (n + 1)
    eta = b * h
    c_full, f = fd_problems.PROBLEMS["c1_f1"](omega, n)
    A9 = stencil.build_a_stencil9(n, b, const, eta, omega, h, c_full,
                                  fidelity="corrected")
    hm9 = stencil.build_hm_stencils9(n, b, const, eta, omega, h, c_full,
                                     fidelity="corrected")
    P = setup_preconditioner9(A9, hm9, b, pad_lanes=False, **setup_kw)
    return A9, hm9, f, P


def _gmres9(A9, P, f, rtol=1e-3, restart=8, maxiter=60):
    from helmholtz_tpu.ops.spmv import stencil9_matvec
    from helmholtz_tpu.solve.gmres import gmres

    L, n = A9.cc.shape
    mv = lambda v: stencil9_matvec(A9, v.reshape(L, n)).reshape(-1)
    return gmres(mv, jnp.asarray(f).reshape(-1), M=P, rtol=rtol,
                 restart=restart, maxiter=maxiter)


def test_row_builders9_match_full_assembly():
    """build_a_stencil9_rows is an exact row slice of the whole-grid
    builder; build_hf_stencil9 matches extract_hf_stencil9."""
    n, b = 24, 4
    omega = 2 * jnp.pi * 2.0 + 2j
    h = 1.0 / (n + 1)
    eta = b * h
    c_full, _ = fd_problems.PROBLEMS["c1_f1"](omega, n)
    A9 = stencil.build_a_stencil9(n, b, 20.0, eta, omega, h, c_full,
                                  fidelity="corrected")
    rows = jnp.arange(6, 14)
    band = stencil.build_a_stencil9_rows(rows, n, b, 20.0, eta, omega, h,
                                         c_full, fidelity="corrected")
    for name in ("cc", "cw", "ce", "cs", "cn", "csw", "cse", "cnw", "cne"):
        np.testing.assert_array_equal(
            np.asarray(getattr(band, name)),
            np.asarray(getattr(A9, name))[6:14], err_msg=name)
    HF_a = stencil.extract_hf_stencil9(A9, b)
    HF_b = stencil.build_hf_stencil9(n, b, 20.0, eta, omega, h, c_full,
                                     fidelity="corrected")
    for name in ("cc", "cw", "ce", "cs", "cn", "csw", "cse", "cnw", "cne"):
        np.testing.assert_array_equal(np.asarray(getattr(HF_a, name)),
                                      np.asarray(getattr(HF_b, name)),
                                      err_msg=name)


def test_halo_stencil9_matvec_matches_single():
    """Sharded 9-point SpMV == single-device stencil9_matvec."""
    from jax.sharding import PartitionSpec as P_
    from helmholtz_tpu.dist.spmv import halo_stencil9_matvec
    from helmholtz_tpu.ops.spmv import stencil9_matvec

    A9, _, f, _ = _single9()
    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((N, N))
                    + 1j * rng.standard_normal((N, N)))
    ref = stencil9_matvec(A9, u)

    def local(Af, uf):
        return halo_stencil9_matvec(Af, uf, "layers", NDEV)

    specs = jax.tree.map(lambda _: P_("layers"), A9)
    got = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(specs, P_("layers")),
        out_specs=P_("layers"), check_vma=False))(A9, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_dist9_setup_matches_single_chip_factors():
    """Per-band 9-point factorization == the single-chip factors,
    row-aligned (F rows zero)."""
    A9, hm9, f, P = _single9()
    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup9(
        mesh, N, B, WN, C, 2.0, "c1_f1", pad_lanes=False)
    G = state.G_pad.to_np()
    assert G.shape == (N, N, N)
    np.testing.assert_array_equal(G[:B], 0)         # F rows zeroed
    np.testing.assert_allclose(G[B:], P.G.to_np(), rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(state.TF.to_np(), P.TF.to_np(),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(state.a_l.to_np(), P.a_l.to_np(),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(state.a_u.to_np(), P.a_u.to_np(),
                               rtol=1e-13, atol=0)
    for name in ("cc", "csw", "cne"):
        np.testing.assert_allclose(
            getattr(A_sh, name).to_np(), np.asarray(getattr(A9, name)),
            rtol=1e-13, atol=0)


def test_dist9_solve_matches_single_chip():
    """Distributed 9-point GMRES (staged tridiagonal sweep + halo 9-point
    SpMV + psum reductions) reproduces the single-chip 9-point solve:
    iterations within +-1, solution close; batched B=2 rides one
    schedule."""
    A9, hm9, f, P = _single9()
    ref = _gmres9(A9, P, f)
    assert bool(ref.converged)

    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup9(
        mesh, N, B, WN, C, 2.0, "c1_f1", pad_lanes=False)
    res = distributed_solve(mesh, A_sh, state, f_sh, rtol=1e-3,
                            restart=8, maxiter=60)
    assert bool(np.asarray(res.converged))
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    # two independently-converged rtol-1e-3 solves agree to the
    # condition-amplified tolerance (~10 * rtol at this config)
    x = res.x.to_np()
    x_ref = np.asarray(ref.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 2e-2

    # batched: element 1 is 0.5x the RHS -> solution 0.5x by linearity
    F = type(f_sh)(jnp.stack([f_sh.re, 0.5 * f_sh.re]),
                   jnp.stack([f_sh.im, 0.5 * f_sh.im]))
    res_b = distributed_solve(mesh, A_sh, state, F, rtol=1e-3,
                              restart=8, maxiter=60)
    X = res_b.x.to_np()
    assert np.abs(np.asarray(res_b.iterations)
                  - int(ref.iterations)).max() <= 1
    assert np.linalg.norm(X[0] - x_ref) / np.linalg.norm(x_ref) < 2e-2
    assert np.linalg.norm(X[1] - 0.5 * x_ref) / np.linalg.norm(x_ref) < 2e-2


def test_dist9_strided_compressed_leaf_exact():
    """Strided + sample-compressed distributed 9-point setup is leaf-exact
    vs the single-chip compressed stack (same global sample anchoring),
    and the compressed distributed solve matches iterations."""
    stride = 4
    A9, hm9, f, Pc = _single9(factor_stride=stride, g_compress=True)
    ref = _gmres9(A9, Pc, f)
    assert bool(ref.converged)

    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup9(
        mesh, N, B, WN, C, 2.0, "c1_f1", pad_lanes=False,
        factor_stride=stride, g_compress=True)
    assert state.g_stride == stride
    # every global sample panel appears (possibly duplicated at band
    # seams) in the per-band shards, bitwise-identically
    Gs = Pc.G.to_np()                     # (Ms, n, n) global samples
    Gd = state.G_pad.to_np()              # (NDEV * Ms_loc, n, n)
    ms_loc = Gd.shape[0] // NDEV
    from helmholtz_tpu.precond.sweeping import band_sample_window
    M = N - B
    for d in range(NDEV):
        s0, s1 = band_sample_window(M, stride, max(d * (N // NDEV), B) - B,
                                    (d + 1) * (N // NDEV) - 1 - B)
        win = Gd[d * ms_loc:(d + 1) * ms_loc]
        idx = np.minimum(s0 + np.arange(ms_loc), Gs.shape[0] - 1)
        np.testing.assert_allclose(win, Gs[idx], rtol=1e-11, atol=1e-11)

    res = distributed_solve(mesh, A_sh, state, f_sh, rtol=1e-3,
                            restart=8, maxiter=60)
    assert bool(np.asarray(res.converged))
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    x = res.x.to_np()
    x_ref = np.asarray(ref.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 2e-2


def test_multisolve_9pt_mesh_matches_single_chip():
    """run_multisolve(stencil='9pt', mesh_devices=8): the driver-level
    distributed 9-point path — iteration counts match the single-chip
    9-point multisolve within +-1."""
    from helmholtz_tpu.driver import run_multisolve

    kw = dict(consts=[C], n_sources=2, rtol=1e-3, maxiter=60,
              stencil="9pt", factor_stride=1)
    [r_single] = run_multisolve(N, B, [WN], **kw)
    [r_mesh] = run_multisolve(N, B, [WN], mesh_devices=NDEV, **kw)
    assert r_mesh["converged"] == [True, True]
    assert r_mesh["mesh_devices"] == NDEV
    assert all(r < 1e-2 for r in r_mesh["true_residuals"])
    for i_s, i_m in zip(r_single["iterations"], r_mesh["iterations"]):
        assert abs(i_s - i_m) <= 1


def test_multisolve_9pt_mesh_amortized_matches_exact():
    """Omega-amortized DISTRIBUTED 9-point sweep (distributed_assemble9 +
    device-local omega-lerp of anchor sample shards): iteration counts
    match the per-frequency-refactored distributed sweep within +-1."""
    from helmholtz_tpu.driver import run_multisolve

    freqs = [2.0, 2.02, 2.04]
    kw = dict(consts=[C], n_sources=2, rtol=1e-3, maxiter=60,
              stencil="9pt", factor_stride=4, g_compress=True,
              mesh_devices=NDEV)
    base = run_multisolve(N, B, freqs, **kw)
    amort = run_multisolve(N, B, freqs, freq_anchor_every=2, **kw)
    assert [r["setup_mode"] for r in amort] == \
        ["factor", "omega_lerp", "factor"]
    for rb, ra in zip(base, amort):
        assert ra["converged"] == [True, True]
        assert ra["mesh_devices"] == NDEV
        for ib, ia in zip(rb["iterations"], ra["iterations"]):
            assert abs(ia - ib) <= 1, (rb["wave_num"], ib, ia)


def test_dist9_ir_df32_reaches_tight_tolerance():
    """Distributed 9-point ir-df32 (halo compensated 9-point residual):
    converges at rtol 1e-5 in complex64 with a true residual to match."""
    from helmholtz_tpu.ops.spmv import stencil9_matvec

    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup9(
        mesh, N, B, WN, C, 2.0, "c1_f1", pad_lanes=False,
        complex_dtype=jnp.complex64)
    res = distributed_solve(mesh, A_sh, state, f_sh, rtol=1e-5,
                            restart=8, maxiter=80, precision="ir-df32")
    assert bool(np.asarray(res.converged))
    # true residual on the host in complex128
    from helmholtz_tpu.core.complexlib import tree_to_np
    A_np = jax.tree.map(lambda a: a.astype(np.complex128),
                        tree_to_np(A_sh))
    from helmholtz_tpu.driver import _host_stencil9_matvec
    x = res.x.to_np().reshape(N, N).astype(np.complex128)
    f_np = f_sh.to_np().reshape(-1).astype(np.complex128)
    r = np.linalg.norm(_host_stencil9_matvec(A_np, x).reshape(-1) - f_np) \
        / np.linalg.norm(f_np)
    assert r < 5e-5
