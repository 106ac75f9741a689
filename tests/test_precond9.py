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
    """The point-mass 9-point operator is complex-symmetric exactly; the
    Mehrstellen-completed default is symmetric up to the variable-c mass
    blending (it discretizes M(k^2 u) with k^2 at the NEIGHBOR sample —
    the 4th-order-correct choice — so the asymmetry is O(h grad k^2)/12,
    small but nonzero for heterogeneous media)."""
    from helmholtz_tpu.fd.stencil import build_a_stencil9

    n, b = 31, 6
    omega = 2 * jnp.pi * 2.0 + 2j
    h = 1.0 / (n + 1)
    c_full, _ = fd_problems.PROBLEMS["c1_f1"](omega, n)
    A9p = build_a_stencil9(n, b, 20.0, b * h, omega, h, c_full,
                           fidelity="corrected", mehrstellen=False)
    Dp = _dense_of_s9(A9p)
    assert np.abs(Dp - Dp.T).max() < 1e-12 * np.abs(Dp).max()
    A9, _, _ = _setup9()
    D = _dense_of_s9(A9)
    assert np.abs(D - D.T).max() < 1e-3 * np.abs(D).max()


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


def test_apply9_pallas_matches_xla_unpadded_wrap():
    """n a multiple of 128 (n_pad == n, no zero pad lanes): the kernel's
    tridiagonal lane rolls wrap REAL row data, so correctness rests solely
    on the assembly-masked edge coefficients killing the wrapped elements
    (advisor round 4 — the n=31 case only ever rolled into zero pads)."""
    from helmholtz_tpu.precond.sweeping9 import (apply_preconditioner9,
                                                 setup_preconditioner9)

    A9, hm9, _ = _setup9(n=128, b=6)
    P = setup_preconditioner9(A9, hm9, 6, pad_lanes=True)
    assert P.G.re.shape[-1] == 128 == A9.cc.shape[-1]   # unpadded layout
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((128, 128))
                    + 1j * rng.standard_normal((128, 128)))
    ref = apply_preconditioner9(P, x, impl="xla")
    got = apply_preconditioner9(P, x, impl="pallas")
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5 * scale)


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


def test_run_solver_9pt_g_compress_matches_dense_strided():
    """g_compress for the 9-point path (round 5 island burn-down item a):
    the compressed sample-panel storage applies the SAME interpolant as
    the expanded strided stack, so iteration counts match exactly."""
    from helmholtz_tpu.driver import run_solver

    r_dense = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3,
                         maxiter=60, factor_stride=4)
    r_comp = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3,
                        maxiter=60, factor_stride=4, g_compress=True)
    assert r_comp.converged
    assert r_comp.config["g_compress"] is True
    assert r_comp.iterations == r_dense.iterations
    assert abs(r_comp.true_residual - r_dense.true_residual) < 1e-6


def test_setup9_g_compress_stores_samples_only():
    A9, hm9, _ = _setup9(n=31, b=6)
    from helmholtz_tpu.precond.sweeping9 import (apply_preconditioner9,
                                                 setup_preconditioner9)

    Pd = setup_preconditioner9(A9, hm9, 6, pad_lanes=False, factor_stride=4)
    Pc = setup_preconditioner9(A9, hm9, 6, pad_lanes=False, factor_stride=4,
                               g_compress=True)
    M = 31 - 6
    assert Pd.G.re.shape[0] == M
    assert Pc.G.re.shape[0] == (M - 1) // 4 + 2       # sample stack only
    assert Pc.g_stride == 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((31, 31))
                    + 1j * rng.standard_normal((31, 31)))
    ref = apply_preconditioner9(Pd, x, impl="xla")
    got = apply_preconditioner9(Pc, x, impl="xla")
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5 * scale)


def test_stencil9_residual_comp_tracks_oracle():
    """Compensated 9-point residual in complex64 must track the complex128
    oracle far below the plain-f32 cancellation floor."""
    import jax

    from helmholtz_tpu.core.df32 import DF32, stencil9_residual_comp
    from helmholtz_tpu.driver import _host_stencil9_matvec
    from helmholtz_tpu.core.complexlib import pairify, tree_to_np

    n = 31
    omega = 2 * jnp.pi * 4.0 + 2j
    h = 1.0 / (n + 1)
    c_full, f = fd_problems.PROBLEMS["c1_f1"](omega, n,
                                              complex_dtype=jnp.complex64)
    A9 = build_a_stencil9(n, 6, 30.0, 6 * h, jnp.complex64(omega), h,
                          c_full, fidelity="corrected",
                          complex_dtype=jnp.complex64)
    A_np = tree_to_np(pairify(A9))
    rng = np.random.default_rng(11)
    x64 = (rng.standard_normal((n, n))
           + 1j * rng.standard_normal((n, n))).astype(np.complex128)
    b64 = _host_stencil9_matvec(
        jax.tree.map(lambda a: a.astype(np.complex128), A_np), x64) \
        + 1e-5 * (rng.standard_normal((n, n)))
    x_hi = x64.astype(np.complex64)
    x_lo = (x64 - x_hi.astype(np.complex128)).astype(np.complex64)
    b32 = b64.astype(np.complex64)
    # complex128 oracle of the same rounded inputs
    r_ref = b32.astype(np.complex128) - _host_stencil9_matvec(
        jax.tree.map(lambda a: a.astype(np.complex128), A_np),
        x_hi.astype(np.complex128) + x_lo.astype(np.complex128))
    got = np.asarray(stencil9_residual_comp(
        A9, jnp.asarray(b32), DF32(jnp.asarray(x_hi), jnp.asarray(x_lo))))
    scale = float(np.abs(b64).max())
    # plain f32 evaluation for contrast
    plain = np.asarray(b32 - np.asarray(_host_stencil9_matvec(
        A_np, x_hi + x_lo), np.complex64))
    err_comp = np.abs(got - r_ref).max() / scale
    err_plain = np.abs(plain - r_ref).max() / scale
    assert err_comp < 3e-7
    assert err_comp < err_plain


def test_run_solver_9pt_ir_df32_and_refine():
    """ir-df32 + precond_refine on the 9-point path (island burn-down
    item b): reaches a tight tolerance with a true residual to match."""
    from helmholtz_tpu.driver import run_solver

    r = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-6,
                   maxiter=80, precision="ir-df32", precond_refine=1,
                   complex_dtype=jnp.complex64)
    assert r.converged
    assert r.true_residual < 1e-5
    assert r.config["precision"] == "ir-df32"
    assert r.config["precond_refine"] == 1


def test_run_solver_9pt_thin_pml_refused():
    """The b ~ n/14 recipe is enforced, not a docstring: the 5-point
    default b=12 at n=511 is refused noisily (VERDICT round 4 Weak #2),
    with an explicit opt-out."""
    import os

    import pytest

    from helmholtz_tpu.driver import min_pml_width9, run_solver

    assert min_pml_width9(63) <= 12          # reference scales unaffected
    assert min_pml_width9(511) == 37
    with pytest.raises(ValueError, match="n/14"):
        run_solver(511, 12, 64.0, 60.0, stencil="9pt")
    from helmholtz_tpu.driver import run_multisolve
    with pytest.raises(ValueError, match="n/14"):
        run_multisolve(511, 12, [64.0], stencil="9pt")
    os.environ["HELMHOLTZ_TPU_9PT_ALLOW_THIN_PML"] = "1"
    try:
        # opt-out reaches the solver (tiny budget — we only check that the
        # guard stands aside, not convergence)
        r = run_solver(255, 12, 8.0, 60.0, stencil="9pt", rtol=1e-3,
                       maxiter=1)
        assert not r.converged or r.iterations <= 1
    finally:
        del os.environ["HELMHOLTZ_TPU_9PT_ALLOW_THIN_PML"]


def test_multisolve_9pt_freq_amortized_matches_exact_setup():
    """Omega-amortized 9-point sweep (island burn-down item c): the lerp
    of anchor sample stacks is stencil-agnostic; iteration counts match
    the per-frequency-refactored 9-point sweep within +-1."""
    from helmholtz_tpu.driver import run_multisolve

    freqs = [4.0, 4.05, 4.1, 4.15, 4.2]
    kw = dict(consts=[61.0], n_sources=2, rtol=1e-3, maxiter=60,
              factor_stride=4, g_compress=True, stencil="9pt")
    base = run_multisolve(63, 12, freqs, **kw)
    amort = run_multisolve(63, 12, freqs, freq_anchor_every=4, **kw)
    modes = [r["setup_mode"] for r in amort]
    assert modes == ["factor", "omega_lerp", "omega_lerp", "omega_lerp",
                     "factor"]
    for rb, ra in zip(base, amort):
        assert ra["converged"] == [True, True]
        assert ra["stencil"] == "9pt"
        assert all(r < 1e-2 for r in ra["true_residuals"])
        for ib, ia in zip(rb["iterations"], ra["iterations"]):
            assert abs(ia - ib) <= 1, (rb["wave_num"], ib, ia)


def test_run_solver_9pt_bf16_state_parity():
    """bf16 G + bf16 block-Thomas TF (round 5: the capacity layout) keep
    iteration counts within +-1 of the working-precision state."""
    from helmholtz_tpu.driver import run_solver

    rw = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3,
                    maxiter=60, complex_dtype=jnp.complex64)
    rb = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3,
                    maxiter=60, complex_dtype=jnp.complex64,
                    g_dtype="bf16")
    assert rb.converged
    assert abs(rb.iterations - rw.iterations) <= 1
    assert rb.true_residual < 5e-3


def test_hostchunk_setup9_matches_fused():
    """The host-driven chunked capacity setup (one small program per
    chunk, donated G writes — the n=2047 workaround for the backend's
    program-size miscompile) is leaf-exact vs the fused in-jit setup."""
    import jax.numpy as jnp

    from helmholtz_tpu.driver import (_assemble_factor9_hostchunks,
                                      _assemble_factor9_stage)

    kw = dict(n=63, b=12, problem="c1_f1", fidelity="corrected",
              cdtype=jnp.complex128, factor_stride=4, g_dtype="working",
              setup_chunk=16, g_compress=True)
    A1, f1, P1 = _assemble_factor9_hostchunks(4.0, 61.0, 2.0, 2.0 / 3.0,
                                              **kw)
    A2, f2, P2 = _assemble_factor9_stage(
        jnp.asarray(4.0), jnp.asarray(61.0), jnp.asarray(2.0),
        jnp.asarray(2.0 / 3.0), **kw)
    np.testing.assert_allclose(P1.G.to_np(), P2.G.to_np(),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(P1.TF.to_np(), P2.TF.to_np(),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(P1.g_lo), np.asarray(P2.g_lo))
    np.testing.assert_allclose(f1.to_np(), f2.to_np(), rtol=1e-12)
    for name in ("cc", "csw", "cne"):
        np.testing.assert_allclose(getattr(A1, name).to_np(),
                                   getattr(A2, name).to_np(), rtol=1e-13)


def test_sweep_checkpoint_does_not_cross_stencils():
    """A 5pt checkpoint must never satisfy a 9pt resume (advisor round 4
    medium: the old key omitted the solver-defining knobs)."""
    from helmholtz_tpu.driver import multisolve_key_config
    from helmholtz_tpu.solve.resumable import SweepCheckpoint

    t5 = multisolve_key_config(63, 12, "c1_f1", 1e-3, 2)
    t9 = multisolve_key_config(63, 12, "c1_f1", 1e-3, 2, stencil="9pt")
    rec5 = {**t5, "wave_num": 4.0, "const": 61.0}
    ck = SweepCheckpoint("")
    ck.records = [rec5]
    # the 5pt record matches the 5pt template...
    keys5 = {SweepCheckpoint.key_of(r) for r in ck.matching(t5)}
    assert SweepCheckpoint.key_of(
        {**t5, "wave_num": 4.0, "const": 61.0}) in keys5
    # ...and is invisible to the 9pt template
    assert ck.matching(t9) == []
    # likewise across precision and g_dtype
    t_ir = multisolve_key_config(63, 12, "c1_f1", 1e-3, 2,
                                 precision="ir-df32")
    assert ck.matching(t_ir) == []


def test_9pt_iteration_parity_vs_scipy_oracle():
    """Iteration parity against the INDEPENDENT scipy/SuperLU 9-point
    oracle (bench.ref_oracle.run_oracle9 — a different lineage: per-m
    SuperLU subgrid solves vs the framework's batched tridiagonal Schur
    recursion), pinning the 9-point solver the way ORACLE.json pins the
    5-point path (VERDICT round 4 item 3)."""
    from helmholtz_tpu.bench.ref_oracle import run_oracle9
    from helmholtz_tpu.driver import run_solver

    [orec] = run_oracle9(63, b=12, wave_num=4.0, const=61.0, rtols=(1e-3,),
                         maxiter=60)
    assert orec["info"] == 0 and orec["true_residual"] < 1e-2
    r = run_solver(63, 12, 4.0, 61.0, stencil="9pt", rtol=1e-3, maxiter=60,
                   factor_stride=1)
    assert r.converged
    assert abs(r.iterations - orec["iters"]) <= 1, \
        (r.iterations, orec["iters"])


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
