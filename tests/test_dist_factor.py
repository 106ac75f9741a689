"""Distributed factorization tests (VERDICT round 2 item 1): setup memory
scales with devices — each device assembles + factors its own row band
inside shard_map; no single-device G stack is ever materialized."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helmholtz_tpu import HelmholtzConfig, assemble_problem
from helmholtz_tpu.dist import (dist_state_from_preconditioner,
                                distributed_setup, distributed_solve,
                                make_mesh)
from helmholtz_tpu.fd import stencil
from helmholtz_tpu.precond import setup_preconditioner

NDEV = 8


def _single_reference(n=32, b=3, wave_num=2.0, const=20.0):
    cfg = HelmholtzConfig(n=n, b=b, wave_num=wave_num, const=const)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_ = setup_preconditioner(prob.A, hm, cfg.b)
    return cfg, prob, P_


def test_row_builders_match_full_assembly():
    """The band builders are exact row slices of the whole-grid builders."""
    cfg = HelmholtzConfig(n=24, b=4, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    rows = jnp.arange(6, 14)
    A_band = stencil.build_a_stencil_rows(
        rows, cfg.n, cfg.b, cfg.const, cfg.eta, cfg.omega, cfg.h,
        prob.c_full, fidelity=cfg.fidelity)
    for name in ("cc", "cw", "ce", "cs", "cn"):
        np.testing.assert_array_equal(
            np.asarray(getattr(A_band, name)),
            np.asarray(getattr(prob.A, name))[6:14])

    hm_full = stencil.build_hm_stencils(
        cfg.n, cfg.b, cfg.const, cfg.eta, cfg.omega, cfg.h, prob.c_full,
        fidelity=cfg.fidelity)
    hm_band = stencil.build_hm_stencils_rows(
        rows, cfg.n, cfg.b, cfg.const, cfg.eta, cfg.omega, cfg.h,
        prob.c_full, fidelity=cfg.fidelity)
    # row j (0-based) corresponds to family entry j - b in the full build
    for name in ("cc", "cw", "ce", "cs", "cn"):
        np.testing.assert_array_equal(
            np.asarray(getattr(hm_band, name)),
            np.asarray(getattr(hm_full, name))[6 - cfg.b:14 - cfg.b])


def test_hf_standalone_matches_extracted():
    cfg = HelmholtzConfig(n=24, b=4, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    for full in (True, False):
        HF_a = stencil.extract_hf_stencil(prob.A, cfg.b, full_coupling=full)
        HF_b = stencil.build_hf_stencil(
            cfg.n, cfg.b, cfg.const, cfg.eta, cfg.omega, cfg.h, prob.c_full,
            full_coupling=full, fidelity=cfg.fidelity)
        for name in ("cc", "cw", "ce", "cs", "cn"):
            np.testing.assert_array_equal(
                np.asarray(getattr(HF_a, name)),
                np.asarray(getattr(HF_b, name)))


def test_distributed_setup_matches_single_device_factors():
    """Per-band factorization == single-device factorization, leaf by leaf."""
    cfg, prob, P_ = _single_reference()
    ref = dist_state_from_preconditioner(P_)
    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup(
        mesh, cfg.n, cfg.b, cfg.wave_num, cfg.const, cfg.alpha, "c1_f1",
        fidelity=cfg.fidelity)

    np.testing.assert_allclose(state.G_pad.to_np(), ref.G_pad.to_np(),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.TF.to_np(), ref.TF.to_np(),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.a_cs.to_np(), ref.a_cs.to_np(),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(state.a_cn.to_np(), ref.a_cn.to_np(),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(state.hf_cs.to_np(), ref.hf_cs.to_np(),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(state.hf_cn.to_np(), ref.hf_cn.to_np(),
                               rtol=1e-13, atol=0)
    # the assembled shards reproduce the whole-grid operator and RHS
    for name in ("cc", "cw", "ce", "cs", "cn"):
        np.testing.assert_allclose(
            getattr(A_sh, name).to_np(), np.asarray(getattr(prob.A, name)),
            rtol=1e-13, atol=0)
    np.testing.assert_allclose(f_sh.to_np(), np.asarray(prob.f_grid),
                               rtol=1e-13, atol=0)


def test_distributed_setup_no_device_holds_full_g():
    """Shard accounting: every G_pad shard is exactly one row band —
    per-device factor memory is 1/NDEV of the stack (the property that
    unblocks grids whose full G exceeds one chip's HBM)."""
    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    mesh = make_mesh(NDEV)
    _, state, _ = distributed_setup(
        mesh, cfg.n, cfg.b, cfg.wave_num, cfg.const, cfg.alpha, "c1_f1")
    n_loc = cfg.n // NDEV
    shards = state.G_pad.re.addressable_shards
    assert len(shards) == NDEV
    for s in shards:
        assert s.data.shape == (n_loc, cfg.n, cfg.n)

    # bench.plan accounting for the target scale: full G at n=2047 exceeds
    # one 16 GB chip, the 8-device row-sharded setup fits per device.
    from helmholtz_tpu.bench.plan import plan, plan_distributed
    p = plan(2047, g_dtype="bf16")
    assert not p["fits_single_chip"]
    assert p["min_devices_row_sharded"] <= 8
    assert p["per_device_gb_at_min"] < 0.92 * p["hbm_gb"]
    # strided+compressed distributed setup at the config-4/5 point
    # (VERDICT round 3 item 1 DoD): stride 8 on 8 devices cuts per-device
    # setup flops to ~1/8 and per-device G to sample panels only
    pd = plan_distributed(2047, devices=8, factor_stride=8,
                          g_dtype="bf16", g_compress=True)
    assert pd["setup_flop_fraction_vs_dense"] < 0.15
    assert pd["per_device_g_gb"] < 0.15 * pd["per_device_g_gb_dense"]
    assert pd["fits_per_device"]


def test_distributed_setup_solve_end_to_end():
    """distributed_solve on distributed-setup state matches the solve on
    single-device-factored state (same iterations, same solution)."""
    cfg, prob, P_ = _single_reference()
    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup(
        mesh, cfg.n, cfg.b, cfg.wave_num, cfg.const, cfg.alpha, "c1_f1")

    res_d = distributed_solve(mesh, A_sh, state, f_sh, rtol=1e-3,
                              maxiter=200)
    ref_state = dist_state_from_preconditioner(P_)
    res_ref = distributed_solve(mesh, prob.A, ref_state, prob.f_grid,
                                rtol=1e-3, maxiter=200)
    assert bool(res_d.converged)
    assert int(res_d.iterations) == int(res_ref.iterations)
    np.testing.assert_allclose(res_d.x.to_np(), res_ref.x.to_np(),
                               rtol=1e-8, atol=1e-10)


def test_distributed_multisolve_config5_shape():
    """BASELINE config 5 end-to-end on the mesh: frequencies x batched
    sources through distributed_solve on per-band-factored shards
    (VERDICT round 2 item 3)."""
    from helmholtz_tpu.driver import run_multisolve

    n, b, K = 64, 6, 3
    recs = run_multisolve(n, b, [4.0, 6.0], consts=[61.0],
                          problem="c1_f1", n_sources=K, rtol=1e-3,
                          maxiter=100, mesh_devices=NDEV)
    assert len(recs) == 2
    for rec in recs:
        assert rec["mesh_devices"] == NDEV
        assert len(rec["iterations"]) == K
        assert all(rec["converged"])
        assert all(r < 2e-3 for r in rec["true_residuals"])
        # per-device G is exactly one row band (split-real)
        n_loc = n // NDEV
        itemsize = 8 if jax.config.jax_enable_x64 else 4
        assert rec["per_device_g_bytes"] == 2 * n_loc * n * n * itemsize

    # distributed records match the single-chip multisolve iteration counts
    recs_s = run_multisolve(n, b, [4.0, 6.0], consts=[61.0],
                            problem="c1_f1", n_sources=K, rtol=1e-3,
                            maxiter=100)
    for rd, rs in zip(recs, recs_s):
        assert rd["iterations"] == rs["iterations"]


def test_distributed_strided_setup_matches_single_chip_strided():
    """Strided distributed factorization (VERDICT round 3 item 1): each
    device factors only its band's bracketing samples; the expanded dense
    shards equal the single-chip strided stack leaf-for-leaf (identical
    sample positions and interpolation weights)."""
    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_str = setup_preconditioner(prob.A, hm, cfg.b, factor_stride=4)
    ref = dist_state_from_preconditioner(P_str)
    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup(
        mesh, cfg.n, cfg.b, cfg.wave_num, cfg.const, cfg.alpha, "c1_f1",
        factor_stride=4)
    assert state.g_stride == 0          # dense expanded storage
    np.testing.assert_allclose(state.G_pad.to_np(), ref.G_pad.to_np(),
                               rtol=1e-12, atol=1e-12)

    # and the end-to-end distributed solve matches the single-chip strided
    # iteration count
    res_d = distributed_solve(mesh, A_sh, state, f_sh, rtol=1e-3,
                              maxiter=200)
    from helmholtz_tpu.ops.spmv import stencil_matvec_flat
    from helmholtz_tpu.solve.gmres import gmres
    res_s = gmres(lambda v: stencil_matvec_flat(prob.A, v), prob.f_vec,
                  M=P_str, rtol=1e-3, maxiter=200)
    assert bool(res_d.converged)
    assert int(res_d.iterations) == int(res_s.iterations)


def test_distributed_compressed_setup_and_solve():
    """Compressed distributed factorization: every device stores only its
    sample panels (~stride-fold less factor memory), per-row weights are
    applied inside the sweep, and the solve matches the single-chip
    compressed path's iteration count (VERDICT round 3 item 1)."""
    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_cmp = setup_preconditioner(prob.A, hm, cfg.b, factor_stride=4,
                                 g_compress=True)
    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup(
        mesh, cfg.n, cfg.b, cfg.wave_num, cfg.const, cfg.alpha, "c1_f1",
        factor_stride=4, g_compress=True)
    assert state.g_stride == 4
    # shard accounting: sample panels only, uniformly banded
    n_dev_panels = state.G_pad.re.shape[0]
    assert n_dev_panels < cfg.n            # fewer panels than rows
    assert n_dev_panels % NDEV == 0
    for s in state.G_pad.re.addressable_shards:
        assert s.data.shape[0] == n_dev_panels // NDEV

    res_d = distributed_solve(mesh, A_sh, state, f_sh, rtol=1e-3,
                              maxiter=200)
    from helmholtz_tpu.ops.spmv import stencil_matvec_flat
    from helmholtz_tpu.solve.gmres import gmres
    res_s = gmres(lambda v: stencil_matvec_flat(prob.A, v), prob.f_vec,
                  M=P_cmp, rtol=1e-3, maxiter=200)
    assert bool(res_d.converged)
    assert int(res_d.iterations) == int(res_s.iterations)
    np.testing.assert_allclose(res_d.x.to_np(), np.asarray(res_s.x),
                               rtol=1e-4, atol=1e-7)


def test_compressed_state_from_preconditioner_apply_exact():
    """dist_state_from_preconditioner re-lays the single-chip compressed
    sample stack into per-band shards carrying the EXACT single-chip
    interpolant — the distributed apply equals the single-chip compressed
    apply to roundoff (both impls)."""
    from helmholtz_tpu.precond.sweeping import apply_preconditioner

    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_cmp = setup_preconditioner(prob.A, hm, cfg.b, factor_stride=4,
                                 g_compress=True, pad_lanes=True)
    state = dist_state_from_preconditioner(P_cmp, n_devices=NDEV)
    assert state.g_stride == 4

    from test_dist import _dist_apply
    rng = np.random.default_rng(11)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))
    u_ref = np.asarray(apply_preconditioner(P_cmp, f, impl="xla"))
    for impl in ("xla", "pallas"):
        u_d = _dist_apply(state, f, cfg.n, impl=impl)
        np.testing.assert_allclose(u_d, u_ref, rtol=1e-9, atol=1e-9)

    # converter refuses silently wrong layouts
    with pytest.raises(ValueError):
        dist_state_from_preconditioner(P_cmp)


def test_distributed_setup_bf16_storage():
    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    mesh = make_mesh(NDEV)
    A_sh, state, f_sh = distributed_setup(
        mesh, cfg.n, cfg.b, cfg.wave_num, cfg.const, cfg.alpha, "c1_f1",
        g_dtype="bf16")
    assert state.G_pad.re.dtype == jnp.bfloat16
    res = distributed_solve(mesh, A_sh, state, f_sh, rtol=1e-3, maxiter=200)
    assert bool(res.converged)


def test_distributed_multisolve_freq_amortized():
    """Omega-amortized DISTRIBUTED sweep: anchors factor per-band inside
    shard_map, intermediates lerp the anchor sample shards device-local
    (dist.factor.distributed_assemble) — iteration parity with the
    per-frequency-refactored distributed sweep, all sources converged."""
    from helmholtz_tpu.driver import run_multisolve

    freqs = [4.0, 4.1, 4.2]
    kw = dict(consts=[61.0], n_sources=2, rtol=1e-3, maxiter=60,
              factor_stride=4, g_compress=True, mesh_devices=4)
    base = run_multisolve(64, 12, freqs, **kw)
    amort = run_multisolve(64, 12, freqs, freq_anchor_every=2, **kw)
    assert [r["setup_mode"] for r in amort] == ["factor", "omega_lerp",
                                                "factor"]
    for rb, ra in zip(base, amort):
        assert ra["converged"] == [True, True]
        assert all(r < 1e-2 for r in ra["true_residuals"])
        for ib, ia in zip(rb["iterations"], ra["iterations"]):
            assert abs(ia - ib) <= 1, (rb["wave_num"], ib, ia)
        assert ra["per_device_g_bytes"] > 0
