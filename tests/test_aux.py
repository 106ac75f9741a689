"""Auxiliary subsystems: CLI, checkpoint, viz, metrics logging."""
import json
import os

import numpy as np

from helmholtz_tpu.cli import main as cli_main
from helmholtz_tpu.utils.checkpoint import (load_preconditioner,
                                            load_report_arrays,
                                            save_preconditioner, save_report)
from helmholtz_tpu.utils.logging import GmresCounter


def test_cli_solve_with_artifacts(tmp_path, capsys):
    png = tmp_path / "u.png"
    rpng = tmp_path / "res.png"
    met = tmp_path / "m.jsonl"
    npz = tmp_path / "sol.npz"
    rc = cli_main(["solve", "--n", "31", "--b", "8", "--wave-num", "2",
                   "--const", "30", "--plot", str(png),
                   "--plot-residuals", str(rpng),
                   "--metrics", str(met), "--save", str(npz)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "GMRES iterations with preconditioner:" in out
    assert png.exists() and rpng.exists()
    rec = json.loads(met.read_text().strip())
    assert rec["converged"] and rec["iterations"] <= 6
    u, hist, meta = load_report_arrays(str(npz))
    assert u.shape == (31, 31) and meta["n"] == 31


def test_cli_bicgstab_and_fidelity_flags(tmp_path):
    rc = cli_main(["solve", "--n", "31", "--b", "8", "--wave-num", "2",
                   "--const", "30", "--method", "bicgstab", "--quiet"])
    assert rc == 0
    # as-shipped D3: converges but slowly -> still exit 0 with maxiter room
    rc = cli_main(["solve", "--n", "31", "--b", "8", "--wave-num", "2",
                   "--const", "30", "--block-diag-hf", "--maxiter", "200",
                   "--quiet"])
    assert rc == 0


def test_precond_checkpoint_roundtrip(tmp_path):
    from helmholtz_tpu.driver import build_preconditioner
    P_pair, A_pair, f_pair = build_preconditioner(31, 8, 2.0, 30.0)
    path = save_preconditioner(str(tmp_path / "P.npz"), P_pair)
    P2 = load_preconditioner(path)
    np.testing.assert_array_equal(np.asarray(P_pair.G.re),
                                  np.asarray(P2.G.re))
    assert P2.b == P_pair.b and P2.d2_replace == P_pair.d2_replace
    # loaded state solves identically
    import jax.numpy as jnp
    from helmholtz_tpu.core.complexlib import complexify
    from helmholtz_tpu.ops.spmv import stencil_matvec_flat
    from helmholtz_tpu.solve import gmres
    A = complexify(A_pair)
    f = complexify(f_pair).reshape(-1)
    r1 = gmres(lambda v: stencil_matvec_flat(A, v), f, M=P_pair, rtol=1e-3)
    r2 = gmres(lambda v: stencil_matvec_flat(A, v), f, M=P2, rtol=1e-3)
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-12)


def test_gmres_counter_replay(capsys):
    c = GmresCounter(disp=True)
    c.replay([1e-1, 1e-3, float("nan")])
    out = capsys.readouterr().out
    assert c.niter == 2 and "iter   1" in out


def test_roofline_measure_sweep_smoke():
    from helmholtz_tpu.bench.roofline import measure_sweep

    r = measure_sweep(n=17, b=4)
    assert r["subgrids"] == 13
    assert r["s_per_apply"] > 0
    assert np.isfinite(r["effective_gb_per_s"])


def test_resumable_gmres_kill_and_resume_matches_uninterrupted(tmp_path):
    """Kill after one checkpoint segment, resume, and reproduce the
    uninterrupted run (VERDICT round 1 item 9): checkpoints align with
    restart boundaries, so the iteration sequence is identical."""
    import jax.numpy as jnp
    from helmholtz_tpu import HelmholtzConfig, assemble_problem
    from helmholtz_tpu.fd import stencil as fd_stencil
    from helmholtz_tpu.ops.spmv import stencil_matvec_flat
    from helmholtz_tpu.precond import setup_preconditioner
    from helmholtz_tpu.solve import gmres
    from helmholtz_tpu.solve.resumable import (load_krylov_state,
                                               resumable_gmres)

    cfg = HelmholtzConfig(n=31, b=5, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = fd_stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                      cfg.omega, cfg.h, prob.c_full,
                                      fidelity=cfg.fidelity)
    P_ = setup_preconditioner(prob.A, hm, cfg.b)
    mv = lambda v: stencil_matvec_flat(prob.A, v)
    kw = dict(restart=3, rtol=1e-10, maxiter=30)   # force several cycles

    ref = gmres(mv, prob.f_vec, M=P_, **kw)
    assert bool(ref.converged) and int(ref.iterations) > 3

    path = str(tmp_path / "krylov.npz")
    # session 1: killed after ONE restart cycle (budget 3 iterations)
    part = resumable_gmres(mv, prob.f_vec, M=P_, checkpoint_path=path,
                           restart=3, rtol=1e-10, maxiter=3)
    assert not bool(part.converged)
    _, it1, _, _ = load_krylov_state(path)
    assert it1 == 3
    # session 2: fresh process state, resume to completion
    full = resumable_gmres(mv, prob.f_vec, M=P_, checkpoint_path=path,
                           restart=3, rtol=1e-10, maxiter=30)
    assert bool(full.converged)
    assert int(full.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(full.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-14)
    h_full = np.asarray(full.history)[:int(full.iterations)]
    h_ref = np.asarray(ref.history)
    h_ref = h_ref[~np.isnan(h_ref)][:int(ref.iterations)]
    np.testing.assert_allclose(h_full, h_ref, rtol=1e-10)


def test_sweep_checkpoint_records_and_skips(tmp_path):
    from helmholtz_tpu.solve.resumable import SweepCheckpoint

    path = str(tmp_path / "sweep.jsonl")
    ck = SweepCheckpoint(path)
    assert ck.done_keys() == set()
    rec = {"n": 63, "b": 12, "problem": "c1_f1", "wave_num": 8.0,
           "const": 61.0, "rtol": 1e-3, "n_sources": 2,
           "converged": [True]}
    ck.add(rec)
    ck2 = SweepCheckpoint(path)       # fresh process
    assert ck2.done_keys() == {SweepCheckpoint.key_of(rec)}
    assert ck2.records[0]["converged"] == [True]
    # a changed config must NOT match (stale-record guard)
    assert SweepCheckpoint.key_of({**rec, "rtol": 1e-6}) \
        not in ck2.done_keys()
    assert ck2.matching({**rec, "n_sources": 8}) == []
    assert len(ck2.matching(rec)) == 1


def test_multisolve_driver_batched_sources():
    """run_multisolve: per-source convergence on the CPU oracle config."""
    from helmholtz_tpu.driver import run_multisolve

    [rec] = run_multisolve(31, 5, [2.0], consts=[20.0], n_sources=2,
                           rtol=1e-3, maxiter=60)
    assert rec["converged"] == [True, True]
    assert all(it <= 10 for it in rec["iterations"])
    assert all(r < 5e-2 for r in rec["true_residuals"])


def test_multisolve_freq_amortized_matches_exact_setup():
    """Omega-amortized sweep (freq_anchor_every): intermediate frequencies
    get their G sample stack by lerping the bracketing anchors' stacks in
    omega — iteration counts must match the per-frequency-refactored sweep
    within +-1 and every solve must converge (VERDICT round 3, item 3)."""
    from helmholtz_tpu.driver import run_multisolve

    freqs = [4.0, 4.05, 4.1, 4.15, 4.2]
    kw = dict(consts=[61.0], n_sources=2, rtol=1e-3, maxiter=60,
              factor_stride=4, g_compress=True)
    base = run_multisolve(63, 12, freqs, **kw)
    amort = run_multisolve(63, 12, freqs, freq_anchor_every=4, **kw)
    modes = [r["setup_mode"] for r in amort]
    assert modes == ["factor", "omega_lerp", "omega_lerp", "omega_lerp",
                     "factor"]
    for rb, ra in zip(base, amort):
        assert ra["converged"] == [True, True]
        assert all(r < 1e-2 for r in ra["true_residuals"])
        for ib, ia in zip(rb["iterations"], ra["iterations"]):
            assert abs(ia - ib) <= 1, (rb["wave_num"], ib, ia)


def test_multisolve_freq_amortized_guards():
    """The amortized path refuses configurations it cannot honor."""
    import pytest

    from helmholtz_tpu.driver import run_multisolve

    with pytest.raises(ValueError, match="g_compress"):
        run_multisolve(63, 12, [4.0, 4.1], consts=[61.0],
                       freq_anchor_every=2, factor_stride=1)
    with pytest.raises(ValueError, match="single const"):
        run_multisolve(63, 12, [4.0, 4.1], consts=[61.0, 62.0],
                       freq_anchor_every=2, factor_stride=4,
                       g_compress=True)


def test_precond_checkpoint_loads_round3_compressed_format(tmp_path):
    """Compressed checkpoints saved by the round-3 layout (1-D g_w, no
    g_lo) must still load: the lerp tables are static given (M, stride),
    so the loader rebuilds them via compress_tables instead of raising
    KeyError (code-review round 4)."""
    import jax.numpy as jnp

    from helmholtz_tpu.driver import _assemble_stage, _factor_stage
    from helmholtz_tpu.precond.sweeping import compress_tables

    wf = jnp.result_type(float)
    (A, hm, _), _ = _assemble_stage(
        jnp.asarray(4.0, wf), jnp.asarray(61.0, wf), jnp.asarray(2.0, wf),
        n=63, b=12, problem="c1_f1", fidelity="corrected",
        cdtype=jnp.complex128)
    P = _factor_stage(A, hm, b=12, hf_full_coupling=True, d2_replace=True,
                      setup_chunk=128, factor_stride=4, g_compress=True)
    path = save_preconditioner(str(tmp_path / "P.npz"), P)
    # rewrite as the old layout: drop g_lo, flatten g_w to its old 1-D t
    z = dict(np.load(path))
    z["g_w"] = np.asarray(z["g_w"])[:, 1]          # old format stored t
    del z["g_lo"]
    np.savez_compressed(path, **z)
    P2 = load_preconditioner(path)
    g_w, g_lo = compress_tables(63 - 12, P.g_stride)
    np.testing.assert_array_equal(np.asarray(P2.g_w), np.asarray(g_w))
    np.testing.assert_array_equal(np.asarray(P2.g_lo), np.asarray(g_lo))
    np.testing.assert_array_equal(np.asarray(P2.G.re), np.asarray(P.G.re))


def test_cli_multisolve_amortized_checkpoint_resume(tmp_path):
    """Amortized-sweep resume re-runs the WHOLE sweep as a unit (anchor
    geometry must not be re-chosen over a leftover subset) and emits only
    the missing records (code-review round 4)."""
    ck = tmp_path / "sweep.jsonl"
    args = ["multisolve", "--n", "63", "--b", "12",
            "--freqs", "4.0", "4.1", "4.2", "--consts", "61.0",
            "--multi-rhs", "1", "--factor-stride", "4", "--g-compress",
            "--freq-anchor-every", "2", "--checkpoint", str(ck)]
    assert cli_main(args) == 0
    recs = [json.loads(l) for l in ck.read_text().splitlines()]
    assert sorted(r["wave_num"] for r in recs) == [4.0, 4.1, 4.2]
    # drop the middle record; resume must re-run the unit and re-emit
    # ONLY the missing frequency
    keep = [r for r in recs if r["wave_num"] != 4.1]
    ck.write_text("".join(json.dumps(r) + "\n" for r in keep))
    assert cli_main(args) == 0
    recs2 = [json.loads(l) for l in ck.read_text().splitlines()]
    assert len(recs2) == 3
    assert sorted(r["wave_num"] for r in recs2) == [4.0, 4.1, 4.2]
    again = [r for r in recs2 if r["wave_num"] == 4.1]
    assert again[0]["setup_mode"] == "omega_lerp"


def test_plan9_matches_measured_flagship():
    """The 9-point capacity planner reproduces the measured round-5
    flagship budget: n=2047 compressed bf16 fits one chip with ~4.0 GB of
    sample panels + ~2.5 GB bf16 TF (NINEPOINT.jsonl g_bytes_at_rest),
    and n=3071 does not fit."""
    from helmholtz_tpu.bench.plan import plan9

    p = plan9(2047)
    assert p["b"] == 147
    assert p["fits_single_chip"]
    assert abs(p["g_stack_gb"] - 4.0) < 0.3          # measured 4.0 GB
    assert p["hostloop_envelope"]
    assert not plan9(3071)["fits_single_chip"]
    assert not plan9(1023)["hostloop_envelope"]
