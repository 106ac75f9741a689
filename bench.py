"""Round benchmark: the BASELINE.json north-star metric on one TPU chip.

Measures, at the reference's largest config (n=1023, c1-f1, C=100):
  * preconditioned GMRES solve wall-clock + iterations at rtol 1e-3
    (headline `value`; baseline = the reference's published 25.6 s solve,
    CS714_Project.pdf p.2 / BASELINE.md — the run that OOM'd a 16 GB box);
  * iterations + wall-clock at rtol 1e-6 via the mixed-precision
    ir-df32 path (plain f32 stalls at ~5e-6 true residual);
  * iteration parity vs the complex128 corrected-algorithm oracle
    (ORACLE.json, produced by helmholtz_tpu.bench.ref_oracle) — the
    north-star "match code.py GMRES iteration counts to tolerance";
  * complex SpMV nnz/s and HBM-roofline fraction (Pallas stencil kernel).

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""
import json
import os
import sys


def _oracle_iters():
    """{(n, rtol): iters} from the checked-in complex128 oracle artifact."""
    out = {}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ORACLE.json")
    try:
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                if rec.get("stencil") == "9pt":
                    out[("9pt", rec["n"], rec["rtol"])] = rec["iters"]
                else:
                    out[(rec["n"], rec["rtol"])] = rec["iters"]
    except OSError:
        pass
    return out


def _solve(n, wn, C, reps=3, **kw):
    """Median-of-reps measurement (tunnel jitter is large): returns the
    report whose solve_time is the median, plus the spread."""
    from helmholtz_tpu.driver import run_solver

    # first call compiles + populates caches; subsequent are measurements
    run_solver(n, 12, wn, C, **kw)
    rs = [run_solver(n, 12, wn, C, **kw) for _ in range(reps)]
    rs.sort(key=lambda r: r.solve_time)
    med = rs[len(rs) // 2]
    med.config["solve_spread_s"] = [rs[0].solve_time, rs[-1].solve_time]
    med.config["init_spread_s"] = [min(r.init_time for r in rs),
                                   max(r.init_time for r in rs)]
    return med


def _measure_bounded(name, fn, reps=3):
    """Run a roofline measurement a FIXED `reps` times and report the
    median `roofline_fraction` sample (kernels are roofed against peaks
    matching their read:write mix — bench.roofline measure_spmv).

    A fixed-count median replaces round 4's resample-until-in-(0,1] loop,
    which was a biased estimator near peak: a noisy sample at 1.01 was
    re-drawn while one at 0.99 was kept, systematically pulling reported
    fractions of near-roofline kernels below their true value (advisor
    round 4).  The median of all draws is unconditional; if it still
    exceeds 1 (tunnel jitter skewing the peak probe on most draws) the
    record is tagged `fraction_error` rather than reported as a roofline
    number, and the spread of the draws is recorded either way."""
    outs = []
    for _ in range(reps):
        try:
            outs.append(fn())
        except Exception as e:
            print(f"{name} roofline failed: {e}", file=sys.stderr)
            break
    outs = [o for o in outs if o.get("roofline_fraction", 0.0) > 0.0]
    if not outs:
        return {}
    outs.sort(key=lambda o: o["roofline_fraction"])
    out = outs[len(outs) // 2]
    out["fraction_spread"] = [round(outs[0]["roofline_fraction"], 3),
                              round(outs[-1]["roofline_fraction"], 3)]
    if out["roofline_fraction"] > 1.0:
        out["fraction_error"] = True
    return out


def _solve9(n, reps=2):
    """9-point headline (VERDICT round 4 task 7: track 9pt round-over-
    round): n at the measured recipe b ~ n/14, C ~ 60, bf16 compressed-
    capable strided setup; returns the median-solve report."""
    from helmholtz_tpu.driver import min_pml_width9, run_solver

    b9 = max(12, min_pml_width9(n))
    kw = dict(stencil="9pt", rtol=1e-3, maxiter=60, g_dtype="bf16")
    run_solver(n, b9, (n + 1) / 8.0, 60.0, **kw)       # compile + warm
    rs = [run_solver(n, b9, (n + 1) / 8.0, 60.0, **kw) for _ in range(reps)]
    rs.sort(key=lambda r: r.solve_time)
    return rs[len(rs) // 2]


def _ninepoint_block(n, oracle):
    try:
        r9 = _solve9(n)
    except Exception as e:
        print(f"9pt n={n} failed: {type(e).__name__}: {e}", file=sys.stderr)
        return {"ninepoint_error": f"{type(e).__name__}: {e}"[:200]}
    o9 = oracle.get(("9pt", n, 1e-3))
    out = {
        "n": n, "b": r9.config["b"],
        "solve_wall_s": round(r9.solve_time, 4),
        "init_wall_s": round(r9.init_time, 2),
        "iters": int(r9.iterations),
        "oracle_iters": o9,
        "parity": (None if o9 is None
                   else bool(r9.iterations <= o9 + 1)),
        "converged": bool(r9.converged),
        "true_residual": float(r9.true_residual),
        "g_dtype": "bf16",
        "scheme": "mehrstellen (4th-order interior, bench.accuracy)",
    }
    # the scipy 9pt oracle tops out at n=511 (the per-subgrid SuperLU
    # factor list exceeds host RAM beyond that — the reference-lineage
    # memory wall itself); pin parity there when the headline n has no
    # oracle row
    if o9 is None and oracle.get(("9pt", 511, 1e-3)) is not None:
        try:
            r511 = _solve9(511, reps=1)
            o511 = oracle.get(("9pt", 511, 1e-3))
            out["parity_n511"] = bool(r511.iterations <= o511 + 1)
            out["iters_n511"] = int(r511.iterations)
            out["oracle_iters_n511"] = o511
        except Exception as e:
            print(f"9pt n=511 parity failed: {e}", file=sys.stderr)
    return {"ninepoint": out}


def main():
    import jax

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    oracle = _oracle_iters()
    configs = [
        # (n, omega/2pi, C, reference solve s, reference setup s)
        # solve: published (PDF p.2); setup: session-measured 58.6 s at
        # n=511 scaled O(N) to n=1023 (SURVEY.md section 6.2) — the
        # reference OOM'd before publishing a 1023 setup time
        (1023, 128.0, 100.0, 25.6, 235.0),
        (511, 64.0, 81.0, 13.7, 58.6),   # fallback: session-measured
    ]
    for n, wn, C, ref_s, ref_setup_s in configs:
        try:
            # g_dtype=bf16: half the G memory + HBM traffic per apply with
            # the hi/lo-split carry; iteration counts match f32/oracle
            # (measured n=1023: 5 iters both, 0.138 s vs 0.225 s)
            r3 = _solve(n, wn, C, rtol=1e-3, maxiter=60, g_dtype="bf16")
            r6 = _solve(n, wn, C, rtol=1e-6, maxiter=60, g_dtype="bf16",
                        precision="ir-df32", precond_refine=1)
        except Exception as e:  # OOM / backend failure -> try smaller
            print(f"n={n} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        for tag, r in (("1e-3", r3), ("1e-6", r6)):
            print(f"n={n} rtol={tag}: iters={r.iterations} "
                  f"converged={r.converged} true_res={r.true_residual:.2e} "
                  f"precond_res={r.residual_norm:.2e} "
                  f"init={r.init_time:.2f}s solve={r.solve_time:.2f}s",
                  file=sys.stderr)
        spmv = _measure_bounded("spmv", lambda: __import__(
            "helmholtz_tpu.bench.roofline", fromlist=["measure_spmv"]
        ).measure_spmv(n=n, use_pallas=True))
        sweep = _measure_bounded("sweep", lambda: __import__(
            "helmholtz_tpu.bench.roofline", fromlist=["measure_sweep"]
        ).measure_sweep(n=n, g_dtype="bf16"))
        setup = _measure_bounded("setup", lambda: __import__(
            "helmholtz_tpu.bench.roofline", fromlist=["measure_setup"]
        ).measure_setup(n=n, g_dtype="bf16"), reps=1)
        nine = _ninepoint_block(n, oracle)
        vs = (ref_s / r3.solve_time) if r3.converged and r3.solve_time > 0 \
            else 0.0
        o3, o6 = oracle.get((n, 1e-3)), oracle.get((n, 1e-6))
        print(json.dumps({
            "metric": f"gmres_solve_wall_s_n{n}_c1f1_tol1e-3",
            "value": round(r3.solve_time, 4),
            "unit": "s",
            "vs_baseline": round(vs, 2),
            "iters_rtol1e3": int(r3.iterations),
            "oracle_iters_rtol1e3": o3,
            "parity_rtol1e3": (None if o3 is None
                               else bool(r3.iterations <= o3 + 1)),
            "converged_rtol1e3": bool(r3.converged),
            "true_residual_rtol1e3": float(r3.true_residual),
            "solve_wall_s_rtol1e6": round(r6.solve_time, 4),
            "iters_rtol1e6": int(r6.iterations),
            "oracle_iters_rtol1e6": o6,
            "parity_rtol1e6": (None if o6 is None
                               else bool(r6.iterations <= o6 + 1)),
            "converged_rtol1e6": bool(r6.converged),
            "precond_residual_rtol1e6": float(r6.residual_norm),
            "precision_rtol1e6": "ir-df32+refine1",
            "g_dtype": "bf16",
            "spmv_gnnz_per_s": round(spmv.get("gnnz_per_s", 0.0), 2),
            "spmv_roofline_fraction": round(
                spmv.get("roofline_fraction", 0.0), 3),
            "spmv_gb_s_coeff_model": round(
                spmv.get("effective_gb_per_s_coeff_traffic", 0.0), 1),
            "spmv_gb_s_full_model": round(
                spmv.get("effective_gb_per_s_full_traffic", 0.0), 1),
            "measured_stream_bw_gb_s": round(
                spmv.get("measured_stream_bw_gb_s", 0.0), 1),
            "measured_read_bw_gb_s": round(
                spmv.get("measured_read_bw_gb_s", 0.0), 1),
            "spmv_peak_gb_s_coeff_model": round(
                spmv.get("peak_gb_s_coeff_model", 0.0), 1),
            "spmv_peak_gb_s_full_model": round(
                spmv.get("peak_gb_s_full_model", 0.0), 1),
            "spmv_fraction_error": bool(spmv.get("fraction_error", False)),
            "sweep_roofline_fraction": round(
                sweep.get("roofline_fraction", 0.0), 3),
            "sweep_fraction_error": bool(sweep.get("fraction_error", False)),
            "roofline_denominator": "per-kernel read:write-matched peaks "
                                    "(bench.roofline measure_spmv)",
            "sweep_s_per_apply": round(sweep.get("s_per_apply", 0.0), 4),
            "init_wall_s": round(r3.init_time, 2),
            "end_to_end_wall_s": round(r3.init_time + r3.solve_time, 2),
            "vs_baseline_end_to_end": round(
                (ref_s + ref_setup_s) / max(r3.init_time + r3.solve_time,
                                            1e-9), 1),
            "init_spread_s": [round(t, 2) for t in
                              r3.config.get("init_spread_s", [])],
            "solve_spread_s": [round(t, 4) for t in
                               r3.config.get("solve_spread_s", [])],
            "factor_stride": r3.config.get("factor_stride"),
            "setup_roofline_fraction": round(
                setup.get("roofline_fraction", 0.0), 3),
            "setup_phases_s": {k: setup.get(k) for k in
                               ("assembly_s", "factor_samples_s",
                                "expand_s", "hf_s", "total_warm_s")},
            "setup_factor_effective_tflops": setup.get(
                "factor_effective_tflops"),
            "setup_measured_matmul_tflops": setup.get(
                "measured_matmul_tflops"),
            "setup_expand_fraction": setup.get("expand_fraction"),
            **nine,
        }))
        return
    print(json.dumps({"metric": "gmres_solve_wall_s", "value": -1.0,
                      "unit": "s", "vs_baseline": 0.0}))


if __name__ == "__main__":
    main()
