"""Round benchmark: preconditioned GMRES solve wall-clock at the reference's
largest config (n=1023, c1-f1, C=100, tol 1e-3) on one TPU chip.

Baseline: the reference's published n=1023 GMRES solve time of 25.6 s
(C=100, CS714_Project.pdf p.2; BASELINE.md) on its CPU — the same config
that peaked at ~15 GB and OOM-killed its 16 GB machine.  `vs_baseline` is
the speedup factor (baseline seconds / our seconds; > 1 is faster).

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""
import json
import sys


def _run(n, wn, C):
    from helmholtz_tpu.driver import run_solver

    # first call compiles + populates caches; second call is the measurement
    run_solver(n, 12, wn, C, maxiter=60)
    return run_solver(n, 12, wn, C, maxiter=60)


def main():
    import jax

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    configs = [
        (1023, 128.0, 100.0, 25.6),   # published reference solve time
        (511, 64.0, 81.0, 13.7),      # fallback: session-measured reference
    ]
    for n, wn, C, ref_s in configs:
        try:
            r = _run(n, wn, C)
        except Exception as e:  # OOM / backend failure -> try smaller
            print(f"n={n} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        print(f"n={n}: iters={r.iterations} converged={r.converged} "
              f"true_res={r.true_residual:.2e} init={r.init_time:.2f}s "
              f"solve={r.solve_time:.2f}s", file=sys.stderr)
        vs = (ref_s / r.solve_time) if r.converged and r.solve_time > 0 else 0.0
        print(json.dumps({
            "metric": f"gmres_solve_wall_s_n{n}_c1f1_tol1e-3",
            "value": round(r.solve_time, 4),
            "unit": "s",
            "vs_baseline": round(vs, 2),
        }))
        return
    print(json.dumps({"metric": "gmres_solve_wall_s", "value": -1.0,
                      "unit": "s", "vs_baseline": 0.0}))


if __name__ == "__main__":
    main()
