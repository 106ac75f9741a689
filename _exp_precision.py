"""A/B: matmul precision effect on iteration count + times (TPU)."""
import sys
import time

import jax

mode = sys.argv[1] if len(sys.argv) > 1 else "default"
configs = [(511, 64.0, 81.0), (1023, 128.0, 100.0)]

from helmholtz_tpu.driver import run_solver

ctx = (jax.default_matmul_precision(mode) if mode != "default"
       else __import__("contextlib").nullcontext())
with ctx:
    for n, wn, C in configs:
        r = run_solver(n, 12, wn, C, maxiter=60)   # compile pass
        r = run_solver(n, 12, wn, C, maxiter=60)
        print(f"mode={mode} n={n}: iters={r.iterations} conv={r.converged} "
              f"true_res={r.true_residual:.2e} init={r.init_time:.2f}s "
              f"solve={r.solve_time:.2f}s", flush=True)
