"""Component timing on TPU: apply, SpMV, block-Thomas, GMRES overhead."""
import sys
import time

import jax
import jax.numpy as jnp

import contextlib

mode = sys.argv[1] if len(sys.argv) > 1 else "default"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1023

from helmholtz_tpu.core.complexlib import complexify, pairify
from helmholtz_tpu.driver import (_assemble_stage, _factor_stage,
                                  default_complex_dtype, _host_sync)
from helmholtz_tpu.ops.spmv import stencil_matvec_flat
from helmholtz_tpu.precond.sweeping import (apply_preconditioner,
                                            _block_thomas_solve)

ctx = (jax.default_matmul_precision(mode) if mode != "default"
       else contextlib.nullcontext())

wf = jnp.result_type(float)
cdtype = default_complex_dtype()

with ctx:
    (A_pair, hm_pair, f_pair), _ = _assemble_stage(
        jnp.asarray(128.0, wf), jnp.asarray(100.0, wf), jnp.asarray(2.0, wf),
        n=n, b=12, problem="c1_f1", fidelity="as-shipped", cdtype=cdtype)
    P_pair = _factor_stage(A_pair, hm_pair, b=12, hf_full_coupling=True,
                           d2_replace=True, setup_chunk=128)

    @jax.jit
    def apply_once(P, f_pair):
        f = complexify(f_pair)
        return pairify(apply_preconditioner(P, f))

    @jax.jit
    def spmv_once(A_pair, f_pair):
        A, f = complexify((A_pair, f_pair))
        return pairify(stencil_matvec_flat(A, f.reshape(-1)))

    @jax.jit
    def thomas_once(P, f_pair):
        f = complexify(f_pair)
        TF = P.TF.cplx
        return pairify(_block_thomas_solve(TF, P.hf_cs.cplx, P.hf_cn.cplx,
                                           f[:P.b]))

    def bench(fn, *args, reps=10):
        r = fn(*args); _host_sync(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        _host_sync(r)
        return (time.perf_counter() - t0) / reps

    t_apply = bench(apply_once, P_pair, f_pair)
    t_spmv = bench(spmv_once, A_pair, f_pair)
    t_thomas = bench(thomas_once, P_pair, f_pair)
    M = n - 12
    g_bytes = 2 * 2 * M * n * n * 4  # 2 passes, re+im, f32
    print(f"mode={mode} n={n}: apply={t_apply*1e3:.1f}ms "
          f"(G-traffic {g_bytes/1e9:.1f}GB -> {g_bytes/t_apply/1e9:.0f}GB/s) "
          f"spmv={t_spmv*1e3:.2f}ms thomasF={t_thomas*1e3:.2f}ms", flush=True)
