"""Minimized reproducer for the TPU-backend loop-nest miscompile that
hard-crashes the worker at n >= 1407 (precond/recompute.py docstring;
VERDICT round 3, Missing #4 / item 6).

The full failing program is GMRES (outer while_loop over restart cycles ->
inner while_loop over Arnoldi steps) around the recompute preconditioner
apply (fori_loop over chunks -> scan over rows -> factor scan over layers
-> blocked-Gauss-Jordan fori_loops).  The apply is measured-correct
STANDALONE at every size, and the whole program is correct through
n = 1279 — at n >= 1407 the same nest kills the worker with
"UNAVAILABLE: TPU worker process crashed ... kernel fault".

This script strips GMRES to its loop skeleton: TWO nested while_loops
whose inner body is one recompute apply and nothing else (no Arnoldi, no
Givens, no residual logic).  If `nest` crashes where `apply` passes, the
miscompile is localized to while(while(fori(scan(...)))) nesting itself.

Usage (run each variant in a FRESH process — a crash kills the worker):

    python docs/miscompile_repro.py <n> <variant>

    n        e.g. 1279 (passes) / 1407 (crashes as of 2026-08 backend)
    variant  apply    — one standalone apply (control; passes)
             nest     — while(while(apply)) loop skeleton
             twoapply — nest + a second apply instantiation in the OUTER
                        body (GMRES applies M in the inner Arnoldi step
                        AND in the outer recomputed-residual check)
             arnoldi  — inner loop carries the (m+1, N) Krylov buffer and
                        does the projection matmuls + basis row write
                        (GMRES minus Givens/LSQ/convergence logic)

    HELMHOLTZ_TPU_RECOMPUTE_CHUNK_LOOP={fori|scan|checkpoint} selects the
    chunk-loop structure inside the apply (precond/recompute.py) — the
    restructuring experiments for a compiled fix.

Outcome matrix (2026-08, axon TPU v5e, each cell a fresh process; the
repro prints RESULT <variant> n=<n> ok=<bool> on survival, a crash
surfaces as JaxRuntimeError UNAVAILABLE "TPU worker process crashed"):

    variant                              n=1407   n=2047
    apply (standalone, no while)         ok (round-3 envelope, all n)
    nest (while(while(apply)))           ok       CRASH
    nest + chunk-loop=scan               ok       —
    twoapply (2nd apply in outer body)   CRASH    —  <- minimized repro
    twoapply + chunk-loop=checkpoint     CRASH    —
    twoapply + GJ base case in Pallas    CRASH    —
    arnoldi (1 apply + (m+1,N) V-buffer
             projections + row writes)   CRASH    —
    arnoldi + GJ base case in Pallas     CRASH    —

ROUND-5 ADDITIONS (MISCOMPILE_ENVELOPE.jsonl holds the regenerated
records; docs/miscompile_envelope.py re-runs the matrix in one command):
  * the STANDALONE apply (no solver while-nest) also crashes from
    n >= ~2815 — round 3's "apply ok at every n" was only probed through
    2047, so the program-size envelope applies to the apply's own
    fori(scan(GJ)) nest at sufficient size (this closes the recompute
    niche window beyond compressed's ~2559 capacity limit:
    CAPACITY_RECOMPUTE.jsonl recompute_niche_frontier_round5);
  * the 9-POINT fused assemble+factor setup nest (fori(assemble + scan +
    GJ)) kernel-faults at n = 2047 / b = 147 — the host-chunked setup
    (driver._assemble_factor9_hostchunks: one small program per chunk,
    donated in-place G writes) is the working capacity setup, mirroring
    the hostloop workaround on the solve side.

CONCLUSION: the failure scales with TOTAL COMPILED PROGRAM SIZE inside
loop nests (solver while-nests first, large fori/scan bodies at larger
n), not with any specific construct.  At n = 1407 one
instantiation of the chunked apply inside while(while(.)) runs, and
adding EITHER a second instantiation (gmres's recomputed-residual check)
OR the Krylov-basis machinery tips it over; at n = 2047 even the single
instantiation inside the nest crashes — while the SAME single
instantiation dispatched without compiled solver loops (the hostloop
driver) runs correctly at 2047 (round-3 capacity artifact).
Restructurings that preserve program size (scan vs fori chunk loops,
checkpointed chunk bodies, a Pallas-kernel GJ base case) all crash the
same; full GMRES with the STORED Pallas-sweep apply — same solver loops,
same V machinery, tiny apply body — runs at n = 2047.  A compiled fix
therefore needs the backend codegen bug fixed (or the whole apply made
opaque to XLA); until then the host-driven GMRES (solve.hostloop), which
keeps exactly one apply instantiation and no compiled solver loops, is
the measured-correct capacity driver — and its batched variant
(gmres_hostloop_batched) amortizes the per-step refactor across RHS.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))          # repo root, when run from docs/

import jax
import jax.numpy as jnp


def main(n: int = 1407, variant: str = "nest") -> None:
    from helmholtz_tpu.core.complexlib import CArray
    from helmholtz_tpu.driver import (_assemble_stage,
                                      _factor_recompute_stage,
                                      default_complex_dtype)
    from helmholtz_tpu.precond.recompute import apply_recompute

    wf = jnp.result_type(float)
    cdtype = default_complex_dtype()
    b = 12
    wn = (n + 1) / 8.0                     # reference points-per-wavelength
    (A, _, f), c_full = _assemble_stage(
        jnp.asarray(wn, wf), jnp.asarray(100.0, wf), jnp.asarray(2.0, wf),
        n=n, b=b, problem="c1_f1", fidelity="corrected", cdtype=cdtype)
    R = _factor_recompute_stage(
        A, c_full, jnp.asarray(wn, wf), jnp.asarray(100.0, wf),
        jnp.asarray(2.0, wf), n=n, b=b, fidelity="corrected",
        hf_full_coupling=True, d2_replace=True, setup_chunk=128,
        factor_stride=8)
    f0 = CArray(f.re, f.im)

    if variant == "apply":
        @jax.jit
        def prog(Rp, fp):
            u = apply_recompute(Rp, jax.lax.complex(fp.re, fp.im))
            return CArray.of(u)
    elif variant == "nest":
        @jax.jit
        def prog(Rp, fp):
            u0 = jax.lax.complex(fp.re, fp.im)
            s = 1.0 / (1.0 + 1e-6)

            def inner(c):
                j, v = c
                return j + 1, apply_recompute(Rp, v) * s

            def outer(c):
                i, u = c
                _, u = jax.lax.while_loop(lambda c2: c2[0] < 2, inner,
                                          (0, u))
                return i + 1, u

            _, u = jax.lax.while_loop(lambda c: c[0] < 2, outer, (0, u0))
            return CArray.of(u)
    elif variant == "twoapply":
        @jax.jit
        def prog(Rp, fp):
            u0 = jax.lax.complex(fp.re, fp.im)
            s = 1.0 / (1.0 + 1e-6)

            def inner(c):
                j, v = c
                return j + 1, apply_recompute(Rp, v) * s

            def outer(c):
                i, u = c
                _, u = jax.lax.while_loop(lambda c2: c2[0] < 2, inner,
                                          (0, u))
                # second instantiation of the giant apply in the OUTER
                # body — mirrors gmres's recomputed-residual check
                u = apply_recompute(Rp, u) * s
                return i + 1, u

            _, u = jax.lax.while_loop(lambda c: c[0] < 2, outer, (0, u0))
            return CArray.of(u)
    elif variant == "arnoldi":
        m = 20

        @jax.jit
        def prog(Rp, fp):
            N = n * n
            u0 = jax.lax.complex(fp.re, fp.im).reshape(-1)
            hi = jax.lax.Precision.HIGHEST

            def inner(c):
                j, V = c
                vj = jax.lax.dynamic_index_in_dim(V, j, 0, keepdims=False)
                w = apply_recompute(Rp, vj.reshape(n, n)).reshape(-1)
                h = jnp.matmul(jnp.conj(V), w, precision=hi)
                w = w - jnp.matmul(h, V, precision=hi)
                wn_ = jnp.linalg.norm(w)
                V = V.at[j + 1].set(w / jnp.where(wn_ > 0, wn_, 1.0))
                return j + 1, V

            def outer(c):
                i, r = c
                V = jnp.zeros((m + 1, N), r.dtype).at[0].set(
                    r / jnp.linalg.norm(r))
                _, V = jax.lax.while_loop(lambda c2: c2[0] < 3, inner,
                                          (0, V))
                return i + 1, V[1] + V[2]

            _, u = jax.lax.while_loop(lambda c: c[0] < 2, outer, (0, u0))
            return CArray.of(u.reshape(n, n))
    else:
        raise SystemExit(f"unknown variant {variant!r}")

    out = prog(R, f0)
    import numpy as np
    val = np.asarray(jax.device_get(out.re.ravel()[:1]))
    print(f"RESULT {variant} n={n} ok={bool(np.isfinite(val).all())}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1407
    variant = sys.argv[2] if len(sys.argv) > 2 else "nest"
    main(n, variant)
