"""Discretization-accuracy study: 5-point vs 9-point (VERDICT round 4,
next-round task 2 — "measure the 9-point scheme's accuracy, its reason to
exist").

Method: manufactured solution with EXACT forcing.  u*(x) = plane wave
exp(i k d.x) windowed by a Gaussian bump centered in the unit square and
negligible (< 1e-12 relative) within several sigma of every boundary, so
the PML/Dirichlet layers see ~zero field and the measured error is the
INTERIOR scheme's discretization error alone (the PML taper of the
9-point blend, fd.stencil.build_a_stencil9, only acts where sigma > 0 —
i.e. where u* ~ 0 — so this isolates the advertised dispersion behavior;
the taper's own cost is bounded separately by the solver iteration counts
the NINEPOINT artifacts track).  The forcing f = Delta u* + (omega/c)^2 u*
is computed by forward-mode autodiff of the closed-form u* (exact to
working precision — no hand-derived derivative expressions to get wrong),
sampled on the grid, and the discrete system A_h u_h = f_h is solved to an
algebraic tolerance far below the discretization error.  Error metric:
relative L2 of u_h - u* over the interior box [1/4, 3/4]^2.

Two sweeps, emitted as JSONL rows (checked in at ACCURACY.jsonl):
  * refine: n doubles at fixed omega (points-per-wavelength doubles) —
    measures the convergence order of each scheme;
  * ppw: omega sweeps at fixed n — measures error vs points-per-
    wavelength, the dispersion story (the compact 9-point blend's value
    is lower phase error at FIXED ppw).

Velocity is constant c = 1 (the manufactured route needs the exact
continuous operator; the heterogeneous problems are covered by the solver
oracles).  Reference anchor: the 5-point accuracy claims the reference
inherits from Engquist-Ying (code.py:85-111, PDF p.1-2).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def manufactured_fields(omega, direction=(0.8, 0.6), center=(0.5, 0.5),
                        sigma=0.08):
    """(u_fn, f_fn): closed-form windowed plane wave and its EXACT
    Helmholtz forcing f = u_xx + u_yy + omega^2 u (c = 1), both mapping
    float grids (x1, x2) -> complex, derivatives by nested jacfwd."""
    import jax
    import jax.numpy as jnp

    om = complex(omega)
    d1, d2 = direction
    nrm = (d1 * d1 + d2 * d2) ** 0.5
    d1, d2 = d1 / nrm, d2 / nrm
    c1, c2 = center

    def u_scalar(x1, x2):
        phase = om * (d1 * x1 + d2 * x2)
        bump = jnp.exp(-(((x1 - c1) ** 2 + (x2 - c2) ** 2)
                         / (2.0 * sigma * sigma)))
        return bump * jnp.exp(1j * phase)

    d2_x1 = jax.jacfwd(jax.jacfwd(u_scalar, argnums=0), argnums=0)
    d2_x2 = jax.jacfwd(jax.jacfwd(u_scalar, argnums=1), argnums=1)

    def f_scalar(x1, x2):
        return d2_x1(x1, x2) + d2_x2(x1, x2) + om * om * u_scalar(x1, x2)

    u_fn = jax.jit(jax.vmap(jax.vmap(u_scalar)))
    f_fn = jax.jit(jax.vmap(jax.vmap(f_scalar)))
    return u_fn, f_fn


def measure_error(n, wave_num, stencil="5pt", *, b=None, const=60.0,
                  alpha=2.0, gamma=2.0 / 3.0, rtol=1e-8, maxiter=200,
                  restart=30, complex_dtype=None, sigma=0.08):
    """One (n, omega, stencil) accuracy point.  Returns the record dict.

    The solve runs the framework's own pipeline (assembly, sweeping
    preconditioner, GMRES — ir-df32 when the working complex is c64) so
    the artifact also certifies the production path end-to-end at an
    algebraic tolerance ~100x below the smallest discretization error
    measured."""
    import jax
    import jax.numpy as jnp

    from ..driver import (_solve9_stage, _solve_stage, default_complex_dtype,
                          min_pml_width9)
    from ..core.complexlib import pairify
    from ..fd import stencil as fd_stencil
    from ..precond.sweeping import setup_preconditioner
    from ..precond.sweeping9 import setup_preconditioner9

    cdtype = complex_dtype or default_complex_dtype()
    wf = jnp.finfo(jnp.result_type(cdtype, jnp.float32)).dtype
    if b is None:
        b = max(12, min_pml_width9(n)) if stencil == "9pt" else 12
    omega = 2.0 * np.pi * wave_num + 1j * alpha
    h = 1.0 / (n + 1)
    eta = b * h
    xs = jnp.arange(1, n + 1, dtype=wf) * jnp.asarray(h, wf)
    X1, X2 = jnp.meshgrid(xs, xs, indexing="xy")     # [row=j->x2, col=i->x1]
    u_fn, f_fn = manufactured_fields(omega, sigma=sigma)
    u_dev = u_fn(X1, X2)
    # complex buffers cannot be device_get through this backend — fetch
    # the split planes (core.complexlib convention)
    u_star = (np.asarray(jax.device_get(jnp.real(u_dev)))
              + 1j * np.asarray(jax.device_get(jnp.imag(u_dev)))
              ).astype(np.complex128)
    f_grid = f_fn(X1, X2)
    c_full = jnp.ones((n + 2, n + 2), wf)

    # everything complex runs under jit (eager complex dispatch is not
    # reliably implemented through the remote TPU backend) and crosses
    # the boundary as split-real pairs
    wn_t = jnp.asarray(wave_num, wf)
    al_t = jnp.asarray(alpha, wf)
    f_pair0 = jax.jit(pairify)(f_grid)

    @jax.jit
    def _setup(wn, al, fp):
        om = (2.0 * jnp.pi * wn + 1j * al).astype(cdtype)
        f = jax.lax.complex(fp.re, fp.im).astype(cdtype)
        if stencil == "9pt":
            A = fd_stencil.build_a_stencil9(
                n, b, const, eta, om, h, c_full, gamma=gamma,
                fidelity="corrected", complex_dtype=cdtype)
            hm = fd_stencil.build_hm_stencils9(
                n, b, const, eta, om, h, c_full, gamma=gamma,
                fidelity="corrected", complex_dtype=cdtype)
            P = setup_preconditioner9(A, hm, b)
            # the compact scheme's system is A9 u = M f
            f = fd_stencil.mass_filter9(n, b, const, eta, om, h, f)
        else:
            A = fd_stencil.build_a_stencil(
                n, b, const, eta, om, h, c_full,
                fidelity="corrected", complex_dtype=cdtype)
            hm = fd_stencil.build_hm_stencils(
                n, b, const, eta, om, h, c_full,
                fidelity="corrected", complex_dtype=cdtype)
            P = setup_preconditioner(A, hm, b)
        return pairify((A, P, f))

    solve = _solve9_stage if stencil == "9pt" else _solve_stage
    t0 = time.time()
    A_pair, P_pair, f_pair = _setup(wn_t, al_t, f_pair0)
    init_s = time.time() - t0

    precision = "ir-df32" if jnp.dtype(cdtype) == jnp.complex64 else "f32"
    t0 = time.time()
    res = solve(A_pair, P_pair, f_pair, jnp.asarray(rtol, wf),
                restart=restart, maxiter=maxiter, use_precond=True,
                precision=precision)
    u_h = res.x.to_np().reshape(n, n).astype(np.complex128)
    solve_s = time.time() - t0

    # interior-box error, far from the PML and the bump tails
    i0, i1 = int(0.25 * (n + 1)), int(0.75 * (n + 1))
    box = np.s_[i0:i1, i0:i1]
    err = (np.linalg.norm((u_h - u_star)[box])
           / np.linalg.norm(u_star[box]))
    ppw = (n + 1) / wave_num
    return {
        "study": None, "stencil": stencil, "n": n, "b": b,
        "wave_num": float(wave_num), "ppw": round(float(ppw), 2),
        "const": const, "gamma": (gamma if stencil == "9pt" else None),
        "err_rel_interior": float(err),
        "iterations": int(res.iterations),
        "converged": bool(res.converged),
        "algebraic_rtol": rtol, "precision": precision,
        "init_s": round(init_s, 2), "solve_s": round(solve_s, 2),
        "dtype": str(np.dtype(cdtype)), "sigma": sigma,
    }


def run_study(ns=(63, 127, 255), wave_num_refine=8.0, n_ppw=255,
              wave_nums_ppw=(8.0, 16.0, 24.0, 32.0), out=None, **kw):
    """The full two-sweep study; one JSONL row per point."""
    rows = []

    def emit(rec):
        rows.append(rec)
        line = json.dumps(rec)
        print(line, flush=True)
        if out:
            with open(out, "a") as fh:
                fh.write(line + "\n")

    for n in ns:
        for stencil in ("5pt", "9pt"):
            rec = measure_error(n, wave_num_refine, stencil, **kw)
            rec["study"] = "refine"
            emit(rec)
    for wn in wave_nums_ppw:
        for stencil in ("5pt", "9pt"):
            rec = measure_error(n_ppw, wn, stencil, **kw)
            rec["study"] = "ppw"
            emit(rec)
    return rows


def convergence_orders(rows):
    """{(stencil): [orders]} from consecutive refine-study pairs."""
    out = {}
    for stencil in ("5pt", "9pt"):
        pts = sorted([r for r in rows
                      if r["study"] == "refine" and r["stencil"] == stencil],
                     key=lambda r: r["n"])
        orders = []
        for a, c in zip(pts, pts[1:]):
            ha, hc = 1.0 / (a["n"] + 1), 1.0 / (c["n"] + 1)
            orders.append(np.log(a["err_rel_interior"]
                                 / c["err_rel_interior"])
                          / np.log(ha / hc))
        out[stencil] = [round(float(o), 2) for o in orders]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+", default=[63, 127, 255])
    ap.add_argument("--n-ppw", type=int, default=255)
    ap.add_argument("--wave-num-refine", type=float, default=8.0)
    ap.add_argument("--wave-nums-ppw", type=float, nargs="+",
                    default=[8.0, 16.0, 24.0, 32.0])
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    rows = run_study(tuple(args.ns), args.wave_num_refine, args.n_ppw,
                     tuple(args.wave_nums_ppw), out=args.out)
    print(json.dumps({"convergence_orders": convergence_orders(rows)}),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
