"""Scaling-efficiency harness: solve time and apply throughput at 1..K
devices (BASELINE north star: "nnz/s and solve-time scaling efficiency
reported at 1 chip, 1 host, and N>=2 hosts"; VERDICT round 1 item 4).

Two kinds of runs:

  * **virtual mesh** (CPU, `--xla_force_host_platform_device_count=K`):
    validates the harness and the distributed code path at 1/2/4/8 devices.
    Absolute times on the CPU backend are NOT hardware numbers — the
    artifact labels them `backend: cpu-virtual` — but the efficiency
    *trends* exercise exactly the collective/pipeline structure that runs
    on a real slice.
  * **real chip anchor** (TPU): a 1-device-mesh run whose apply/solve time
    must match the plain single-chip path (the "distributed path costs
    nothing when not distributed" check), plus the single-chip roofline
    numbers for context.

Recipe for a real pod slice (documented, not runnable in this 1-chip
environment): start one process per host with `jax.distributed.initialize`
(dist.multihost.initialize_multihost), build the mesh over
`jax.devices()`, and run this module's `scaling_report` unchanged — every
measurement below goes through `distributed_solve`/`shard_map`, which
compile identically for ICI+DCN meshes.

Efficiency definitions (reported per device count D, anchored at D=1):
  strong:  eff = T_1 / (D * T_D)          (fixed problem, split D ways)
  weak:    eff = (T_1 * W_D) / (T_D * W_1) per-device work W kept ~const
           (W modeled as per-device G-stack bytes + stencil bytes — the
           apply and SpMV are both HBM-bound, SURVEY.md section 6).
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _sync(tree):
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            x = leaf.ravel()[:1]
            if jnp.iscomplexobj(x):
                # complex buffers cannot cross the device->host boundary on
                # this backend (core.complexlib) — fetch one real plane
                x = jnp.real(x)
            np.asarray(jax.device_get(x))
            return



def _two_point(run_k, iters, reps):
    """Per-iteration seconds via two-point measurement: time k and 5k
    inner iterations and divide the difference — the fixed per-call cost
    (remote dispatch + host-fetch round trip, ~30-70 ms through the
    tunnel) cancels, exactly like bench.roofline._timed_loop.  run_k(k)
    must execute k iterations on device; this helper syncs."""
    run_k(jnp.asarray(iters))                 # compile + warm
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_k(jnp.asarray(iters))
        t1 = time.perf_counter()
        run_k(jnp.asarray(5 * iters))
        t2 = time.perf_counter()
        diffs.append(max((t2 - t1) - (t1 - t0), 1e-9) / (4 * iters))
    return float(np.median(diffs))

def _build(n, b, wave_num, const, g_dtype="working"):
    """Assemble + factor through the driver's jitted pair-typed stages —
    NOT the eager path: on the TPU backend every executable input/output
    must be split-real (complex buffers poison the whole downstream chain
    with async UNIMPLEMENTED errors that only surface at the next fetch —
    found the hard way)."""
    from ..dist import dist_state_from_preconditioner
    from ..driver import _assemble_stage, _factor_stage, default_complex_dtype

    cdtype = default_complex_dtype()          # complex64 on TPU
    wf = jnp.result_type(float)
    (A_pair, hm_pair, f_pair), _ = _assemble_stage(
        jnp.asarray(wave_num, wf), jnp.asarray(const, wf),
        jnp.asarray(2.0, wf), n=n, b=b, problem="c1_f1",
        fidelity="corrected", cdtype=cdtype)
    P_pair = _factor_stage(A_pair, hm_pair, b=b, hf_full_coupling=True,
                           d2_replace=True, setup_chunk=128,
                           g_dtype=g_dtype)
    state = dist_state_from_preconditioner(P_pair)
    from ..core.complexlib import CArray
    f_grid_pair = CArray(f_pair.re.reshape(n, n), f_pair.im.reshape(n, n))
    return A_pair, f_grid_pair, P_pair, state


def measure_dist_solve(n, b, ndev, *, wave_num=2.0, const=20.0,
                       rtol=1e-3, maxiter=200, reps=3) -> dict:
    """Distributed preconditioned GMRES wall time on an ndev-device mesh."""
    from ..dist import distributed_solve, make_mesh

    A_pair, f_pair, P_pair, state = _build(n, b, wave_num, const)
    mesh = make_mesh(ndev)

    def run():
        res = distributed_solve(mesh, A_pair, state, f_pair,
                                rtol=rtol, maxiter=maxiter)
        _sync(res.x)
        return res

    res = run()                       # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run()
        times.append(time.perf_counter() - t0)
    L = n
    n_pad = state.G_pad.re.shape[-1]
    itemsize = np.dtype(state.G_pad.re.dtype).itemsize
    work_per_dev_gb = (2 * (L / ndev) * n_pad * n_pad * itemsize) / 1e9
    return {
        "n": n, "b": b, "n_devices": ndev,
        "iters": int(res.iterations), "converged": bool(res.converged),
        "solve_s": float(np.median(times)),
        "per_device_g_gb": work_per_dev_gb,
    }


def measure_dist_apply(n, b, ndev, *, wave_num=2.0, const=20.0,
                       inner_iters=10, reps=3, g_dtype="working") -> dict:
    """One distributed preconditioner apply (the sweep) on an ndev mesh,
    timed inside a jitted loop — comparable against the single-device
    apply (`bench.roofline.measure_sweep`)."""
    from jax.sharding import PartitionSpec as P

    from ..dist import make_mesh
    from ..dist.partition import LAYER_AXIS, DistSweepState, shard_problem
    from ..dist.sweep import dist_apply_preconditioner

    A_pair, f_pair, P_pair, state = _build(n, b, wave_num, const,
                                           g_dtype=g_dtype)
    del P_pair                    # only the row-aligned dist state is used
    mesh = make_mesh(ndev)
    A_sh, state_sh, f_sh = shard_problem(mesh, A_pair, state, f_pair)
    L = n
    n_loc = L // ndev

    row, repl = P(LAYER_AXIS), P()
    in_specs = (
        DistSweepState(
            G_pad=jax.tree.map(lambda _: row, state_sh.G_pad),
            TF=jax.tree.map(lambda _: repl, state_sh.TF),
            hf_cs=jax.tree.map(lambda _: repl, state_sh.hf_cs),
            hf_cn=jax.tree.map(lambda _: repl, state_sh.hf_cn),
            a_cs=jax.tree.map(lambda _: row, state_sh.a_cs),
            a_cn=jax.tree.map(lambda _: row, state_sh.a_cn),
            b=state_sh.b, d2_replace=state_sh.d2_replace),
        row)

    def local(S_loc, f_pair, k):
        # pairs at rest (shard_problem), complex in flight
        from ..core.complexlib import CArray, complexify

        def body(_, u):
            v = dist_apply_preconditioner(
                S_loc, u, axis_name=LAYER_AXIS, n_devices=ndev,
                n_rows_global=L)
            return v * (1.0 / (1.0 + 1e-6))
        out = jax.lax.fori_loop(0, k[0], body, complexify(f_pair))
        return CArray(jnp.real(out), jnp.imag(out))

    fn = jax.jit(jax.shard_map(local, mesh=mesh,
                               in_specs=(*in_specs, repl),
                               out_specs=row, check_vma=False))

    def run_k(k):
        out = fn(state_sh, f_sh, jnp.asarray([k]).astype(jnp.int32))
        _sync(out)

    return {
        "n": n, "b": b, "n_devices": ndev,
        "s_per_apply": _two_point(run_k, inner_iters, reps),
    }


def measure_weak_apply(ndev, *, n=64, rows_per_dev=8, reps=3,
                       inner_iters=10, batch=1) -> dict:
    """Constant-per-device-work weak scaling of the staged sweep: a
    synthetic row-sharded G stack of L = rows_per_dev * ndev blocks of
    fixed (n, n) size, so every device does IDENTICAL work at every device
    count and eff_weak = T_1 / T_D is directly meaningful.  (The square
    Helmholtz grid ties rows to columns, so real-problem weak series
    conflate work growth — this is the controlled measurement.)

    `batch` > 1 measures the BATCHED-RHS series (BASELINE config 5 /
    SURVEY.md section 2.3): a single-RHS staged sweep leaves D-1 of D
    devices idle at any moment (expected weak efficiency ~1/D); B
    right-hand sides ride the same G stream, filling the idle stages, so
    the batched series is the design's actual weak-scaling claim."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.complexlib import CArray
    from ..dist import make_mesh
    from ..dist.partition import LAYER_AXIS, DistSweepState
    from ..dist.sweep import dist_apply_preconditioner

    L = rows_per_dev * ndev
    b = 1
    rng = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)
                                 * 0.1)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (1, n, n))
    state = DistSweepState(
        G_pad=CArray(rnd(L, n, n), rnd(L, n, n)),
        TF=CArray(eye, jnp.zeros_like(eye)),
        hf_cs=CArray(jnp.zeros((1, n), jnp.float32),
                     jnp.zeros((1, n), jnp.float32)),
        hf_cn=CArray(jnp.zeros((1, n), jnp.float32),
                     jnp.zeros((1, n), jnp.float32)),
        a_cs=CArray(rnd(L, n), rnd(L, n)),
        a_cn=CArray(rnd(L, n), rnd(L, n)),
        b=b, d2_replace=True)
    f = (CArray(rnd(L, n), rnd(L, n)) if batch == 1
         else CArray(rnd(batch, L, n), rnd(batch, L, n)))  # pairs at rest

    mesh = make_mesh(ndev)
    row, repl = P(LAYER_AXIS), P()
    f_spec = row if batch == 1 else P(None, LAYER_AXIS)
    shard_rows = lambda x: jax.device_put(x, NamedSharding(mesh, P(
        LAYER_AXIS, *([None] * (x.ndim - 1)))))
    shard_f = lambda x: jax.device_put(x, NamedSharding(mesh, f_spec))
    replicate = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
    state_sh = DistSweepState(
        G_pad=jax.tree.map(shard_rows, state.G_pad),
        TF=jax.tree.map(replicate, state.TF),
        hf_cs=jax.tree.map(replicate, state.hf_cs),
        hf_cn=jax.tree.map(replicate, state.hf_cn),
        a_cs=jax.tree.map(shard_rows, state.a_cs),
        a_cn=jax.tree.map(shard_rows, state.a_cn),
        b=b, d2_replace=True)
    in_specs = (DistSweepState(
        G_pad=jax.tree.map(lambda _: row, state.G_pad),
        TF=jax.tree.map(lambda _: repl, state.TF),
        hf_cs=jax.tree.map(lambda _: repl, state.hf_cs),
        hf_cn=jax.tree.map(lambda _: repl, state.hf_cn),
        a_cs=jax.tree.map(lambda _: row, state.a_cs),
        a_cn=jax.tree.map(lambda _: row, state.a_cn),
        b=b, d2_replace=True), row)

    def local(S_loc, f_pair, k):
        def body(_, u):
            v = dist_apply_preconditioner(
                S_loc, u, axis_name=LAYER_AXIS, n_devices=ndev,
                n_rows_global=L)
            return v * (1.0 / (1.0 + 1e-6))
        out = jax.lax.fori_loop(0, k[0], body, f_pair.cplx)
        return CArray(jnp.real(out), jnp.imag(out))

    fn = jax.jit(jax.shard_map(local, mesh=mesh,
                               in_specs=(in_specs[0], f_spec, repl),
                               out_specs=f_spec, check_vma=False))
    f_sh = jax.tree.map(shard_f, f)

    def run_k(k):
        out = fn(state_sh, f_sh, jnp.asarray([k]).astype(jnp.int32))
        _sync(out)

    return {"n": n, "rows_per_device": rows_per_dev, "n_devices": ndev,
            "batch": batch,
            "s_per_apply": _two_point(run_k, inner_iters, reps)}


def measure_halo_fraction(n, ndev, *, inner_iters=50, reps=3) -> dict:
    """Collective cost of the distributed SpMV: time the halo-exchange
    matvec vs the identical local-only stencil apply on the same shards;
    the difference is the (un-overlapped remainder of the) ppermute cost."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.complexlib import CArray, complexify
    from ..dist import make_mesh
    from ..dist.partition import LAYER_AXIS
    from ..dist.spmv import halo_stencil_matvec
    from ..ops.spmv import stencil_matvec

    A_pair, f_pair, _, _ = _build(n, 3, 2.0, 20.0)
    mesh = make_mesh(ndev)
    shard = lambda x: jax.device_put(x, NamedSharding(mesh, P(
        LAYER_AXIS, *([None] * (x.ndim - 1)))))
    A_sh = jax.tree.map(shard, A_pair)
    f_sh = jax.tree.map(shard, f_pair)
    specs = (jax.tree.map(lambda _: P(LAYER_AXIS), A_sh), P(LAYER_AXIS))

    def timed(local_fn):
        def local(A_loc_pair, u_pair):
            A_loc = complexify(A_loc_pair)

            def body(_, u):
                return local_fn(A_loc, u) * (1.0 / (1.0 + 1e-6))
            out = jax.lax.fori_loop(0, inner_iters, body,
                                    complexify(u_pair))
            return CArray(jnp.real(out), jnp.imag(out))
        fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=specs,
                                   out_specs=P(LAYER_AXIS),
                                   check_vma=False))
        out = fn(A_sh, f_sh)
        _sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(A_sh, f_sh)
            _sync(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / inner_iters

    t_halo = timed(lambda A_loc, u: halo_stencil_matvec(
        A_loc, u, LAYER_AXIS, ndev))
    t_local = timed(lambda A_loc, u: stencil_matvec(A_loc, u))
    return {"n": n, "n_devices": ndev, "s_halo_spmv": t_halo,
            "s_local_spmv": t_local,
            "collective_fraction": max(0.0, 1.0 - t_local
                                       / max(t_halo, 1e-12))}


def scaling_report(*, strong_n=64, weak_rows_per_dev=16, b=3,
                   ndevs=(1, 2, 4, 8), rtol=1e-3) -> dict:
    """Full scaling record: strong solve series at fixed n, a
    constant-work weak-apply series, the real-problem weak solve series
    (raw data), and per-count apply microbenchmarks."""
    ndevs = [d for d in ndevs if d <= len(jax.devices())]
    backend = jax.default_backend()
    label = ("cpu-virtual" if backend == "cpu" else backend)

    strong = [measure_dist_solve(strong_n, b, d, rtol=rtol) for d in ndevs]
    # anchor on the smallest measured device count (which need not be 1)
    d0, t0 = strong[0]["n_devices"], strong[0]["solve_s"]
    for rec in strong:
        rec["strong_efficiency"] = (t0 * d0) / (rec["n_devices"]
                                                * rec["solve_s"])

    # the design's central scaling claim, MEASURED (VERDICT round 2 item 4):
    # single-RHS staged sweep decays ~1/D; a B=8 batch rides the same G
    # stream and fills the idle stages, restoring weak efficiency
    weak_apply_by_batch = {}
    for B in (1, 8):
        series = [measure_weak_apply(d, batch=B) for d in ndevs]
        ta1 = series[0]["s_per_apply"]
        for rec in series:
            # per-RHS efficiency: T_1(B)/T_D(B) at constant per-device rows
            rec["weak_efficiency"] = ta1 / rec["s_per_apply"]
        weak_apply_by_batch[B] = series
    weak_apply = weak_apply_by_batch[1]

    # real-problem weak series: rows-per-device constant, but the square
    # grid grows columns too AND iteration counts drift with n — reported
    # per-iteration so the series measures scaling, not solver convergence
    weak_solve = []
    for d in ndevs:
        n_w = weak_rows_per_dev * d
        rec = measure_dist_solve(n_w, b, d, rtol=rtol)
        rec["solve_s_per_iter"] = rec["solve_s"] / max(rec["iters"], 1)
        weak_solve.append(rec)

    apply_series = [measure_dist_apply(strong_n, b, d) for d in ndevs]
    halo_series = [measure_halo_fraction(strong_n, d) for d in ndevs]

    return {
        "backend": label,
        "devices": ndevs,
        "strong": strong,
        "weak_apply_constant_work": weak_apply,
        "weak_apply_batched_rhs_b8": weak_apply_by_batch[8],
        "weak_solve_square_grids": weak_solve,
        "apply": apply_series,
        "halo": halo_series,
        "notes": ("cpu-virtual timings validate the harness + code path "
                  "only; run on a real slice for hardware numbers (see "
                  "module docstring recipe).  A SINGLE-RHS staged sweep "
                  "weak-scales as ~1/D by construction — the recursion is "
                  "serial (SURVEY.md section 7.3 item 2) and stages add.  "
                  "The batched-RHS recovery claim decomposes as: (a) a "
                  "stage's wall time is ~flat in B while G-traffic-bound "
                  "— MEASURED ON THE REAL CHIP as 7.9x multi-RHS "
                  "throughput at B=8 (README / solve.batched); (b) the "
                  "staged schedule carries a batch unchanged — validated "
                  "here (weak_apply_batched_rhs_b8 decays like the B=1 "
                  "series on VIRTUAL devices, which share host cores, so "
                  "B=8's 8x flops cost 8x wall regardless of staging; "
                  "virtual-mesh efficiency cannot exhibit (a) and the "
                  "B-series is recorded as harness-validation raw data, "
                  "not a hardware claim).  weak_solve_square_grids "
                  "reports solve_s_per_iter to decouple iteration-count "
                  "drift from scaling."),
    }


def single_chip_anchor(n=1023, b=12, g_dtype="bf16") -> dict:
    """Real-chip 1-device-mesh anchor: dist apply must ~= single-chip apply
    (VERDICT round 1 item 2 'done' criterion).

    bf16 G by default: at n = 1023 the dist-state build transiently holds
    the plain G stack AND its row-aligned copy, which OOMs one chip at
    f32 (2 x 8.5 GB) but fits at bf16 — and bf16 is the bench
    configuration anyway, so the anchor compares the deployed path."""
    from .roofline import measure_sweep

    single = measure_sweep(n=n, b=b, g_dtype=g_dtype)
    dist = measure_dist_apply(n, b, 1, wave_num=(n + 1) / 8.0, const=100.0,
                              g_dtype=g_dtype)
    return {
        "n": n,
        "g_dtype": g_dtype,
        "single_chip_s_per_apply": single["s_per_apply"],
        "dist_1dev_s_per_apply": dist["s_per_apply"],
        "ratio": dist["s_per_apply"] / max(single["s_per_apply"], 1e-12),
        "single_chip_roofline_fraction": single["roofline_fraction"],
    }


def setup_anchor(n=1023, b=12, g_dtype="bf16", factor_stride=None,
                 reps=3) -> dict:
    """Real-chip 1-device-mesh SETUP anchor (VERDICT round 3, Weak #3 /
    item 8): `distributed_setup` on a 1-device mesh vs the plain
    single-chip assemble+factor stages, warm-executable walls (wave_num is
    traced in both, so distinct frequencies reuse the compiled setup —
    exactly how a frequency sweep hits these paths).  A ratio ~1 completes
    the "distribution costs nothing at D=1" story for BOTH phases (the
    apply half is `single_chip_anchor`)."""
    from ..dist import distributed_setup, make_mesh
    from ..driver import (_assemble_stage, _factor_stage,
                          auto_factor_stride, default_complex_dtype)

    cdtype = default_complex_dtype()
    wf = jnp.result_type(float)
    if factor_stride is None:
        factor_stride = auto_factor_stride(n, "c1_f1")
    mesh = make_mesh(1)

    def single(wn):
        t0 = time.perf_counter()
        (A, hm, _), _ = _assemble_stage(
            jnp.asarray(wn, wf), jnp.asarray(100.0, wf),
            jnp.asarray(2.0, wf), n=n, b=b, problem="c1_f1",
            fidelity="corrected", cdtype=cdtype)
        P = _factor_stage(A, hm, b=b, hf_full_coupling=True,
                          d2_replace=True, setup_chunk=128,
                          g_dtype=g_dtype, factor_stride=factor_stride)
        _sync(P.TF)
        return time.perf_counter() - t0

    def dist(wn):
        t0 = time.perf_counter()
        _, state, _ = distributed_setup(
            mesh, n, b, wn, 100.0, 2.0, "c1_f1", g_dtype=g_dtype,
            factor_stride=factor_stride, complex_dtype=cdtype)
        _sync(state.TF)
        return time.perf_counter() - t0

    single(16.0)                                   # compile
    dist(16.05)
    wns = 16.1 + 0.01 * np.arange(reps)
    t_single = float(np.median([single(w) for w in wns]))
    t_dist = float(np.median([dist(w + 0.005) for w in wns]))
    return {
        "n": n, "b": b, "g_dtype": g_dtype,
        "factor_stride": int(factor_stride),
        "single_chip_setup_s": t_single,
        "dist_1dev_setup_s": t_dist,
        "ratio": t_dist / max(t_single, 1e-12),
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--strong-n", type=int, default=64)
    ap.add_argument("--weak-rows", type=int, default=16)
    ap.add_argument("--b", type=int, default=3)
    ap.add_argument("--ndevs", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--anchor", action="store_true",
                    help="also run the real-chip 1-device anchor")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rep = scaling_report(strong_n=args.strong_n,
                         weak_rows_per_dev=args.weak_rows, b=args.b,
                         ndevs=tuple(args.ndevs))
    if args.anchor:
        rep["single_chip_anchor"] = single_chip_anchor()
        rep["setup_anchor"] = setup_anchor()
    js = json.dumps(rep, indent=1)
    print(js)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(js + "\n")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
