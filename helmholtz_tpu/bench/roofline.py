"""Roofline accounting: nnz/s and bytes-moved vs measured machine peaks.

The north-star metric is complex SpMV nnz/s per chip against the HBM
roofline (BASELINE.json; SURVEY.md section 5 'tracing/profiling').  Peaks
are *measured* on the live chip (streaming bandwidth, f32 matmul rate)
rather than quoted from datasheets, so the reported fractions are honest
for this environment.

Timing methodology: kernels run inside a jitted `lax.fori_loop` and a host
fetch anchors the clock — per-dispatch overhead through the remote-device
tunnel is ~300 us and `block_until_ready` does not reliably block (see
`driver._host_sync`).
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def _timed_loop(fn, init, iters=50, args=()):
    """Run state -> state `fn(state, *args)` on device; s/iteration.

    Two-point measurement: times loops of `iters` and `5*iters` steps and
    divides the difference — the fixed per-call cost (remote dispatch +
    host-fetch round trip, ~30-70 ms in this environment) cancels out.

    Large operands MUST come through `args`, not a closure: jit embeds
    closed-over arrays as compile-time constants, which ships them through
    the remote compiler (8.6 GB for the n=1023 factor stack — found the
    hard way).
    """
    @jax.jit
    def loop(x, k, *a):
        return jax.lax.fori_loop(0, k, lambda _, s: fn(s, *a), x,
                                 unroll=False)

    def run(k):
        r = loop(init, k, *args)
        _sync(r)
        t0 = time.perf_counter()
        r = loop(init, k, *args)
        _sync(r)
        return time.perf_counter() - t0

    # median of 3 repeats tames run-to-run tunnel jitter
    diffs = []
    for _ in range(3):
        t_short = run(jnp.asarray(iters))
        t_long = run(jnp.asarray(5 * iters))
        diffs.append(max(t_long - t_short, 1e-9) / (4 * iters))
    return float(np.median(diffs))


def _sync(tree):
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel") and leaf.size:
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def measure_streaming_bw(mb: int = 256) -> float:
    """Achievable HBM streaming bandwidth (GB/s): read+write of one array."""
    N = mb * 1024 * 1024 // 4
    x = jnp.ones((N,), jnp.float32)
    dt = _timed_loop(lambda v: v * 1.0000001, x, iters=30)
    return 2 * mb / 1024 / dt


def measure_read_bw(mb: int = 512) -> float:
    """Achievable read-only HBM bandwidth (GB/s).

    The kernel is `s <- sum(minimum(v, s))` with `s` the loop carry: the
    elementwise `minimum` depends on the carry, so XLA can neither hoist
    the reduction out of the timing loop (a loop-invariant `sum(v)` gets
    hoisted and measures nothing — the sweep 'fraction' came out 0.006
    that way) nor factor it algebraically (as it could `sum(v * s)`).
    Traffic is one full read of `v` per iteration, scalar write.

    Read-dominated kernels (the sweep streams the G stack against O(n)
    vectors) are roofed against this, not the read+write copy rate — with
    the copy denominator the sweep measured a fraction of 1.11."""
    N = mb * 1024 * 1024 // 4
    x = jnp.ones((N,), jnp.float32)

    def step(s, v):
        return jnp.sum(jnp.minimum(v, s)) * (1.0 / N) + 1e-7

    dt = _timed_loop(step, jnp.float32(2.0), iters=30, args=(x,))
    return mb / 1024 / dt


def measure_matmul_tflops(n: int = 4096) -> float:
    """Achievable f32 matmul rate (TFLOP/s)."""
    a = jnp.ones((n, n), jnp.float32)
    b = jnp.ones((n, n), jnp.float32)
    dt = _timed_loop(lambda x: (x @ b) * (1.0 / n), a, iters=20)
    return 2 * n**3 / dt / 1e12


def measure_spmv(n: int = 1023, use_pallas: bool = True) -> dict:
    """Complex stencil SpMV throughput + roofline fraction at grid size n."""
    from ..core.complexlib import CArray
    from ..driver import _assemble_stage
    from ..ops.pallas.spmv_stencil import pallas_stencil_matvec
    from ..ops.spmv import stencil_matvec
    from ..core.complexlib import complexify, pairify

    wf = jnp.result_type(float)
    (A_pair, _, f_pair), _ = _assemble_stage(
        jnp.asarray(16.0, wf), jnp.asarray(81.0, wf), jnp.asarray(2.0, wf),
        n=n, b=12, problem="c1_f1",
        cdtype=jnp.complex64 if wf == jnp.float32 else jnp.complex128,
        fidelity="as-shipped")
    u0 = CArray(f_pair.re.reshape(n, n), f_pair.im.reshape(n, n))

    if use_pallas:
        def step(u, Ap):
            y = pallas_stencil_matvec(Ap, u)
            return CArray(y.re * 1e-3, y.im * 1e-3)
    else:
        def step(u, Ap):
            y = pairify(stencil_matvec(complexify(Ap), u.cplx) * 1e-3)
            return y

    dt = _timed_loop(step, u0, iters=50, args=(A_pair,))
    nnz = 5 * n * n - 4 * n
    itemsize = np.dtype(u0.re.dtype).itemsize
    # Two traffic models: 14 arrays (coeffs + u read + y written — the
    # GMRES situation, where the vector comes from and returns to HBM) and
    # 10 arrays (coeffs only — the benchmark loop situation, where XLA
    # keeps the u/y carry resident in VMEM).  The truth for this loop is
    # the latter; both are reported.
    #
    # DENOMINATOR METHODOLOGY (VERDICT round 3, Weak #1): the FRACTION is
    # computed only for the model that describes this loop's real traffic
    # — the coeff model (10 read arrays, 0 writes; u/y live in VMEM) —
    # roofed against the peak matching that mix: the measured READ-ONLY
    # bandwidth (roofing the ~pure-read kernel against the 1R:1W
    # streaming-copy rate was what produced the impossible 1.012 in
    # BENCH_r03).  The full 14-array model is the GMRES-situation
    # traffic HYPOTHESIS (u read from / y written to HBM); since those
    # bytes are not actually moved by this loop, it is reported as an
    # effective-GB/s figure plus its matching blended peak
    # (12R:2W, 1/W = 2/S - 1/R from the two measured primitives) for
    # context — never as a fraction.
    gb_full = 14 * itemsize * n * n / 1e9
    gb_coeff = 10 * itemsize * n * n / 1e9
    bw_stream = measure_streaming_bw()
    bw_read = measure_read_bw()
    inv_w = max(2.0 / bw_stream - 1.0 / bw_read, 1.0 / bw_read)
    peak_coeff = bw_read
    peak_full = 14.0 / (12.0 / bw_read + 2.0 * inv_w)
    return {
        "kernel": "pallas_stencil_spmv" if use_pallas else "xla_stencil_spmv",
        "n": n,
        "nnz": nnz,
        "s_per_apply": dt,
        "gnnz_per_s": nnz / dt / 1e9,
        "effective_gb_per_s_full_traffic": gb_full / dt,
        "effective_gb_per_s_coeff_traffic": gb_coeff / dt,
        "measured_stream_bw_gb_s": bw_stream,
        "measured_read_bw_gb_s": bw_read,
        "peak_gb_s_coeff_model": peak_coeff,
        "peak_gb_s_full_model": peak_full,
        "traffic_model": "fraction = coeff model (10R:0W, the loop's real "
                         "traffic) / read peak; full model (14 arrays, "
                         "12R:2W) is the GMRES-situation hypothesis — "
                         "GB/s + blended peak only, no fraction",
        "roofline_fraction": (gb_coeff / dt) / peak_coeff,
    }


def measure_setup(n: int = 1023, b: int = 12, *, factor_stride: int | None
                  = None, g_dtype: str = "bf16",
                  setup_chunk: int = 128) -> dict:
    """Setup-phase breakdown + speed-of-light accounting (VERDICT round 4
    task 4: setup dominates every flagship wall — 15.6 s warm init vs
    1.8 s solve at n=2047 — and had no roofline of its own).

    Phases timed warm (jit caches populated) on the live chip:
      * assembly — the whole-grid A + subgrid-family materialization;
      * factor_samples — the batched Schur corner-inverse recursion over
        the strided samples (the flops giant);
      * expand — the lerp-expansion of samples to the dense stack
        (HBM-bound: writes the full G);
      * hf — the H_F block-Thomas stack.

    Speed-of-light models:
      * the Schur recursion's flops are Ms * b * (GJ + update) where a
        blocked Gauss-Jordan inverse of an (n, n) complex matrix costs
        ~8 n^3 real MACs = 16 n^3 flops (ops.dense) and the row/column
        scaling update ~4 n^2 complex MACs; fraction vs the MEASURED f32
        matmul rate (the MXU ceiling a perfectly-scheduled GJ could
        reach; GJ's panel dependencies keep real fractions below it);
      * the expand phase's traffic is read Ms + write M panels (split-
        real); fraction vs measured streaming bandwidth.
    """
    from ..driver import _assemble_stage, auto_factor_stride
    from ..core.complexlib import complexify
    from ..fd import stencil as fd_stencil
    from ..precond.sweeping import (_schur_t_stack, expand_strided_samples,
                                    factor_corner_inverses,
                                    sample_positions)

    wf = jnp.result_type(float)
    cdtype = jnp.complex64 if wf == jnp.float32 else jnp.complex128
    if factor_stride is None:
        factor_stride = auto_factor_stride(n, "c1_f1")
    R = max(1, factor_stride)
    gdt = {"working": wf, "f32": jnp.float32,
           "bf16": jnp.bfloat16}[g_dtype]
    n_pad = ((-(-n // 128) * 128)
             if jax.default_backend() == "tpu" else n)
    M = n - b
    pos = sample_positions(M, R) if R > 1 else np.arange(M)
    Ms = len(pos)

    def wall(fn, *args, reps=2):
        """Warm wall-clock of one jitted call (median of reps)."""
        out = fn(*args)
        _sync(out)                      # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _sync(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    # --- assembly ---------------------------------------------------------
    def assemble(wn, C, al):
        return _assemble_stage(wn, C, al, n=n, b=b, problem="c1_f1",
                               fidelity="corrected", cdtype=cdtype)
    wn = jnp.asarray((n + 1) / 8.0, wf)
    C = jnp.asarray(100.0, wf)
    al = jnp.asarray(2.0, wf)
    t_asm, ((A_pair, hm_pair, _), _) = wall(assemble, wn, C, al)

    # --- factor samples (the Schur recursion) -----------------------------
    @jax.jit
    def factor_samples(hm_p):
        hm = complexify(hm_p)
        hm_s = jax.tree.map(lambda f: f[jnp.asarray(pos)], hm) \
            if R > 1 else hm
        return factor_corner_inverses(hm_s, n_pad=n_pad, g_dtype=wf,
                                      setup_chunk=setup_chunk)
    t_fac, Ts = wall(factor_samples, hm_pair)

    # --- expand -----------------------------------------------------------
    if R > 1:
        @jax.jit
        def expand(ts):
            return expand_strided_samples(ts, M=M, stride=R, g_dtype=gdt,
                                          setup_chunk=setup_chunk)
        t_exp, _ = wall(expand, Ts)
    else:
        t_exp = 0.0

    # --- H_F --------------------------------------------------------------
    from ..core.complexlib import pairify

    @jax.jit
    def hf(A_p):
        A = complexify(A_p)
        HF = fd_stencil.extract_hf_stencil(A, b)
        # pairs at rest: a complex jit OUTPUT would be a resident complex
        # buffer, which this backend cannot hold (core.complexlib)
        return pairify(_schur_t_stack(HF))
    t_hf, _ = wall(hf, A_pair)

    # --- models -----------------------------------------------------------
    gj_flops = 16.0 * n ** 3            # complex GJ inverse, real flops
    upd_flops = 8.0 * n ** 2
    model_tflop = Ms * b * (gj_flops + upd_flops) / 1e12
    mxu_tflops = measure_matmul_tflops()
    frac_factor = (model_tflop / max(t_fac, 1e-9)) / mxu_tflops

    item = np.dtype(gdt).itemsize
    exp_gb = 2 * (Ms * 4 + M * item) * n_pad * n_pad / 1e9  # read f32 + write
    bw_stream = measure_streaming_bw()
    frac_exp = ((exp_gb / max(t_exp, 1e-9)) / bw_stream
                if t_exp else None)

    total = t_asm + t_fac + t_exp + t_hf
    return {
        "kernel": "setup_phases", "n": n, "b": b,
        "factor_stride": R, "samples": int(Ms), "g_dtype": g_dtype,
        "assembly_s": round(t_asm, 3),
        "factor_samples_s": round(t_fac, 3),
        "expand_s": round(t_exp, 3),
        "hf_s": round(t_hf, 3),
        "total_warm_s": round(total, 3),
        "factor_model_tflop": round(model_tflop, 3),
        "factor_effective_tflops": round(model_tflop / max(t_fac, 1e-9), 2),
        "measured_matmul_tflops": round(mxu_tflops, 2),
        "roofline_fraction": frac_factor,
        "expand_gb": round(exp_gb, 3),
        "expand_fraction": frac_exp,
        "traffic_model": "factor fraction = Schur-recursion flop model "
                         "(Ms*b GJ inverses at 16n^3 real flops) vs "
                         "measured f32 matmul peak; expand fraction = "
                         "(read samples + write dense G) vs streaming bw",
    }


def measure_sweep(n: int = 1023, b: int = 12, g_dtype: str = "working") -> dict:
    """Preconditioner-apply throughput vs the G-stack streaming roofline.

    One apply streams the (M, n, n) split-complex corner-inverse stack
    twice (forward sweep + fused diagonal/backward sweep —
    precond.sweeping.apply_preconditioner), which is its dominant traffic;
    the fraction is reported against measured streaming bandwidth.
    """
    from ..core.complexlib import CArray
    from ..driver import _assemble_stage, _factor_stage
    from ..precond.sweeping import apply_preconditioner
    from ..core.complexlib import complexify

    wf = jnp.result_type(float)
    cdtype = jnp.complex64 if wf == jnp.float32 else jnp.complex128
    (A_pair, hm_pair, f_pair), _ = _assemble_stage(
        jnp.asarray(16.0, wf), jnp.asarray(81.0, wf), jnp.asarray(2.0, wf),
        n=n, b=b, problem="c1_f1", cdtype=cdtype, fidelity="as-shipped")
    P = _factor_stage(A_pair, hm_pair, b=b, hf_full_coupling=True,
                      d2_replace=True, setup_chunk=128, g_dtype=g_dtype,
                      factor_stride=(max(1, min(8, n // 128))
                                     if jax.default_backend() == "tpu"
                                     else 1))
    # loop state stays split-real: complex leaves cannot be device_get
    # through this backend (core.complexlib)
    f0 = CArray(f_pair.re.reshape(n, n), f_pair.im.reshape(n, n))

    def step(up, Pa):
        v = apply_preconditioner(Pa, jax.lax.complex(up.re, up.im))
        s = 1.0 / (1.0 + 1e-6)
        return CArray(jnp.real(v) * s, jnp.imag(v) * s)

    dt = _timed_loop(step, f0, iters=5, args=(P,))
    M, n_pad = P.G.re.shape[0], P.G.re.shape[-1]
    itemsize = np.dtype(P.G.re.dtype).itemsize
    g_gb = 2 * 2 * M * n_pad * n_pad * itemsize / 1e9   # 2 passes, re+im
    # The sweep's modeled traffic is the G stream alone — reads; the row
    # vectors it writes are O(M n), a ~1/n fraction of the G bytes — so
    # its matched peak is the read-only bandwidth (denominator methodology
    # in measure_spmv).
    bw = measure_read_bw()
    return {
        "kernel": "sweep_apply",
        "n": n,
        "subgrids": M,
        "s_per_apply": dt,
        "g_traffic_gb_per_apply": g_gb,
        "effective_gb_per_s": g_gb / dt,
        "measured_read_bw_gb_s": bw,
        "traffic_model": "G stream 2 passes, pure-read vs read peak "
                         "(writes are O(M n), ~1/n of G bytes)",
        "roofline_fraction": (g_gb / dt) / bw,
    }
