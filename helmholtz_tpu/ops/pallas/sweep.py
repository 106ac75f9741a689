"""Pallas TPU kernel for the sweeping-preconditioner recursions.

The forward / fused diagonal+backward sweeps of Algorithm 2.4
(code.py:356-385; precond.sweeping.apply_preconditioner) are first-order
matrix recurrences over the stack of subgrid corner inverses G:

    fwd      : u_j   <- u_j - cs_j * (G_{j-1} @ u_{j-1})
    bwd      : u_j   <- G_j @ (u_j - cn_j * u_{j+1})        (corrected D2)
    bwd_sub  : u_j   <- u_j - G_j @ (u_j + cn_j * u_{j+1})  (as-shipped D2)

They are HBM-bandwidth-bound: each step streams one (n, n) complex G block
(split-real f32 pairs) against an (n,)-vector carry.  The XLA `lax.scan`
formulation runs each step as two dependent fusions at ~380 GB/s (profiler,
n=1023); this kernel owns the whole recursion so the G panels stream through
VMEM with double-buffered DMA while the carry / rhs / partial-result vectors
stay resident in VMEM scratch across grid steps (the TPU grid is sequential,
so scratch persists — that is what makes a sequential recurrence expressible
as a Pallas grid at all).

Batched right-hand sides (R > 1 — SURVEY.md section 2.3 'batched RHS
parallelism', BASELINE config 5) ride the SAME G stream: the per-panel
contraction grows from (2, n_pad) to (2R, n_pad) rows, so R solves cost one
solve of G traffic and better MXU utilization, instead of `vmap` re-reading
the multi-GB stack per RHS.

Layout contract: G must be ZERO-padded to (Mg, n_pad, n_pad) with
n_pad = ceil(n/128)*128 (done once at preconditioner setup).  Zero padding
makes every padded lane exactly zero throughout the recursion — no masking
anywhere in the kernel.  Row vectors are padded on entry here.

Complex convention (core.complexlib): split re/im f32 planes; the complex
matvec is two real (2R, n_pad) x (BR, n_pad)^T contractions per panel, at
HIGHEST precision (the bf16 MXU default degrades the preconditioner — see
precond.sweeping).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.complexlib import CArray


def _kernel(*refs, mode, br, nr, nrhs, n_pad, lerp, tri, nsteps=0):
    if lerp:
        (lo_ref, gre, gim, gre2, gim2, lw, u2, c2, carry0,
         out2, carry, rhs, w) = refs
    else:
        gre, gim, u2, c2, carry0, out2, carry, rhs, w = refs
        gre2 = gim2 = lw = None
    r = pl.program_id(1)

    def coup(kr, ki):
        """Complex coupling application to the (R, n_pad) carry planes:
        diagonal (5-point inter-layer blocks) or tridiagonal (9-point —
        sub/dia/sup vectors applied with lane rolls; the masked-zero edge
        coefficients kill the wrapped elements, and zero lane padding
        keeps every rolled-in pad value zero)."""
        if not tri:
            cr, ci = c2[0, 0, 0], c2[0, 1, 0]          # (n_pad,)
            return cr * kr - ci * ki, cr * ki + ci * kr
        sr, dr, pr_ = c2[0, 0, 0], c2[0, 0, 1], c2[0, 0, 2]
        si, di, pi_ = c2[0, 1, 0], c2[0, 1, 1], c2[0, 1, 2]
        krm, kim = (jnp.roll(kr, 1, axis=-1), jnp.roll(ki, 1, axis=-1))
        krp, kip = (jnp.roll(kr, -1, axis=-1), jnp.roll(ki, -1, axis=-1))
        re = (sr * krm - si * kim) + (dr * kr - di * ki) \
            + (pr_ * krp - pi_ * kip)
        im = (sr * kim + si * krm) + (dr * ki + di * kr) \
            + (pr_ * kip + pi_ * krp)
        return re, im

    @pl.when((pl.program_id(0) == 0) & (r == 0))
    def _():
        carry[...] = carry0[...]

    @pl.when(r == 0)
    def _():
        if mode == "fwd":
            rhs[...] = carry[...]
        else:
            uu = u2[0]                       # (2, R, n_pad)
            kr, ki = carry[0], carry[1]      # (R, n_pad)
            pr, pi = coup(kr, ki)
            if mode == "bwd":
                rhs[0] = uu[0] - pr
                rhs[1] = uu[1] - pi
            else:  # bwd_sub
                rhs[0] = uu[0] + pr
                rhs[1] = uu[1] + pi

    lowp = gre.dtype != rhs.dtype      # reduced-precision stored G (bf16)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        # f32 G: HIGHEST (implicit bf16 MXU rounding degrades the sweep);
        # bf16-stored G: native MXU bf16 x bf16 -> f32 accumulation
        precision=None if lowp else jax.lax.Precision.HIGHEST,
        preferred_element_type=rhs.dtype,
    )
    flat = rhs[...].reshape(2 * nrhs, n_pad)
    if lowp:
        # hi+lo bf16 split of the carry rows: ~f32-accurate product while
        # the G panel (the HBM traffic) is still read once
        # (precond.sweeping._g_dot has the XLA-path analog)
        fhi = flat.astype(gre.dtype)
        flo = (flat - fhi.astype(flat.dtype)).astype(gre.dtype)
        flat = jnp.concatenate([fhi, flo], axis=0)     # (4R, n_pad)

        def dot2(x, gpanel):
            out = dot(x, gpanel)                       # (4R, br) f32
            return out[:2 * nrhs] + out[2 * nrhs:]
    else:
        dot2 = dot
    if lerp:
        # sample-compressed G: this step's corner inverse is the weighted
        # combination w0 * G[lo_k] + w1 * G[lo_k + 1] of the two bracketing
        # samples (w0 = 1-t, w1 = t for interior interpolation; w0 = w1 = 0
        # yields an exactly-zero G for F-band rows of a row-aligned
        # distributed shard).  Weights are applied to the dot OUTPUTS
        # (bilinear) in f32, so the hi/lo bf16 carry split composes
        # unchanged.  Consecutive steps usually map the same sample blocks,
        # so the pipeline skips their re-fetch — G traffic drops
        # ~stride-fold vs the dense stack.  Weights live whole in SMEM
        # (per-step blocks are below the (8, 128) tile minimum); the
        # per-step sample index arrives via scalar prefetch (lo_ref drives
        # the BlockSpec index maps).
        m = pl.program_id(0)
        k = m if mode == "fwd" else nsteps - 1 - m
        w0 = lw[2 * k].astype(rhs.dtype)
        w1 = lw[2 * k + 1].astype(rhs.dtype)
        A2 = (w0 * dot2(flat, gre[0])
              + w1 * dot2(flat, gre2[0])).reshape(2, nrhs, br)
        B2 = (w0 * dot2(flat, gim[0])
              + w1 * dot2(flat, gim2[0])).reshape(2, nrhs, br)
    else:
        A2 = dot2(flat, gre[0]).reshape(2, nrhs, br)  # [Gre@vr, Gre@vi]
        B2 = dot2(flat, gim[0]).reshape(2, nrhs, br)
    w[0, :, pl.ds(r * br, br)] = A2[0] - B2[1]
    w[1, :, pl.ds(r * br, br)] = A2[1] + B2[0]

    @pl.when(r == nr - 1)
    def _():
        uu = u2[0]
        if mode == "fwd":
            pr, pi = coup(w[0], w[1])
            res_re = uu[0] - pr
            res_im = uu[1] - pi
        elif mode == "bwd":
            res_re, res_im = w[0], w[1]
        else:  # bwd_sub
            res_re = uu[0] - w[0]
            res_im = uu[1] - w[1]
        res = jnp.stack([res_re, res_im])
        out2[0] = res
        carry[...] = res


def _pack_rows(x: CArray, n_pad: int) -> jax.Array:
    """(S, R, n) CArray -> (S, 2, R, n_pad) zero-padded real array."""
    pad = n_pad - x.re.shape[-1]
    p = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
    return jnp.stack([p(x.re), p(x.im)], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("mode", "block_rows", "interpret"))
def pallas_sweep(G: CArray, u: CArray, c: CArray, carry0: CArray, *,
                 mode: str, block_rows: int = 128,
                 interpret: bool = False,
                 g_lo: jax.Array | None = None,
                 g_w: jax.Array | None = None) -> CArray:
    """Run one sweep recursion over the G stack.

    G      : (Mg, n_pad, n_pad) CArray, zero-padded (setup_preconditioner).
    u      : (S, n) or (S, R, n) CArray — per-step input rows, optionally
             with R batched right-hand sides sharing the G stream.
             fwd: S <= Mg steps use G[0..S-1] in order (pass the FULL stack
             with S = Mg-1 to match the XLA path's k = 0..M-2; slicing G
             would copy the multi-GB stack).
             bwd/bwd_sub: S = Mg, steps process rows last-to-first using
             G[Mg-1-m]; `c` must already have the top row zeroed.
    c      : (S, n) CArray — DIAGONAL inter-layer coupling rows (5-point
             blocks), shared across RHS; or (S, 3, n) — [sub, diag, sup]
             TRIDIAGONAL coupling triples (9-point blocks,
             precond.sweeping9), applied in-kernel with lane rolls.  The
             mode is inferred from the rank, so pass exactly one of the
             two shapes.
    carry0 : (n,) or (R, n) CArray — initial carry (fwd: the row below;
             bwd: zeros).

    g_lo/g_w — sample-compressed G (CAPACITY feature: at-rest factor memory
    drops ~stride-fold; 2047^2 fits one chip at bf16 stride 8).  G holds
    SAMPLES of the corner-inverse stack; logical step k applies
        G_k = g_w[k, 0] * G[g_lo[k]] + g_w[k, 1] * G[g_lo[k] + 1].
    `g_lo` is (K,) int32 with values <= Mg - 2 (K >= S logical steps,
    scalar-prefetched so it drives the panel DMA schedule), `g_w` is (K, 2)
    f32.  Arbitrary sample placement is allowed — equidistant single-chip
    stacks use lo = min(k // stride, Mg-2), row-aligned distributed shards
    clamp their band edges and zero their F rows (w = (0, 0)).  Per-step
    HBM traffic does NOT drop: the panel tiling over r changes the block
    index every grid iteration, so the pipeline re-fetches both bracketing
    panels each step (~2x a dense stream; measured 0.204 s vs 0.129 s per
    n=1023 solve).  Prefer dense storage whenever it fits.

    Returns the (S, n) / (S, R, n) CArray of updated rows in natural order.
    """
    assert mode in ("fwd", "bwd", "bwd_sub"), mode
    Mg, n_pad, n_pad2 = G.re.shape
    assert n_pad == n_pad2 and n_pad % 128 == 0, G.re.shape
    squeeze = u.re.ndim == 2
    if squeeze:
        u = CArray(u.re[:, None, :], u.im[:, None, :])
        carry0 = CArray(carry0.re[None, :], carry0.im[None, :])
    S, nrhs, n = u.re.shape
    lerp = g_lo is not None
    # Mg == 1 with S > 1 is the shared-G family (row-invariant velocity):
    # one corner inverse broadcast over every sweep step — the panel gets
    # DMA'd once and stays VMEM-resident instead of streaming (S, n, n).
    shared = Mg == 1 and S > 1 and not lerp
    assert lerp or shared or ((S <= Mg) if mode == "fwd" else (S == Mg)), \
        (S, Mg)
    if lerp:
        assert g_w is not None and g_w.shape[0] >= S, (g_w, S)
        assert g_lo.shape[0] >= S, (g_lo, S)
    dtype = u.re.dtype

    u2 = _pack_rows(u, n_pad)                          # (S, 2, R, n_pad)
    # c: (S, n) diagonal coupling vectors (5-point inter-layer blocks) or
    # (S, 3, n) [sub, diag, sup] triples (9-point tridiagonal blocks —
    # precond.sweeping9); the triple rides the pack like a 3-wide row
    # block and the kernel applies it with lane rolls
    tri = c.re.ndim == 3
    if tri:
        c2 = _pack_rows(c, n_pad)                      # (S, 2, 3, n_pad)
    else:
        c2 = _pack_rows(CArray(c.re[:, None, :], c.im[:, None, :]), n_pad)
    pad = ((0, 0), (0, n_pad - carry0.re.shape[-1]))
    c0 = jnp.stack([jnp.pad(carry0.re, pad), jnp.pad(carry0.im, pad)])

    br = block_rows if n_pad % block_rows == 0 else 128
    br = min(br, n_pad)
    nr = n_pad // br

    if mode == "fwd":
        kidx = lambda m: m                 # logical G index of step m
        row_map = lambda m, r, *_: (m, 0, 0, 0)
    else:
        kidx = lambda m: S - 1 - m
        row_map = lambda m, r, *_: (S - 1 - m, 0, 0, 0)
    if lerp:
        g_map = lambda m, r, lo: (lo[kidx(m)], r, 0)
        g_map2 = lambda m, r, lo: (lo[kidx(m)] + 1, r, 0)
    elif shared:
        g_map = lambda m, r: (0, r, 0)
    else:
        g_map = lambda m, r: (kidx(m), r, 0)

    g_spec = pl.BlockSpec((1, br, n_pad), g_map, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 2, nrhs, n_pad), row_map,
                            memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, 2, 3 if tri else 1, n_pad), row_map,
                          memory_space=pltpu.VMEM)

    in_specs = [g_spec, g_spec]
    args = [G.re, G.im]
    if lerp:
        g_spec2 = pl.BlockSpec((1, br, n_pad), g_map2,
                               memory_space=pltpu.VMEM)
        # the whole weight table sits in SMEM, indexed by the step id
        # in-kernel (per-step SMEM blocks are not a legal TPU block
        # shape).  FLATTENED to 1-D (2S,) = w[2k], w[2k+1]: a 2-D (S, 2)
        # SMEM window gets its minor dim lane-padded x64 — 1.04 MB at
        # n = 2047, which alone overflows the 1 MB SMEM budget (found by
        # the batched 2047 flagship compile); the flat table is 16 KB
        w_spec = pl.BlockSpec((2 * S,), lambda m, r, lo: (0,),
                              memory_space=pltpu.SMEM)
        in_specs += [g_spec2, g_spec2, w_spec]
        args += [G.re, G.im, g_w.astype(jnp.float32)[:S].reshape(-1)]
    in_specs += [row_spec, c_spec, pl.BlockSpec(memory_space=pltpu.VMEM)]
    args += [u2, c2, c0]

    kern = functools.partial(_kernel, mode=mode, br=br, nr=nr, nrhs=nrhs,
                             n_pad=n_pad, lerp=lerp, tri=tri, nsteps=S)
    out_shape = jax.ShapeDtypeStruct((S, 2, nrhs, n_pad), dtype)
    scratch = [
        pltpu.VMEM((2, nrhs, n_pad), dtype),   # carry
        pltpu.VMEM((2, nrhs, n_pad), dtype),   # rhs
        pltpu.VMEM((2, nrhs, n_pad), dtype),   # w = G @ rhs
    ]
    if lerp:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(S, nr), in_specs=in_specs,
            out_specs=row_spec, scratch_shapes=scratch)
        out = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape,
                             interpret=interpret)(
            g_lo.astype(jnp.int32)[:S], *args)
    else:
        out = pl.pallas_call(kern, grid=(S, nr), in_specs=in_specs,
                             out_specs=row_spec, out_shape=out_shape,
                             scratch_shapes=scratch, interpret=interpret,
                             )(*args)
    res = CArray(out[:, 0, :, :n], out[:, 1, :, :n])
    if squeeze:
        res = CArray(res.re[:, 0], res.im[:, 0])
    return res
