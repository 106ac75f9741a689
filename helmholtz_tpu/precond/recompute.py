"""Recompute-G sweeping preconditioner: the 'recompute' point of the
store-vs-recompute-vs-compress factor-strategy frontier (SURVEY.md
section 7.3 item 1; VERDICT round 2 item 6).

The stored strategy (`sweeping.SweepingPreconditioner`) keeps the full
(M, n, n) corner-inverse stack G — the framework's memory giant and the
TPU analog of the reference's 15 GB of retained SuperLU factors
(code.py:348-353, 590).  This module keeps NO factor state at all: each
application re-assembles and re-factors the moving-PML subgrids in
O(chunk * n^2)-sized pieces while the sweep passes through them, so the
at-rest footprint is the velocity field plus the H_F block-Thomas stack —
O(n^2) total.  The trade is ~2x the factorization flops per application
(each of the two sweeps regenerates the chunks it consumes), which the
matrix-fraction factorization (`sweeping._schur_corner_inverse_fraction`)
makes affordable.

Capacity math at n = 2047 (the BASELINE config 4/5 grid): stored G needs
~67 GB f32 / ~33 GB bf16 — beyond one chip — while this variant needs
~0.5 GB peak, so single-chip solves become possible at any n whose
*vectors* fit.  The distributed path (`dist`) remains the fast option at
scale; recompute is the single-chip capacity fallback and the measured
second point of the frontier (bench capacity artifact).

Rematerialization-over-storage is the standard TPU trade
(jax.checkpoint's logic applied to a factorization instead of
activations); the chunked re-factor inside the sweep keeps every inverse
batched on the MXU exactly like the setup path.

MEASURED BACKEND ENVELOPE (2026-08, axon TPU v5e): the recompute apply is
correct standalone at every size tried (matches the stored apply to
3.6e-9 at n=1535), and GMRES+recompute solves verified on-chip through
n = 1279 (3 iterations, residual 1.7e-7).  At n >= 1407 the SAME program
inside GMRES's nested while_loops hard-crashes the TPU worker ("kernel
fault") — plain GMRES and the standalone apply at those sizes are fine,
chunk size and factor_stride do not matter, so this is a backend
miscompile of the 6-deep loop nest, not an algorithmic limit.
MINIMIZED (round 4, docs/miscompile_repro.py): ONE instantiation of this
apply inside while(while(.)) runs at n = 1407; adding either a SECOND
instantiation in the outer body (gmres's recomputed-residual check) or
the Krylov-basis projections next to the one instantiation faults the
worker — and restructuring the chunk loop (scan / checkpointed bodies,
HELMHOLTZ_TPU_RECOMPUTE_CHUNK_LOOP) or shrinking the program with a
Pallas GJ base case (HELMHOLTZ_TPU_GJ_BASE=pallas) does NOT rescue it:
a program-size/codegen-resource failure, awaiting a backend fix.
WORKAROUND (measured): `run_solver(method="gmres-hostloop")` drives the
solver loops from the host (solve.hostloop), leaving only the apply in
the compiled program — n = 1407 converges on-chip in 5 iterations
(residual 2.7e-4), and the capacity artifact extends past the compressed
stored path's reach.  The compiled nest remains the default everywhere
it works; the sample-compressed stored path (g_compress) is the FAST
single-chip option through 2047^2.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.complexlib import CArray
from ..core.sparse import Stencil5
from ..fd import stencil as fd_stencil
from .sweeping import (_block_thomas_solve, _schur_corner_inverse_fraction,
                       _schur_t_stack)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["wave_num", "const", "alpha", "c_full", "TF",
                 "hf_cs", "hf_cn", "a_cs", "a_cn"],
    meta_fields=["n", "b", "fidelity", "chunk", "schur_block",
                 "d2_replace", "factor_stride"],
)
@dataclasses.dataclass(frozen=True)
class RecomputeSweepingPreconditioner:
    """Factor-free preconditioner state: scalars + velocity + H_F factors.

    At-rest memory is O(n^2) (c_full, TF, coupling rows) — no G stack.
    `chunk` subgrids are re-factored per sweep stage; None = auto-clamped
    to bound the factor workspace exactly like `factor_corner_inverses`.
    """

    wave_num: jax.Array
    const: jax.Array
    alpha: jax.Array
    c_full: jax.Array             # (n+2, n+2) real velocity field
    TF: CArray                    # (b, n, n) H_F Schur-inverse stack
    hf_cs: CArray
    hf_cn: CArray
    a_cs: CArray                  # (L, n) global interlayer couplings
    a_cn: CArray
    n: int
    b: int
    fidelity: str
    chunk: int | None
    schur_block: int
    d2_replace: bool
    factor_stride: int = 1

    @property
    def grid_shape(self):
        return self.a_cs.shape

    def __call__(self, x: jax.Array) -> jax.Array:
        L, n = self.grid_shape
        return apply_recompute(self, x.reshape(L, n)).reshape(-1)


def setup_recompute(n: int, b: int, wave_num, const, alpha, c_full, *,
                    A: Stencil5, fidelity: str = "corrected",
                    hf_full_coupling: bool = True, d2_replace: bool = True,
                    chunk: int | None = None, schur_block: int = 1,
                    factor_stride: int = 1,
                    ) -> RecomputeSweepingPreconditioner:
    """'Factor' the recompute preconditioner: only H_F is actually factored
    (its block-Thomas stack is needed against full-length vectors at every
    apply); the subgrid family is re-derived from (scalars, c_full) inside
    each application."""
    HF = fd_stencil.extract_hf_stencil(A, b, full_coupling=hf_full_coupling)
    TF = _schur_t_stack(HF)
    wf = jnp.result_type(float)
    as_pair = lambda z: z if isinstance(z, CArray) else CArray.of(z)
    return RecomputeSweepingPreconditioner(
        wave_num=jnp.asarray(wave_num, wf), const=jnp.asarray(const, wf),
        alpha=jnp.asarray(alpha, wf), c_full=jnp.asarray(c_full),
        TF=as_pair(TF), hf_cs=as_pair(HF.cs), hf_cn=as_pair(HF.cn),
        a_cs=as_pair(A.cs), a_cn=as_pair(A.cn),
        n=n, b=b, fidelity=fidelity, chunk=chunk, schur_block=schur_block,
        d2_replace=d2_replace, factor_stride=factor_stride)


def _chunk_loop_style() -> str:
    """Chunk-loop structure selector for `apply_recompute`
    (HELMHOLTZ_TPU_RECOMPUTE_CHUNK_LOOP = fori | scan | checkpoint):
    the restructuring experiments for the n >= 1407 compiled-nest
    miscompile (docs/miscompile_repro.py).  The default is whatever the
    measured envelope says is safest — see the module docstring."""
    import os

    style = os.environ.get("HELMHOLTZ_TPU_RECOMPUTE_CHUNK_LOOP", "fori")
    if style not in ("fori", "scan", "checkpoint"):
        raise ValueError(f"unknown chunk-loop style {style!r}")
    return style


def _chunk_g(R: RecomputeSweepingPreconditioner, k0, chunk, cdtype):
    """Corner inverses G_k, k = k0..k0+chunk-1 (G_k acts on grid row b+k),
    re-assembled from the velocity field and re-factored on the fly.

    `R.factor_stride` > 1 factors only every stride-th subgrid and lerps
    between samples — the same smooth-in-m interpolation as
    sweeping._factor_strided (stride-level error far below the
    preconditioner tolerance; iteration parity is the guard), dividing the
    per-apply re-factorization flops by ~stride.  Sample positions are
    GLOBALLY anchored at k = 0 (mod stride), exactly like the stored
    strided path: both sweeps and every chunk size see the same
    interpolated operator (advisor round 3 — per-chunk anchoring made the
    recompute operator depend on the auto-chunk size)."""
    n, b = R.n, R.b
    h = 1.0 / (n + 1)
    eta = b * h
    omega = (2.0 * jnp.pi * R.wave_num + 1j * R.alpha).astype(cdtype)
    stride = max(1, R.factor_stride)

    def build(rows):
        hm = fd_stencil.build_hm_stencils_rows(
            rows, n, b, R.const, eta, omega, h, R.c_full,
            fidelity=R.fidelity, complex_dtype=cdtype)
        return _schur_corner_inverse_fraction(hm,
                                              block_layers=R.schur_block)

    if stride == 1:
        return build(b + k0 + jnp.arange(chunk))

    M = n - b
    # the sample family covering rows k0..k0+chunk-1: the multiples of
    # stride from floor(k0/stride)*stride upward, clamped to the global
    # endpoint M-1 (always a sample, as in the stored path).  The window
    # must cover the WORST chunk alignment: for k0 % stride = stride-1 the
    # last row's lo sample sits floor((chunk+stride-2)/stride) strides
    # past lo0 — S = chunk//stride + 2 (the round-3 sizing) was one short
    # for chunk % stride != 0, which silently EXTRAPOLATED (w > 1) the
    # trailing rows of misaligned chunks (code-review round 4, verified
    # at the n=1407 default chunk=126/stride=8).
    S = (chunk + stride - 2) // stride + 2
    lo0 = (k0 // stride) * stride
    offs = jnp.minimum(lo0 + jnp.arange(S) * stride, M - 1)
    Ts = build(b + offs)
    k = k0 + jnp.arange(chunk)                    # global k of each row
    seg = jnp.minimum((k - lo0) // stride, S - 2)
    lo, hi = offs[seg], offs[seg + 1]
    w = ((k - lo) / jnp.maximum(hi - lo, 1)).astype(
        Ts.real.dtype)[:, None, None]
    return (1.0 - w) * Ts[seg] + w * Ts[seg + 1]


def apply_recompute(R: RecomputeSweepingPreconditioner,
                    f: jax.Array) -> jax.Array:
    """One sweep solve u ~= A^{-1} f with G rematerialized chunkwise.

    Identical algebra to `sweeping.apply_preconditioner` (corrected D2 /
    as-shipped switch included).  Structure: a `fori_loop` over FULL
    chunks (one traced offset, so only ONE chunk-G temp is ever live —
    Python-unrolling the chunks OOMs inside an enclosing GMRES while_loop,
    where XLA keeps every unrolled chunk's (chunk, n, n) buffer alive
    simultaneously) plus one static tail chunk; within a chunk the rows
    update through a `lax.scan` whose carry crosses chunk boundaries
    through the in-place block write.

    f: (L, n), or (L, n, B) for a batch of right-hand sides — the whole
    batch rides ONE chunk-G rematerialization (the chunk factorizations
    are RHS-independent, so B solves cost ~one solve of refactor flops;
    each step's matvec widens to an (n, n) x (n, B) MXU matmul).  The
    batched entry point is `apply_recompute_multi`.
    """
    b = R.b
    L, n = R.grid_shape
    batched = f.ndim == 3
    # broadcast helper: per-row coupling vectors (n,) against (n, B) rows
    bc = (lambda v: v[:, None]) if batched else (lambda v: v)
    cdtype = (R.TF.re.dtype.type(0) + 1j * R.TF.im.dtype.type(0)).dtype
    TF = R.TF.cplx
    hf_cs, hf_cn = R.hf_cs.cplx, R.hf_cn.cplx
    a_cs, a_cn = R.a_cs.cplx, R.a_cn.cplx
    hi = jax.lax.Precision.HIGHEST

    M = L - b
    # auto-chunk: the chunk-G buffer is the dominant O(chunk n^2) state;
    # bigger chunks amortize the sequential scalar-GJ leaf latency
    chunk = R.chunk or max(4, min(128, int(2.5e8) // (n * n)))
    chunk = min(chunk, M)

    u = f
    if batched:
        thomas = jax.vmap(
            lambda r: _block_thomas_solve(TF, hf_cs, hf_cn, r),
            in_axes=2, out_axes=2)
    else:
        thomas = lambda r: _block_thomas_solve(TF, hf_cs, hf_cn, r)
    TFuF = thomas(u[:b])
    u = u.at[b].add(-bc(a_cs[b]) * TFuF[b - 1])

    def g_matvec(g, v):
        return jnp.matmul(g, v, precision=hi)

    # ---- forward sweep: u_j -= cs_j * (G_{j-1} u_{j-1}), j = b+1..L-1 ----
    # step k (0-based) uses G_k, reads row b+k, writes row b+k+1
    def fstep(carry, inp):
        u_j, cs_j, g = inp
        new = u_j - bc(cs_j) * g_matvec(g, carry)
        return new, new

    def fwd_block(u, carry, k0, c):
        G = _chunk_g(R, k0, c, cdtype)
        rows_in = jax.lax.dynamic_slice_in_dim(u, b + 1 + k0, c)
        cs_rows = jax.lax.dynamic_slice_in_dim(a_cs, b + 1 + k0, c)
        carry, out = jax.lax.scan(fstep, carry, (rows_in, cs_rows, G))
        return jax.lax.dynamic_update_slice_in_dim(u, out, b + 1 + k0, 0), \
            carry

    loop_style = _chunk_loop_style()

    def run_chunks(block, u, carry, offsets):
        """Loop `block(u, carry, k0) -> (u, carry)` over traced chunk
        offsets with the selected loop structure — the restructuring knob
        for the n >= 1407 loop-nest miscompile (docs/miscompile_repro.py):
        'fori' (default), 'scan' (same trip count as a scan over offsets),
        'checkpoint' (fori with a rematerialized chunk body)."""
        if offsets.shape[0] == 0:     # no full chunks (tail-only apply) —
            return u, carry           # the body would index an empty array
        body = jax.checkpoint(block) if loop_style == "checkpoint" else block
        if loop_style == "scan":
            (u, carry), _ = jax.lax.scan(
                lambda uc, k0: (block(uc[0], uc[1], k0), None),
                (u, carry), offsets)
            return u, carry
        return jax.lax.fori_loop(
            0, offsets.shape[0],
            lambda ci, uc: body(uc[0], uc[1], offsets[ci]), (u, carry))

    n_full = (M - 1) // chunk
    u, carry = run_chunks(lambda u_, c_, k0: fwd_block(u_, c_, k0, chunk),
                          u, u[b], jnp.arange(n_full) * chunk)
    tail = (M - 1) - n_full * chunk
    if tail:
        u, carry = fwd_block(u, carry, n_full * chunk, tail)

    # ---- fused diagonal + backward sweep, j = L-1..b (G_j at k = j-b) ----
    #   corrected:  u_j = G_j (u_j - cn_j * u_{j+1})
    #   as-shipped: u_j = u_j - G_j (u_j + cn_j * u_{j+1})
    # (cn above the top row enters as a zero via the zero carry)
    cn_top_zeroed = jnp.concatenate(
        [a_cn[b:-1], jnp.zeros_like(a_cn[-1:])], axis=0)

    def bstep(carry, inp):
        u_j, cn_j, g = inp
        if R.d2_replace:
            new = g_matvec(g, u_j - bc(cn_j) * carry)
        else:
            new = u_j - g_matvec(g, u_j + bc(cn_j) * carry)
        return new, new

    def bwd_block(u, carry, k0, c):
        G = _chunk_g(R, k0, c, cdtype)
        rows_in = jax.lax.dynamic_slice_in_dim(u, b + k0, c)
        cn_rows = jax.lax.dynamic_slice_in_dim(cn_top_zeroed, k0, c)
        carry, out = jax.lax.scan(bstep, carry, (rows_in, cn_rows, G),
                                  reverse=True)
        return jax.lax.dynamic_update_slice_in_dim(u, out, b + k0, 0), carry

    n_full_b = M // chunk
    rem = M - n_full_b * chunk          # tail at the BOTTOM (k = 0..rem-1)
    u, carry = run_chunks(lambda u_, c_, k0: bwd_block(u_, c_, k0, chunk),
                          u, jnp.zeros_like(u[-1]),
                          rem + (n_full_b - 1 - jnp.arange(n_full_b)) * chunk)
    if rem:
        u, carry = bwd_block(u, carry, 0, rem)

    rhs = jnp.zeros_like(TFuF).at[b - 1].set(bc(a_cn[b - 1]) * u[b])
    uF = TFuF - thomas(rhs)
    return jnp.concatenate([uF, u[b:]], axis=0)


def apply_recompute_multi(R: RecomputeSweepingPreconditioner,
                          F: jax.Array) -> jax.Array:
    """Batched-RHS recompute apply: F of shape (B, L, n) -> (B, L, n).

    The batch is carried as the trailing matmul axis of one
    `apply_recompute` pass, so all B solves share each chunk's
    re-factorization — the per-apply refactor flops (the recompute
    strategy's whole cost, ~1/stride of a full setup) are paid ONCE for
    the batch instead of per RHS (VERDICT round 3, item 7)."""
    out = apply_recompute(R, jnp.moveaxis(F, 0, -1))
    return jnp.moveaxis(out, -1, 0)


def batchable_recompute_operator(R: RecomputeSweepingPreconditioner):
    """Flat-vector callable whose `jax.vmap` rule dispatches to
    `apply_recompute_multi` — the recompute mirror of
    `sweeping.batchable_operator`, so vmap-built batched solvers
    (solve.batched.solve_multi_rhs) share one chunk-G rematerialization
    across the batch instead of re-factoring per RHS."""
    L, n = R.grid_shape
    r_leaves, r_tree = jax.tree.flatten(R)

    @jax.custom_batching.custom_vmap
    def M_impl(x, *leaves):
        return jax.tree.unflatten(r_tree, leaves)(x)

    @M_impl.def_vmap
    def _rule(axis_size, in_batched, xs, *leaves):
        R_ = jax.tree.unflatten(r_tree, leaves)
        out = apply_recompute_multi(R_, xs.reshape(axis_size, L, n))
        return out.reshape(axis_size, L * n), True

    return lambda x: M_impl(x, *r_leaves)
