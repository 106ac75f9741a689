"""Moving-PML sweeping preconditioner (Engquist-Ying Algorithms 2.3/2.4).

TPU-native re-design of the reference's SuperLU-based implementation
(code.py:345-385; SURVEY.md sections 3.3-3.4, 7.3):

The reference factors each bn x bn subgrid matrix H_m with SuperLU and, per
application, performs ~3(n-b) sparse triangular solves — the hot serial
kernel.  The TPU formulation exploits that the sweep only ever needs

    T~_m u  =  (H_m^{-1} [0; ...; 0; u])[last n entries]
            =  G_m @ u,        G_m := (H_m^{-1})[b-th block, b-th block],

i.e. each subgrid solve *is* a dense n x n matvec with the corner block of
H_m^{-1}.  Since H_m is block-tridiagonal in its b layer-blocks (tridiagonal
diagonal blocks, diagonal couplings), G_m = S_b^{-1} where S_l is the
layer-Schur recursion S_l = H_ll - C_l S_{l-1}^{-1} C'_{l-1}.  Setup is
therefore b dense n x n inversions per m — *batched over all m at once* on
the MXU (the reference's n-b factorizations are embarrassingly parallel but
serial in scipy, SURVEY.md section 3.3) — and each sweep step is one dense
matvec instead of a SuperLU triangular solve.

H_F (the leading bn x bn block) must be solved against full-length vectors,
so it keeps a block-Thomas factorization: the stack T_l = S_l^{-1} of layer
Schur-complement inverses, applied with forward/diagonal/backward passes
(the same scheme as the reference's exact algo2_2, code.py:334-342, which is
exact for block-tridiagonal matrices).

Fidelity (SURVEY.md Appendix A): the *corrected* algorithm (deviations D2/D3
fixed) is the default and reproduces the paper's 2-3 iteration convergence.
`d2_replace=False` reproduces the as-shipped subtract-instead-of-replace
diagonal step; the as-shipped block-diagonal H_F (D3) is selected at setup
via `hf_full_coupling=False`.  D1 (preconditioning a fixed vector,
code.py:510-511) is not a linear operator and is intentionally not part of
the solver path; `apply_fixed_rhs` exposes it for emulation experiments.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.complexlib import CArray
from ..core.sparse import Stencil5
from ..fd import stencil as fd_stencil
from ..ops.dense import batched_inverse


def setup_workspace_words() -> int:
    """Complex-word budget for the batched-inverse setup workspace — the
    chunk clamp is `budget // n^2` subgrids per Gauss-Jordan call.

    Default 3.2e7 words (round 5; was 9.0e7): the measured setup roofline
    (bench.roofline.measure_setup, the round-5 budget sweep at n = 1023)
    is NON-monotone in the chunk — 1.1e7 -> 14.6, 2.2e7 -> 16.9,
    3.2e7 -> 20.0, 9e7 -> 16.5, 1.35e8 -> 12.7 effective TF/s — i.e. the
    blocked Gauss-Jordan is working-set-bound, not batch-starved, and
    ~0.25 GB of complex workspace is its sweet spot on this chip
    (setup-factor wall 1.50 s vs 1.82 s at the old clamp).  Overridable
    (HELMHOLTZ_TPU_SETUP_WORKSPACE_WORDS) for memory-tight or future
    backends; the capacity flagships budget ~3 * 8 bytes per word."""
    import os

    raw = os.environ.get("HELMHOLTZ_TPU_SETUP_WORKSPACE_WORDS", "")
    try:
        return int(float(raw)) if raw else int(3.2e7)
    except ValueError:
        return int(3.2e7)


def _g_dot(g, V):
    """G-panel contraction handling reduced-precision G storage: f32 G runs
    at HIGHEST precision (the bf16 MXU default degrades the sweep); bf16 G
    runs natively on the MXU with f32 accumulation.  The RHS keeps ~f32
    accuracy through a hi+lo bf16 split (G @ V = G @ V_hi + G @ V_lo as ONE
    contraction over doubled columns — G, the HBM-traffic giant, is still
    read once): rounding the carry vector to a single bf16 costs +2 GMRES
    iterations at n=1023 (measured), the split costs none."""
    if g.dtype == V.dtype:
        return jnp.matmul(g, V, precision=jax.lax.Precision.HIGHEST)
    cols = V.shape[-1]
    V_hi = V.astype(g.dtype)
    V_lo = (V - V_hi.astype(V.dtype)).astype(g.dtype)
    out = jax.lax.dot_general(g, jnp.concatenate([V_hi, V_lo], axis=-1),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=V.dtype)
    return out[..., :cols] + out[..., cols:]


def _dense_tridiag(cw, cc, ce):
    """Dense (..., n, n) from per-layer tridiagonal fields (..., n).

    cw is the sub-diagonal coupling (masked zero at i=0), ce the super
    (masked at i=n-1), cc the main diagonal.
    """
    n = cc.shape[-1]
    i = jnp.arange(n)
    out = jnp.zeros((*cc.shape[:-1], n, n), cc.dtype)
    out = out.at[..., i, i].set(cc)
    out = out.at[..., i[1:], i[1:] - 1].set(cw[..., 1:])
    out = out.at[..., i[:-1], i[:-1] + 1].set(ce[..., :-1])
    return out


def _schur_t_stack(H: Stencil5):
    """Layer Schur-complement inverses T_l = S_l^{-1}, l = 0..L-1, for a
    block-tridiagonal Stencil5 with fields (..., L, n).

    S_0 = H_00;  S_l = H_ll - diag(cs_l) @ T_{l-1} @ diag(cn_{l-1}).
    Returns T of shape (..., L, n, n).  The diagonal couplings turn the
    Schur update into a row/column scaling of T_{l-1} — no SpGEMM needed.

    The dense (n, n) diagonal block is materialized per scan step from its
    three coefficient rows, so peak memory is O(batch * n^2) regardless of
    L (materializing all L blocks up front OOMs at n=1023, where one
    (chunk, b, n, n) buffer alone is ~13 GB).
    """
    T0 = batched_inverse(
        _dense_tridiag(H.cw[..., 0, :], H.cc[..., 0, :], H.ce[..., 0, :]))

    def step(T_prev, inputs):
        cw_l, cc_l, ce_l, cs_l, cn_lm1 = inputs
        S = (_dense_tridiag(cw_l, cc_l, ce_l)
             - cs_l[..., :, None] * T_prev * cn_lm1[..., None, :])
        T = batched_inverse(S)
        return T, T

    xs = (
        jnp.moveaxis(H.cw[..., 1:, :], -2, 0),
        jnp.moveaxis(H.cc[..., 1:, :], -2, 0),
        jnp.moveaxis(H.ce[..., 1:, :], -2, 0),
        jnp.moveaxis(H.cs[..., 1:, :], -2, 0),
        jnp.moveaxis(H.cn[..., :-1, :], -2, 0),
    )
    _, T_rest = jax.lax.scan(step, T0, xs)
    T_rest = jnp.moveaxis(T_rest, 0, -3)
    return jnp.concatenate([T0[..., None, :, :], T_rest], axis=-3)


def _schur_corner_inverse(H: Stencil5):
    """T_{L-1} = S_{L-1}^{-1} only (the subgrid corner inverse G_m), without
    stacking the intermediate T_l — peak memory one (batch, n, n) carry."""
    T0 = batched_inverse(
        _dense_tridiag(H.cw[..., 0, :], H.cc[..., 0, :], H.ce[..., 0, :]))

    def step(T_prev, inputs):
        cw_l, cc_l, ce_l, cs_l, cn_lm1 = inputs
        S = (_dense_tridiag(cw_l, cc_l, ce_l)
             - cs_l[..., :, None] * T_prev * cn_lm1[..., None, :])
        return batched_inverse(S), None

    xs = (
        jnp.moveaxis(H.cw[..., 1:, :], -2, 0),
        jnp.moveaxis(H.cc[..., 1:, :], -2, 0),
        jnp.moveaxis(H.ce[..., 1:, :], -2, 0),
        jnp.moveaxis(H.cs[..., 1:, :], -2, 0),
        jnp.moveaxis(H.cn[..., :-1, :], -2, 0),
    )
    T_last, _ = jax.lax.scan(step, T0, xs)
    return T_last


def _tridiag_matmul(cw, cc, ce, X):
    """(..., n, n) product of the tridiagonal matrix with fields (..., n)
    against a dense X — three shifted row-scaled adds (VPU, O(n^2)), never a
    materialized dense tridiagonal or an MXU matmul."""
    Y = cc[..., :, None] * X
    Y = Y.at[..., 1:, :].add(cw[..., 1:, None] * X[..., :-1, :])
    Y = Y.at[..., :-1, :].add(ce[..., :-1, None] * X[..., 1:, :])
    return Y


def _schur_corner_inverse_fraction(H: Stencil5, block_layers: int = 4):
    """T_{L-1} = S_{L-1}^{-1} via fundamental-solution propagation of the
    layer recursion — the flop-lean TPU formulation of the subgrid
    factorization (the reference pays a full SuperLU factorization per
    subgrid, code.py:349-352; `_schur_corner_inverse` pays one dense n x n
    inversion per LAYER, i.e. 2*L*n^3 complex MACs per subgrid).

    Let V_l solve the three-term matrix recurrence of the block-tridiagonal
    subgrid (diagonal blocks D_l tridiagonal, couplings diag(cs)/diag(cn)):

        diag(cs_l) V_{l-1} + D_l V_l + diag(cn_l) V_{l+1} = 0,
        V_0 = I,  V_1 = -diag(1/cn_0) D_0.

    Then the layer Schur complements satisfy (inductively)
        S_l = D_l + diag(cs_l) V_{l-1} V_l^{-1},
    so the corner inverse needs NO intermediate inversions:
        T_{L-1} = V_{L-1} @ W^{-1},
        W = D_{L-1} V_{L-1} + diag(cs_{L-1}) V_{L-2}.

    Each propagation step is a tridiagonal-times-dense product plus diagonal
    scalings — O(n^2) on the VPU, no MXU, no inversion.  The recurrence is a
    transfer-matrix iteration whose iterates grow like rho^l and whose
    columns collapse onto the dominant subspace, so every `block_layers`
    steps the pair is RENORMALIZED by the right-invariance of the fraction:
    (V_{l-1}, V_l) -> (V_{l-1} V_l^{-1}, I) — one dense inversion + matmul.
    With b = 12 and block_layers = 4 that is 3 dense inversions per subgrid
    instead of 12 (~2.7x fewer O(n^3) flops).

    MEASURED NUMERICS CEILING (why this is NOT the TPU default): rho is
    the spread of the layer transfer spectrum — ~6 at oracle scales
    (n = 63, C = 61; k = 4 gives 1e-4 f32 G error, fine) but ~1e2 at the
    production configs (n = 1023, C = 100: |V| reaches 1e8 after 4 layers
    and kappa(V) exceeds 1/eps_f32 — even pivoted LAPACK cannot invert the
    renormalization in f32, measured V@inv-I residual ~2).  At k = 2 the
    collapses survive but must run at HIGHEST precision (kappa ~ 1e4),
    which costs more wall-time than the direct recursion's
    DEFAULT-precision inverses of the diagonally dominant S blocks
    (26.6 vs 41-49 complex-real TF/s measured).  Kept as an explicit
    option for small-n / float64 runs and as the measured second point of
    the factorization-strategy frontier.

    block_layers = 1 falls back to the direct recursion.
    """
    L = H.cc.shape[-2]
    k = max(1, min(block_layers, L - 1))
    if k == 1 or L < 3:
        return _schur_corner_inverse(H)
    hi = jax.lax.Precision.HIGHEST

    def layer(f, l):
        return jax.lax.dynamic_index_in_dim(f, l, axis=-2, keepdims=False)

    def vstep(carry, l):
        """V_{l+1} = -(1/cn_l) (D_l V_l + cs_l V_{l-1})."""
        Vm1, V = carry
        num = (_tridiag_matmul(layer(H.cw, l), layer(H.cc, l),
                               layer(H.ce, l), V)
               + layer(H.cs, l)[..., :, None] * Vm1)
        # reciprocal on the (..., n) coupling vector, broadcast-multiplied —
        # never an elementwise complex divide over the (..., n, n) matrix
        Vn = (-1.0 / layer(H.cn, l))[..., :, None] * num
        return (V, Vn), None

    eye = jnp.broadcast_to(jnp.eye(H.cc.shape[-1], dtype=H.cc.dtype),
                           (*H.cc.shape[:-2], H.cc.shape[-1],
                            H.cc.shape[-1]))
    # V_0 = I, V_1 = -(1/cn_0) D_0  (tridiagonal rows of layer 0)
    V = (-1.0 / H.cn[..., 0, :])[..., :, None] * _dense_tridiag(
        H.cw[..., 0, :], H.cc[..., 0, :], H.ce[..., 0, :])
    Vm1, V = eye, V
    l = 1                      # V currently holds V_l
    since_renorm = 1
    while l < L - 1:
        (Vm1, V), _ = vstep((Vm1, V), jnp.asarray(l))
        l += 1
        since_renorm += 1
        if since_renorm >= k and l < L - 1:
            # V is NOT diagonally dominant (transfer-matrix iterate) —
            # unpivoted GJ needs full-f32 passes here (see batched_inverse)
            Vm1 = jnp.matmul(Vm1, batched_inverse(V, precision=hi),
                             precision=hi)
            V = eye
            since_renorm = 0
    # final collapse at layer L-1: T = V_{L-1} @ W^{-1}
    W = (_tridiag_matmul(H.cw[..., L - 1, :], H.cc[..., L - 1, :],
                         H.ce[..., L - 1, :], V)
         + H.cs[..., L - 1, :][..., :, None] * Vm1)
    return jnp.matmul(V, batched_inverse(W, precision=hi), precision=hi)


def factor_corner_inverses(hm, *, n_pad: int, g_dtype,
                           setup_chunk: int = 128,
                           zero_mask: jax.Array | None = None,
                           schur_block: int | None = None,
                           stride: int = 1,
                           corner_fn=None) -> CArray:
    """Factor a batched subgrid family (Stencil5 fields (M, b, n)) into its
    corner-inverse stack G: a split-real CArray (M, n_pad, n_pad), zero
    lane-padded, stored as `g_dtype`.

    Shared by the single-device setup (`setup_preconditioner`) and the
    distributed per-band setup (`dist.factor`), where each device calls this
    on its own row-aligned family inside shard_map — the reference's n-b
    independent factorizations (code.py:349-352) parallelized across the
    mesh so setup memory scales with devices.

    `zero_mask`: optional (M,) bool — entries forced to zero after
    factoring (the F-band rows of a row-aligned family, which have no
    subgrid).  Applied per chunk, so masked entries still cost their
    factorization flops but never a full-stack pass.

    `schur_block`: layers between renormalizations of the fraction
    recursion (`_schur_corner_inverse_fraction`); None = auto = 1 (the
    direct recursion — measured faster AND stabler at production scale;
    see the fraction docstring for the numerics ceiling that rules out
    k >= 2 as a default).

    `stride` > 1 factors only every stride-th subgrid and linearly
    interpolates the corner inverses between samples — setup flops divided
    by ~stride.  Valid because G_m is a SMOOTH function of m: consecutive
    subgrids share the whole moved-PML structure and differ only by a
    one-row shift of the velocity window (fd.stencil.build_hm_stencils
    docstring), so for velocity fields smooth on the scale of stride rows
    the interpolation error is O((stride*h / feature_scale)^2) — e.g.
    ~2e-4 relative at n = 1023 / stride 8 for the c1 lens, far below the
    bf16 G-storage rounding (4e-3) that already leaves GMRES iteration
    counts unchanged.  Exact (any stride) for row-invariant media.  The
    endpoint m = M-1 is always a sample.  Iteration-count parity vs
    stride = 1 is the guard — tests pin it at oracle scale and bench.py
    records it at n = 1023.  Not combined with `zero_mask` (the
    distributed per-band path keeps stride = 1).

    Peak memory is the final G plus ~3 * chunk * n^2 complex words of
    batched-inverse workspace; the chunk is clamped so that workspace stays
    bounded as n grows.  The strided path additionally holds the sample
    stack (~(M/stride) * n_pad^2 f32 pairs) while interpolating.
    """
    M, _, n = hm.cc.shape
    if schur_block is None:
        schur_block = 1
    # corner_fn: the batched family -> (batch, n, n) corner-inverse map.
    # Default = the 5-point layer-Schur recursion; the 9-point path passes
    # sweeping9's tridiagonal-coupling recursion — the chunk/stride/mask
    # machinery here is footprint-agnostic (it only tree-maps the family).
    corner = corner_fn or partial(_schur_corner_inverse_fraction,
                                  block_layers=schur_block)

    if stride > 1 and zero_mask is None and M > stride:
        return _factor_strided(hm, n_pad=n_pad, g_dtype=g_dtype,
                               setup_chunk=setup_chunk,
                               schur_block=schur_block, stride=stride,
                               corner_fn=corner_fn)
    # bound peak setup memory: a few (chunk, n, n) complex buffers live
    # inside the batched inverse, so scale the chunk down with the grid —
    # but keep at least ~16 matrices per Gauss-Jordan call (the round-5
    # chunk sweep: throughput falls off below ~20 as well as above ~40;
    # at n = 2047 the word budget alone would give chunk 7 and a ~12%
    # slower setup than chunk 16-21, measured)
    setup_chunk = max(4, min(setup_chunk,
                             max(16, setup_workspace_words() // (n * n))))

    def pad_g(x, start):
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        if zero_mask is not None:
            keep = ~jax.lax.dynamic_slice_in_dim(zero_mask, start,
                                                 x.shape[0], 0)
            x = jnp.where(keep[:, None, None], x, 0)
        return x.astype(g_dtype)

    if M <= setup_chunk:
        T = corner(hm)
        return CArray(pad_g(T.real, 0), pad_g(T.imag, 0))

    # Chunked fori_loop writing the split-real G buffers in place
    # (dynamic_update_slice in a loop is in-place under XLA), so peak
    # memory is the final G plus one chunk of workspace — a stacked
    # lax.map would double-buffer the ~(M, n, n) result (OOM at
    # n=1023, where G alone is ~8.5 GB).  Padding happens per chunk for
    # the same reason: padding the assembled stack would transiently
    # double it.
    n_chunks = -(-M // setup_chunk)

    def body(i, bufs):
        G_re, G_im = bufs
        # overlap-clamped start: the last chunk re-computes a few
        # duplicate subgrids instead of padding the family
        start = jnp.minimum(i * setup_chunk, M - setup_chunk)
        h_chunk = jax.tree.map(
            lambda f: jax.lax.dynamic_slice_in_dim(f, start, setup_chunk, 0),
            hm)
        Tc = corner(h_chunk)
        G_re = jax.lax.dynamic_update_slice_in_dim(
            G_re, pad_g(Tc.real, start), start, 0)
        G_im = jax.lax.dynamic_update_slice_in_dim(
            G_im, pad_g(Tc.imag, start), start, 0)
        return (G_re, G_im)

    G_re, G_im = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.zeros((M, n_pad, n_pad), g_dtype),
         jnp.zeros((M, n_pad, n_pad), g_dtype)))
    return CArray(G_re, G_im)


def _factor_strided(hm, *, n_pad: int, g_dtype,
                    setup_chunk: int, schur_block: int,
                    stride: int, corner_fn=None) -> CArray:
    """Strided factorization: factor every stride-th subgrid exactly, lerp
    the corner inverses in between (see factor_corner_inverses docstring).
    """
    M, _, n = hm.cc.shape
    wf = hm.cc.real.dtype                     # working float
    # sample_positions is the shared layout (a duplicated endpoint when
    # stride | M-1 costs one redundant factorization and lerps to weight
    # zero — keeping the layout identical to the compressed/expand paths)
    ks_arr = jnp.asarray(sample_positions(M, stride))
    hm_s = jax.tree.map(lambda f: f[ks_arr], hm)
    # samples at working precision, already lane-padded (zero pads lerp to
    # zero, so interpolation happens in padded space)
    Ts = factor_corner_inverses(hm_s, n_pad=n_pad, g_dtype=wf,
                                setup_chunk=setup_chunk,
                                schur_block=schur_block,
                                corner_fn=corner_fn)
    return expand_strided_samples(Ts, M=M, stride=stride, g_dtype=g_dtype,
                                  setup_chunk=setup_chunk)


def expand_strided_samples(Ts: CArray, *, M: int, stride: int, g_dtype,
                           setup_chunk: int = 128) -> CArray:
    """Chunked lerp-expansion of a stride-sampled corner-inverse stack Ts
    (Ms, n_pad, n_pad; positions `sample_positions(M, stride)`) to the
    dense (M, n_pad, n_pad) stack at `g_dtype` — the second half of the
    strided factorization, exposed so callers that assembled ONLY the
    sample subgrids (the 9-point path: nine (M, b, n) fields would not
    fit HBM at production b) can expand without the full family."""
    wf = Ts.re.dtype
    n_pad = Ts.re.shape[-1]
    ks_arr = jnp.asarray(sample_positions(M, stride))
    Ms = ks_arr.shape[0]
    if Ts.re.shape[0] != Ms:
        # jnp.take clips out-of-range indices under jit, so a mismatched
        # stack would silently yield a wrong G for every late row
        raise ValueError(
            f"sample stack has {Ts.re.shape[0]} entries; "
            f"sample_positions({M}, {stride}) defines {Ms} — the stack "
            "was not assembled at the shared strided layout")

    wchunk = max(4, min(setup_chunk, int(9.0e7) // (n_pad * n_pad)))
    wchunk = min(wchunk, M)
    n_chunks = -(-M // wchunk)

    def body(i, bufs):
        G_re, G_im = bufs
        start = jnp.minimum(i * wchunk, M - wchunk)
        m = start + jnp.arange(wchunk)
        seg = jnp.minimum(m // stride, Ms - 2)
        lo, hi = ks_arr[seg], ks_arr[seg + 1]
        # duplicated endpoint sample (stride | M-1): hi == lo there, and
        # m == lo makes the guarded weight exactly 0 (pure lo sample)
        w = ((m - lo) / jnp.maximum(hi - lo, 1)).astype(wf)[:, None, None]

        def lerp(T):
            return ((1.0 - w) * jnp.take(T, seg, axis=0)
                    + w * jnp.take(T, seg + 1, axis=0)).astype(g_dtype)

        G_re = jax.lax.dynamic_update_slice_in_dim(
            G_re, lerp(Ts.re), start, 0)
        G_im = jax.lax.dynamic_update_slice_in_dim(
            G_im, lerp(Ts.im), start, 0)
        return (G_re, G_im)

    G_re, G_im = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.zeros((M, n_pad, n_pad), g_dtype),
         jnp.zeros((M, n_pad, n_pad), g_dtype)))
    return CArray(G_re, G_im)


def _block_thomas_solve(T, cs, cn, rhs):
    """Solve the block-tridiagonal system given its Schur-inverse stack.

    T: (L, n, n); cs/cn: (L, n) diagonal couplings; rhs: (L, n) (or with a
    trailing batch (..., L, n) via vmap).  Forward eliminate, then combined
    diagonal+backward substitution — the algo2_2 scheme (code.py:334-342),
    exact for block-tridiagonal systems.
    """
    hi = jax.lax.Precision.HIGHEST

    def fwd(y_prev, inputs):
        T_prev, cs_l, r_l = inputs
        y = r_l - cs_l * jnp.matmul(T_prev, y_prev, precision=hi)
        return y, y

    _, y_rest = jax.lax.scan(fwd, rhs[0], (T[:-1], cs[1:], rhs[1:]))
    y = jnp.concatenate([rhs[:1], y_rest], axis=0)

    u_last = jnp.matmul(T[-1], y[-1], precision=hi)

    def bwd(u_next, inputs):
        T_l, cn_l, y_l = inputs
        u = jnp.matmul(T_l, y_l - cn_l * u_next, precision=hi)
        return u, u

    _, u_rest = jax.lax.scan(bwd, u_last, (T[:-1], cn[:-1], y[:-1]),
                             reverse=True)
    return jnp.concatenate([u_rest, u_last[None]], axis=0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["G", "TF", "hf_cs", "hf_cn", "a_cs", "a_cn", "g_w", "g_lo"],
    meta_fields=["b", "d2_replace", "g_stride"],
)
@dataclasses.dataclass(frozen=True)
class SweepingPreconditioner:
    """Factored state of the moving-PML sweeping preconditioner.

    All fields are split-real `CArray`s — this is the framework's largest
    at-rest state (G is ~8.5 GB at n=1023) and must be storable in TPU HBM,
    which has no complex buffer type (core.complexlib).

    G    : (M, n_pad, n_pad), M = n-b — corner inverses G_m of each subgrid
           H_m, ZERO-padded to lane multiples when built with pad_lanes
           (n_pad = ceil(n/128)*128; n_pad = n otherwise); G[k] acts on grid
           row j = b+k (0-based), i.e. the subgrid whose top layer is j.
           This replaces the reference's list of n-b SuperLU factor objects
           (code.py:348-353).
    TF   : (b, n, n) — block-Thomas Schur-inverse stack for H_F.
    hf_*: H_F interlayer couplings; a_*: the global operator's interlayer
           couplings (rows of A.cs / A.cn — code.py:499-507 equivalents).
    """

    G: CArray
    TF: CArray
    hf_cs: CArray
    hf_cn: CArray
    a_cs: CArray
    a_cn: CArray
    b: int
    d2_replace: bool
    # sample-compressed G (g_compress=True at setup): G holds every
    # g_stride-th corner inverse; logical step k applies
    # g_w[k,0] * G[g_lo[k]] + g_w[k,1] * G[g_lo[k]+1] (ops.pallas.sweep).
    # g_stride = 0 -> dense.
    g_w: jax.Array | None = None      # (M, 2) f32 bracketing weights
    g_lo: jax.Array | None = None     # (M,) int32 lo sample index <= Ms-2
    g_stride: int = 0

    @property
    def grid_shape(self):
        return self.a_cs.shape

    def __call__(self, x: jax.Array) -> jax.Array:
        """LinearOperator-style matvec on a flat (N,) vector."""
        L, n = self.grid_shape
        return apply_preconditioner(self, x.reshape(L, n)).reshape(-1)


def sample_positions(M: int, R: int) -> np.ndarray:
    """Global sweep-space sample positions for stride-R compression: the
    multiples of R (anchored at k = 0) with the endpoint M-1 always a
    sample — the single source of truth shared by the single-chip,
    distributed, and recompute strided paths."""
    Ms = (M - 1) // R + 2
    return np.minimum(np.arange(Ms) * R, M - 1)


def band_sample_window(M: int, R: int, k_first: int, k_last: int):
    """Inclusive global-sample index window (s0, s1) bracketing sweep rows
    k_first..k_last of a stride-R compressed stack whose samples are
    `sample_positions(M, R)`: every row k in the band has its bracketing
    pair (lo, lo+1) inside [s0, s1].  The single source of the band
    geometry shared by dist.factor (per-band strided factorization),
    dist.partition (single-chip stack re-layout), and bench.plan
    (capacity accounting) — previously three hand-rolled copies
    (code-review round 4)."""
    Ms = (M - 1) // R + 2
    s0 = min(k_first // R, Ms - 2)
    s1 = min(k_last // R, Ms - 2) + 1
    return s0, s1


def compress_tables(M: int, R: int):
    """Per-row (g_w, g_lo) lerp tables for a stride-R compressed G stack:
    row k applies g_w[k,0] * S[g_lo[k]] + g_w[k,1] * S[g_lo[k]+1] over the
    `sample_positions(M, R)` sample stack.  Static given (M, R) — anchor
    stacks factored at DIFFERENT frequencies share the same tables, which
    is what makes the omega-lerp of sample panels well-defined
    (driver.run_multisolve freq amortization)."""
    pos = sample_positions(M, R)
    Ms = pos.shape[0]
    k = np.arange(M)
    lo = np.minimum(k // R, Ms - 2)
    denom = np.maximum(pos[lo + 1] - pos[lo], 1)
    t = (k - pos[lo]) / denom
    g_w = jnp.asarray(np.stack([1.0 - t, t], axis=1), jnp.float32)
    g_lo = jnp.asarray(lo, jnp.int32)
    return g_w, g_lo


def preconditioner_from_samples(A: Stencil5, b: int, G_samples: CArray, *,
                                g_stride: int,
                                hf_full_coupling: bool = True,
                                d2_replace: bool = True
                                ) -> SweepingPreconditioner:
    """Build the full sweeping preconditioner from an ALREADY-FACTORED
    stride-compressed sample stack (e.g. the omega-lerp of two anchor
    frequencies' stacks, driver.run_multisolve) plus the operator A at the
    target frequency: only H_F is factored here (b small inversions) — the
    O(M/stride) corner-inverse factorizations, the setup giant, are not
    re-paid.  Reference analog: the per-frequency `algo2_3` re-factoring
    the reference pays at every frequency of its sweep (code.py:574-592)."""
    M = A.cc.shape[0] - b
    g_w, g_lo = compress_tables(M, g_stride)
    HF = fd_stencil.extract_hf_stencil(A, b, full_coupling=hf_full_coupling)
    TF = _schur_t_stack(HF)
    as_pair = lambda z: z if isinstance(z, CArray) else CArray.of(z)
    return SweepingPreconditioner(
        G=as_pair(G_samples), TF=as_pair(TF),
        hf_cs=CArray.of(HF.cs), hf_cn=CArray.of(HF.cn),
        a_cs=CArray.of(A.cs), a_cn=CArray.of(A.cn),
        b=b, d2_replace=d2_replace, g_w=g_w, g_lo=g_lo, g_stride=g_stride)


def setup_preconditioner(A: Stencil5, hm: Stencil5, b: int, *,
                         hf_full_coupling: bool = True,
                         d2_replace: bool = True,
                         setup_chunk: int = 128,
                         pad_lanes: bool | None = None,
                         g_dtype=None,
                         schur_block: int | None = None,
                         factor_stride: int = 1,
                         g_compress: bool = False) -> SweepingPreconditioner:
    """Algorithm 2.3 analog: factor H_F and every H_m (code.py:345-353).

    `hm` is the batched subgrid family from `fd.stencil.build_hm_stencils`
    (fields (M, b, n)).  The per-m Schur recursions are independent and run
    as one batched computation; `setup_chunk` bounds peak memory at
    ~3 * chunk * n^2 complex words.

    `pad_lanes` (default: on for the TPU backend) stores G ZERO-padded to
    (M, n_pad, n_pad), n_pad = ceil(n/128)*128 — the layout contract of the
    Pallas sweep kernel (ops.pallas.sweep).  Zero padding keeps every padded
    lane exactly zero through the whole recursion, so neither the kernel nor
    the XLA fallback needs masking.  Cost: (n_pad/n)^2 - 1 extra G memory
    (~0.2% at n=1023).

    `g_dtype` (default: the working float) is the STORAGE dtype of the G
    stack.  `jnp.bfloat16` halves the factor memory and the apply's HBM
    traffic (the sweep's dominant term) at an ~8-bit-mantissa G; the
    moving-PML approximation error dominates far earlier, so iteration
    counts are unchanged at the reference scales (measured n=511: 3/2/2
    iterations at refine 0/1/2 for both f32 and bf16 G).  The Schur
    recursion itself always runs at the working precision — only storage
    is rounded.

    `g_compress=True` (requires factor_stride > 1) stores ONLY the sampled
    corner inverses plus per-step lerp weights instead of expanding the
    interpolation to the dense stack: at-rest factor memory drops
    ~factor_stride-fold (the Pallas kernel lerps the two bracketing
    sample panels; values identical to the expanded strided stack, so
    iteration counts match it exactly).  The apply re-fetches both
    bracketing panels per step (~2x a dense stream — ops.pallas.sweep
    docstring), so this is the CAPACITY point of the
    store/compress/recompute frontier (SURVEY.md section 7.3 item 1):
    n=2047 bf16 stride-8 fits one chip (bench.plan); use dense storage
    whenever G fits.
    """
    M, _, n = hm.cc.shape
    if pad_lanes is None:
        pad_lanes = jax.default_backend() == "tpu"
    n_pad = (-(-n // 128) * 128) if pad_lanes else n
    g_dtype = g_dtype or hm.cc.real.dtype
    g_w = g_lo = None
    g_stride = 0
    if g_compress and factor_stride > 1 and M > factor_stride:
        R = factor_stride
        pos = sample_positions(M, R)
        hm_s = jax.tree.map(lambda f: f[jnp.asarray(pos)], hm)
        G = factor_corner_inverses(hm_s, n_pad=n_pad, g_dtype=g_dtype,
                                   setup_chunk=setup_chunk,
                                   schur_block=schur_block)
        g_w, g_lo = compress_tables(M, R)
        g_stride = R
    else:
        G = factor_corner_inverses(hm, n_pad=n_pad, g_dtype=g_dtype,
                                   setup_chunk=setup_chunk,
                                   schur_block=schur_block,
                                   stride=factor_stride)

    HF = fd_stencil.extract_hf_stencil(A, b, full_coupling=hf_full_coupling)
    TF = _schur_t_stack(HF)

    as_pair = lambda z: z if isinstance(z, CArray) else CArray.of(z)
    return SweepingPreconditioner(
        G=as_pair(G), TF=as_pair(TF),
        hf_cs=CArray.of(HF.cs), hf_cn=CArray.of(HF.cn),
        a_cs=CArray.of(A.cs), a_cn=CArray.of(A.cn),
        b=b, d2_replace=d2_replace, g_w=g_w, g_lo=g_lo, g_stride=g_stride)


def apply_preconditioner(P: SweepingPreconditioner, f: jax.Array,
                         impl: str = "auto") -> jax.Array:
    """Algorithm 2.4 analog: one sweep solve u ~= A^{-1} f (code.py:356-385).

    f has grid shape (L, n); returns the same shape.  Fully jittable; the
    m-recursion runs as two `lax.scan`s of dense matvecs (SURVEY.md
    section 3.4).  The reference's three passes (forward / diagonal /
    backward, code.py:366-380) are algebraically fused into two: the
    diagonal step folds into the backward sweep as
        u_j = G_j (u_j^{fwd} - cn_j * u_{j+1})          (corrected)
        u_j = u_j^{fwd} - G_j (u_j^{fwd} + cn_j * u_{j+1})   (as-shipped D2)
    so each application streams the ~(M, n, n) G stack through HBM twice
    instead of three times — the apply is HBM-bandwidth-bound and this is a
    1.5x on its dominant term.

    The G matvecs run directly on the split-real pair (4 real matvecs as two
    (n, n) @ (n, 2) matmuls — each G buffer is read once per step), so the
    complex G is never materialized as a complex buffer.

    `impl`: "pallas" runs the two sweeps as the Pallas recursion kernel
    (ops.pallas.sweep — requires the lane-padded G layout, interpret mode on
    CPU), "xla" the lax.scan formulation, "auto" picks Pallas on TPU when
    the layout allows.
    """
    b = P.b
    L, n = P.grid_shape
    TF = P.TF.cplx
    hf_cs, hf_cn = P.hf_cs.cplx, P.hf_cn.cplx
    a_cs, a_cn = P.a_cs.cplx, P.a_cn.cplx
    Gre, Gim = P.G.re, P.G.im
    n_pad = Gre.shape[-1]          # lane-padded G (setup pad_lanes)
    if impl == "auto":
        impl = ("pallas" if (jax.default_backend() == "tpu"
                             and n_pad % 128 == 0) else "xla")
    M_total = L - b                # number of sweep rows
    shared_g = Gre.shape[0] == 1 and M_total > 1
    # shared-G family (row-invariant velocity, e.g. the c2 waveguide under
    # corrected sampling): every subgrid H_m is the same matrix, so G holds
    # ONE corner inverse used at every sweep step — the (n, n) panel stays
    # VMEM/cache-resident instead of streaming an (M, n, n) stack from HBM.
    u = f

    def g_matvec(gre, gim, v):
        # (n, 2) RHS: one read of gre and one of gim per step.  For f32 G
        # precision is pinned to HIGHEST: the *implicit* bf16 MXU rounding
        # of an f32 G degrades the preconditioner from 5 to 7 GMRES
        # iterations at n=1023 — the apply is HBM-bound, so the extra
        # passes are nearly free.  (Explicit bf16-STORED G keeps iteration
        # counts — see setup_preconditioner g_dtype — because the stored
        # rounding is one-time, not per-product re-rounding of the carry
        # chain inputs at every step of the Schur recursion.)
        V = jnp.stack([jnp.real(v), jnp.imag(v)], axis=-1)
        if n_pad > n:
            V = jnp.pad(V, ((0, n_pad - n), (0, 0)))
        RV = _g_dot(gre, V)
        IV = _g_dot(gim, V)
        return jax.lax.complex(RV[:n, 0] - IV[:n, 1], RV[:n, 1] + IV[:n, 0])

    # H_F solve + first correction: u_b -= A_{b+1,F} T_F u_F (code.py:364-365)
    TFuF = _block_thomas_solve(TF, hf_cs, hf_cn, u[:b])
    u = u.at[b].add(-a_cs[b] * TFuF[b - 1])

    cn_top_zeroed = jnp.concatenate(
        [a_cn[b:-1], jnp.zeros_like(a_cn[-1:])], axis=0)

    if impl == "pallas":
        from ..ops.pallas.sweep import pallas_sweep
        interp = jax.default_backend() == "cpu"
        rows = lambda z, sl: CArray(z.re[sl], z.im[sl])
        ck = dict(interpret=interp, g_lo=P.g_lo, g_w=P.g_w)
        if M_total > 1:
            u_fwd = pallas_sweep(
                P.G, CArray.of(u[b + 1:]), rows(P.a_cs, slice(b + 1, None)),
                CArray.of(u[b]), mode="fwd", **ck)
            u = jnp.concatenate([u[:b + 1], u_fwd.cplx], axis=0)
        u_bwd = pallas_sweep(
            P.G, CArray.of(u[b:]), CArray.of(cn_top_zeroed),
            CArray.of(jnp.zeros_like(u[-1])),
            mode=("bwd" if P.d2_replace else "bwd_sub"), **ck)
        u = jnp.concatenate([u[:b], u_bwd.cplx], axis=0)
    else:
        # The sweeps index G per step out of the closed-over resident buffer
        # (dynamic_index_in_dim): passing G[:-1] as scan xs would materialize
        # a near-full copy of the ~8.5 GB stack.
        ks = jnp.arange(M_total - 1)

        def g_row(k):
            if P.g_stride:
                # sample-compressed G: weighted bracketing samples (the
                # XLA fallback reads two panels per step; the traffic win
                # belongs to the Pallas kernel's revolving buffers).
                # Weights and accumulation stay f32 even for bf16-stored
                # G, matching the Pallas kernel's f32 lerp-of-outputs
                # (advisor round 3: a bf16 weight quantizes t to ~3
                # digits and diverges from the kernel).
                wdt = jnp.promote_types(Gre.dtype, jnp.float32)
                lo = P.g_lo[k]
                w0 = P.g_w[k, 0].astype(wdt)
                w1 = P.g_w[k, 1].astype(wdt)
                pick = lambda g, i: jax.lax.dynamic_index_in_dim(
                    g, i, 0, keepdims=False).astype(wdt)
                return (w0 * pick(Gre, lo) + w1 * pick(Gre, lo + 1),
                        w0 * pick(Gim, lo) + w1 * pick(Gim, lo + 1))
            k = 0 if shared_g else k
            return (jax.lax.dynamic_index_in_dim(Gre, k, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(Gim, k, 0, keepdims=False))

        # forward sweep j = b+1..L-1: u_j -= cs_j * (G_{j-1} u_{j-1})
        def fwd(prev, inputs):
            cs_j, u_j, k = inputs
            gre, gim = g_row(k)
            new = u_j - cs_j * g_matvec(gre, gim, prev)
            return new, new

        _, u_fwd = jax.lax.scan(fwd, u[b], (a_cs[b + 1:], u[b + 1:], ks))
        u = jnp.concatenate([u[:b + 1], u_fwd], axis=0)

        # fused diagonal + backward sweep, j = L-1..b (reverse scan):
        #   corrected (D2 fixed): u_j = G_j (u_j - cn_j * u_{j+1})
        #   as-shipped (code.py:375): u_j -= G_j (u_j + cn_j * u_{j+1})
        # (cn_{L-1} term absent for the top row: seeded via a zero carry)
        def bwd(nxt, inputs):
            cn_j, u_j, k = inputs
            gre, gim = g_row(k)
            if P.d2_replace:
                new = g_matvec(gre, gim, u_j - cn_j * nxt)
            else:
                new = u_j - g_matvec(gre, gim, u_j + cn_j * nxt)
            return new, new

        ks_all = jnp.arange(M_total)
        _, u_bwd = jax.lax.scan(
            bwd, jnp.zeros_like(u[-1]), (cn_top_zeroed, u[b:], ks_all),
            reverse=True)
        u = jnp.concatenate([u[:b], u_bwd], axis=0)

    # F-block closure: u_F = T_F u_F - T_F (A_{F,b+1} u_b)  (code.py:381-384)
    rhs = jnp.zeros_like(TFuF).at[b - 1].set(a_cn[b - 1] * u[b])
    uF = TFuF - _block_thomas_solve(TF, hf_cs, hf_cn, rhs)
    return jnp.concatenate([uF, u[b:]], axis=0)


def apply_preconditioner_multi(P: SweepingPreconditioner, F: jax.Array,
                               impl: str = "auto") -> jax.Array:
    """Batched-RHS apply: F of shape (B, L, n) -> (B, L, n).

    On TPU the whole batch rides ONE stream of the G stack (the Pallas
    sweep kernel widens its per-panel contraction to 2B rows — SURVEY.md
    section 2.3 'batched RHS parallelism', BASELINE config 5), so B solves
    cost about one solve of HBM traffic.  Elsewhere it falls back to vmap
    over the single-RHS apply.
    """
    b = P.b
    L, n = P.grid_shape
    n_pad = P.G.re.shape[-1]
    if impl == "auto":
        impl = ("pallas" if (jax.default_backend() == "tpu"
                             and n_pad % 128 == 0) else "xla")
    if impl != "pallas":
        return jax.vmap(lambda f: apply_preconditioner(P, f, impl))(F)

    from ..ops.pallas.sweep import pallas_sweep
    interp = jax.default_backend() == "cpu"
    TF = P.TF.cplx
    hf_cs, hf_cn = P.hf_cs.cplx, P.hf_cn.cplx
    a_cs, a_cn = P.a_cs.cplx, P.a_cn.cplx
    thomas = jax.vmap(lambda r: _block_thomas_solve(TF, hf_cs, hf_cn, r))
    rows = lambda z, sl: CArray(z.re[sl], z.im[sl])
    to_sbn = lambda x: CArray.of(jnp.swapaxes(x, 0, 1))   # (B,S,n)->(S,B,n)

    u = F
    TFuF = thomas(u[:, :b])                               # (B, b, n)
    u = u.at[:, b].add(-a_cs[b] * TFuF[:, b - 1])

    M_total = L - b               # sweep rows (G may be a shared-G single
    cn_top_zeroed = jnp.concatenate(  # entry broadcast over all of them)
        [a_cn[b:-1], jnp.zeros_like(a_cn[-1:])], axis=0)

    ck = dict(interpret=interp, g_lo=P.g_lo, g_w=P.g_w)
    if M_total > 1:
        u_fwd = pallas_sweep(
            P.G, to_sbn(u[:, b + 1:]), rows(P.a_cs, slice(b + 1, None)),
            CArray.of(u[:, b]), mode="fwd", **ck)
        u = jnp.concatenate(
            [u[:, :b + 1], jnp.swapaxes(u_fwd.cplx, 0, 1)], axis=1)
    u_bwd = pallas_sweep(
        P.G, to_sbn(u[:, b:]), CArray.of(cn_top_zeroed),
        CArray.of(jnp.zeros_like(u[:, -1])),
        mode=("bwd" if P.d2_replace else "bwd_sub"), **ck)
    u = jnp.concatenate([u[:, :b], jnp.swapaxes(u_bwd.cplx, 0, 1)], axis=1)

    rhs = jnp.zeros_like(TFuF).at[:, b - 1].set(a_cn[b - 1] * u[:, b])
    uF = TFuF - thomas(rhs)
    return jnp.concatenate([uF, u[:, b:]], axis=1)


def batchable_operator(P: SweepingPreconditioner):
    """Wrap P as a flat-vector callable whose `jax.vmap` rule dispatches to
    `apply_preconditioner_multi` — so `vmap`-built batched solvers
    (solve.batched.solve_multi_rhs) share one G stream across the batch
    instead of re-streaming the stack per RHS.

    P's leaves cross the custom_vmap boundary as explicit arguments (not a
    closure), so the wrapper also works when P is a tracer tree inside an
    enclosing jit (e.g. driver._msolve_stage)."""
    L, n = P.grid_shape
    p_leaves, p_tree = jax.tree.flatten(P)

    @jax.custom_batching.custom_vmap
    def M_impl(x, *leaves):
        return jax.tree.unflatten(p_tree, leaves)(x)

    @M_impl.def_vmap
    def _rule(axis_size, in_batched, xs, *leaves):
        P_ = jax.tree.unflatten(p_tree, leaves)
        out = apply_preconditioner_multi(P_, xs.reshape(axis_size, L, n))
        return out.reshape(axis_size, L * n), True

    return lambda x: M_impl(x, *p_leaves)


def apply_fixed_rhs(P: SweepingPreconditioner, f_fixed: jax.Array):
    """Reproduce deviation D1 (code.py:510-511): a 'preconditioner' that
    ignores its argument and always sweeps the fixed RHS.  Returned for
    emulation/diagnosis only — it is not a linear operator."""
    L, n = P.grid_shape
    u = apply_preconditioner(P, f_fixed.reshape(L, n)).reshape(-1)
    return lambda _x: u
