"""Moving-PML sweeping preconditioner for the 9-POINT discretization.

The 5-point module (`precond.sweeping`) exploits that A's inter-layer
coupling blocks are DIAGONAL, so the layer-Schur update is a row/column
scaling.  The 9-point scheme (`fd.stencil.build_a_stencil9`) adds the four
corner couplings, which makes the inter-layer blocks TRIDIAGONAL:

    A9 layer block row j:  [ L_j | D_j | U_j ]
    D_j = tridiag(cw, cc, ce)_j          (within-layer)
    L_j = tridiag(csw, cs, cse)_j        (to layer j-1)
    U_j = tridiag(cnw, cn, cne)_j        (to layer j+1)

Everything in the Engquist-Ying construction survives with tridiagonal
couplings at the SAME cost structure: the Schur update
S_l = D_l - L_l T_{l-1} U_{l-1} is two O(n^2) shifted-row/column passes
around the dense T (no extra O(n^3)), the sweep's coupling applications
are O(n) tridiagonal matvecs, and the corner inverse G_m is still one
dense (n, n) block per subgrid — so the batched MXU factorization, the
chunk/stride machinery, and the G storage formats of the 5-point path are
reused verbatim (`factor_corner_inverses(corner_fn=...)`).

The apply dispatches to the Pallas sweep kernel on TPU — the kernel's
tridiagonal-coupling mode applies the [sub, diag, sup] triples with lane
rolls (ops.pallas.sweep) — and to the XLA scan formulation elsewhere;
interpret-mode parity between the two is pinned by tests/test_precond9.

PML-WIDTH GUIDANCE (measured on TPU, c1-f1 at the reference's
points-per-wavelength): the 9-point subgrid needs a WIDER moved PML than
the 5-point scheme's b = 12 — the tapered diagonal branch leaves only
the 5-point part absorbing, so the layer must be deeper.  b ~ n/14 with
C ~ 60 keeps iteration counts flat: 4 @ n=255/b=24 and 4 @ n=511/b=36
(vs 15 and no-convergence-in-100 at b=12).  Apply cost is b-independent
(G is (M, n, n) regardless); only the setup's layer recursion scales
with b.

Reference anchor: the reference is 5-point-only (code.py:70-115 and the
PDF's "The paper provides the 5-point stencil"); this module is the
framework exceeding the reference's discretization order, with the same
preconditioner mathematics.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.complexlib import CArray
from ..core.sparse import Stencil9
from ..fd import stencil as fd_stencil
from ..ops.dense import batched_inverse
from .sweeping import _dense_tridiag, _g_dot, factor_corner_inverses


def _tridiag_matvec(sub, diag, sup, v):
    """y = tridiag(sub, diag, sup) @ v for per-row coupling triples (n,):
    y_i = sub_i v_{i-1} + diag_i v_i + sup_i v_{i+1} (sub[0]/sup[-1] are
    masked zero by assembly)."""
    y = diag * v
    y = y.at[1:].add(sub[1:] * v[:-1])
    y = y.at[:-1].add(sup[:-1] * v[1:])
    return y


def _tridiag_rmatmul(X, sub, diag, sup):
    """Y = X @ tridiag(sub, diag, sup) — columns of Y combine adjacent
    columns of X: Y[..., j] = X[..., j-1] sup_{j-1} + X[..., j] diag_j
    + X[..., j+1] sub_{j+1}.  O(n^2) shifted adds, no materialized
    tridiagonal, mirror of sweeping._tridiag_matmul (left-multiply)."""
    Y = X * diag[..., None, :]
    Y = Y.at[..., :, 1:].add(X[..., :, :-1] * sup[..., None, :-1])
    Y = Y.at[..., :, :-1].add(X[..., :, 1:] * sub[..., None, 1:])
    return Y


def _tridiag_lmatmul(sub, diag, sup, X):
    """Y = tridiag(sub, diag, sup) @ X — rows combine (sweeping's
    _tridiag_matmul with the coupling-triple argument order)."""
    Y = diag[..., :, None] * X
    Y = Y.at[..., 1:, :].add(sub[..., 1:, None] * X[..., :-1, :])
    Y = Y.at[..., :-1, :].add(sup[..., :-1, None] * X[..., 1:, :])
    return Y


def _layer(H: Stencil9, l):
    pick = lambda f: f[..., l, :]
    return {k: pick(getattr(H, k)) for k in
            ("cw", "cc", "ce", "cs", "cn", "csw", "cse", "cnw", "cne")}


def _schur_scan9(H: Stencil9, collect: bool):
    """Layer-Schur recursion with TRIDIAGONAL couplings,
    S_l = D_l - L_l T_{l-1} U_{l-1}, shared by the corner-inverse and
    full-stack variants (one scan body — code-review round 4)."""
    T0 = batched_inverse(
        _dense_tridiag(H.cw[..., 0, :], H.cc[..., 0, :], H.ce[..., 0, :]))

    def step(T_prev, inputs):
        (cw_l, cc_l, ce_l, csw_l, cs_l, cse_l,
         cnw_p, cn_p, cne_p) = inputs
        W = _tridiag_lmatmul(csw_l, cs_l, cse_l, T_prev)   # L_l @ T
        W = _tridiag_rmatmul(W, cnw_p, cn_p, cne_p)        # .. @ U_{l-1}
        T = batched_inverse(_dense_tridiag(cw_l, cc_l, ce_l) - W)
        return T, (T if collect else None)

    mv = lambda f, sl: jnp.moveaxis(f[..., sl, :], -2, 0)
    xs = (mv(H.cw, slice(1, None)), mv(H.cc, slice(1, None)),
          mv(H.ce, slice(1, None)),
          mv(H.csw, slice(1, None)), mv(H.cs, slice(1, None)),
          mv(H.cse, slice(1, None)),
          mv(H.cnw, slice(None, -1)), mv(H.cn, slice(None, -1)),
          mv(H.cne, slice(None, -1)))
    T_last, T_rest = jax.lax.scan(step, T0, xs)
    return T0, T_last, T_rest


def _schur_corner_inverse9(H: Stencil9):
    """T_{L-1} = S_{L-1}^{-1} for a batched 9-point subgrid family (fields
    (..., L, n)); one dense (batch, n, n) carry."""
    _, T_last, _ = _schur_scan9(H, collect=False)
    return T_last


def _schur_t_stack9(H: Stencil9):
    """All layer Schur-complement inverses T_l (the H_F block-Thomas stack
    for the 9-point scheme): (..., L, n, n)."""
    T0, _, T_rest = _schur_scan9(H, collect=True)
    T_rest = jnp.moveaxis(T_rest, 0, -3)
    return jnp.concatenate([T0[..., None, :, :], T_rest], axis=-3)


def _block_thomas_solve9(T, L9, U9, rhs):
    """Solve the 9-point block-tridiagonal system given its Schur-inverse
    stack T and per-layer coupling triples L9/U9 = (sub, diag, sup) each
    (L, n); rhs (L, n).  Same scheme as the 5-point
    `_block_thomas_solve` with tridiagonal matvecs in place of the
    diagonal scalings.

    T may be a complex (L, n, n) array OR a split-real CArray (possibly
    reduced-precision storage, e.g. bf16): the pair form is sliced
    per scan step and upcast (L, n, n)-block-wise, so the whole complex
    stack is never materialized — at the production 9-point widths TF is
    multi-GB (4.9 GB f32 at n=2047/b=147) and the one-shot `.cplx`
    conversion was the compile-OOM term of the capacity solve."""
    hi = jax.lax.Precision.HIGHEST
    Lsub, Ldia, Lsup = L9
    Usub, Udia, Usup = U9
    pair = isinstance(T, CArray)
    if pair:
        wdt = jnp.promote_types(T.re.dtype, rhs.real.dtype)

        def mat(T_parts, v):
            tr, ti = T_parts
            Tc = jax.lax.complex(tr.astype(wdt), ti.astype(wdt))
            return jnp.matmul(Tc, v, precision=hi)

        fwd_T = bwd_T = (T.re[:-1], T.im[:-1])
        last_T = (T.re[-1], T.im[-1])
    else:
        def mat(T_parts, v):
            return jnp.matmul(T_parts[0], v, precision=hi)

        fwd_T = bwd_T = (T[:-1],)
        last_T = (T[-1],)

    def fwd(y_prev, inputs):
        *T_parts, lsub, ldia, lsup, r_l = inputs
        y = r_l - _tridiag_matvec(lsub, ldia, lsup, mat(T_parts, y_prev))
        return y, y

    _, y_rest = jax.lax.scan(
        fwd, rhs[0], (*fwd_T, Lsub[1:], Ldia[1:], Lsup[1:], rhs[1:]))
    y = jnp.concatenate([rhs[:1], y_rest], axis=0)

    u_last = mat(last_T, y[-1])

    def bwd(u_next, inputs):
        *T_parts, usub, udia, usup, y_l = inputs
        u = mat(T_parts, y_l - _tridiag_matvec(usub, udia, usup, u_next))
        return u, u

    _, u_rest = jax.lax.scan(
        bwd, u_last, (*bwd_T, Usub[:-1], Udia[:-1], Usup[:-1], y[:-1]),
        reverse=True)
    return jnp.concatenate([u_rest, u_last[None]], axis=0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["G", "TF", "hf_l", "hf_u", "a_l", "a_u", "g_w", "g_lo"],
    meta_fields=["b", "d2_replace", "g_stride"],
)
@dataclasses.dataclass(frozen=True)
class SweepingPreconditioner9:
    """Factored 9-point moving-PML sweeping state (split-real storage).

    G    : (M, n_pad, n_pad) corner inverses, exactly like the 5-point
           state (same storage, same lane padding).
    TF   : (b, n, n) block-Thomas stack for H_F9.
    hf_l / hf_u : H_F lower/upper coupling triples, stacked (b, 3, n) as
           [sub, diag, sup].
    a_l / a_u   : the global operator's coupling triples, (L, 3, n).
    """

    G: CArray
    TF: CArray
    hf_l: CArray
    hf_u: CArray
    a_l: CArray
    a_u: CArray
    b: int
    d2_replace: bool
    # sample-compressed G (g_compress=True at setup — identical contract
    # to the 5-point SweepingPreconditioner): G holds every g_stride-th
    # corner inverse; logical step k applies
    # g_w[k,0] * G[g_lo[k]] + g_w[k,1] * G[g_lo[k]+1].  g_stride = 0 ->
    # dense.  The Pallas kernel composes the lerp with the tridiagonal
    # coupling mode (ops.pallas.sweep takes g_lo/g_w alongside triple c).
    g_w: jax.Array | None = None      # (M, 2) f32 bracketing weights
    g_lo: jax.Array | None = None     # (M,) int32 lo sample index <= Ms-2
    g_stride: int = 0

    @property
    def grid_shape(self):
        return (self.a_l.shape[0], self.a_l.shape[-1])

    def __call__(self, x: jax.Array) -> jax.Array:
        L, n = self.grid_shape
        return apply_preconditioner9(self, x.reshape(L, n)).reshape(-1)


def _coupling_triples(A: Stencil9):
    """(L, 3, n) stacked [sub, diag, sup] lower/upper coupling triples of
    the batched Stencil9 (lower = (csw, cs, cse), upper = (cnw, cn, cne))."""
    lo = jnp.stack([A.csw, A.cs, A.cse], axis=-2)
    up = jnp.stack([A.cnw, A.cn, A.cne], axis=-2)
    return lo, up


def factor_samples9_assembling(n, b, const, eta, omega, h, c_full, *,
                               gamma, pos, n_pad, g_dtype,
                               setup_chunk: int = 128,
                               fidelity: str = "corrected",
                               complex_dtype=None) -> CArray:
    """Chunked ASSEMBLE-THEN-FACTOR of the sampled 9-point subgrid family:
    each fori_loop chunk assembles its own subgrids
    (fd.stencil.build_hm_stencils9 with traced rows) and immediately
    factors them into the sample-panel stack — the full nine-field
    (Ms, b, n) family is never materialized.

    Why this exists: at the production 9-point widths (b ~ n/14) even the
    SAMPLED family is multi-GB (5.2 GB at n=2047/b=147 — found by the
    round-5 flagship OOM: family + G + workspace + H_F Thomas stack
    exceed one chip's HBM).  Assembly is cheap relative to the chunk's
    Schur recursion (O(chunk b n) vs O(chunk b n^3)), so fusing it into
    the loop trades nothing measurable for a ~Ms/chunk-fold smaller
    assembly footprint."""
    from ..fd import stencil as fd_stencil

    from .sweeping import setup_workspace_words

    cd = complex_dtype or c_full.dtype
    Ms = int(pos.shape[0])
    chunk = max(4, min(setup_chunk, setup_workspace_words() // (n * n)))
    chunk = min(chunk, Ms)
    n_chunks = -(-Ms // chunk)
    pos_arr = jnp.asarray(pos)
    wf = jnp.finfo(jnp.result_type(cd, jnp.float32)).dtype

    def pad_g(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, n_pad - n))) \
            .astype(g_dtype)

    def body(i, bufs):
        G_re, G_im = bufs
        start = jnp.minimum(i * chunk, Ms - chunk)
        rows = b + jax.lax.dynamic_slice_in_dim(pos_arr, start, chunk, 0)
        hm_c = fd_stencil.build_hm_stencils9(
            n, b, const, eta, omega, h, c_full, gamma=gamma,
            fidelity=fidelity, complex_dtype=cd, rows=rows)
        Tc = _schur_corner_inverse9(hm_c)
        G_re = jax.lax.dynamic_update_slice_in_dim(
            G_re, pad_g(Tc.real), start, 0)
        G_im = jax.lax.dynamic_update_slice_in_dim(
            G_im, pad_g(Tc.imag), start, 0)
        return (G_re, G_im)

    G_re, G_im = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.zeros((Ms, n_pad, n_pad), g_dtype),
         jnp.zeros((Ms, n_pad, n_pad), g_dtype)))
    return CArray(G_re, G_im)


def preconditioner_from_samples9(A: Stencil9, b: int, G_samples: CArray, *,
                                 g_stride: int,
                                 d2_replace: bool = True
                                 ) -> SweepingPreconditioner9:
    """Build the 9-point sweeping preconditioner from an ALREADY-FACTORED
    stride-compressed sample stack (e.g. the omega-lerp of two anchor
    frequencies' stacks — driver.run_multisolve freq_anchor_every) plus
    the 9-point operator at the target frequency: only H_F9 is factored
    here.  The omega-lerp is stencil-agnostic — G is still a stack of
    dense corner inverses, as smooth in omega as in m — so this is the
    exact 9-point mirror of `sweeping.preconditioner_from_samples`."""
    from .sweeping import compress_tables

    M = A.cc.shape[0] - b
    g_w, g_lo = compress_tables(M, g_stride)
    HF = fd_stencil.extract_hf_stencil9(A, b)
    TF = _schur_t_stack9(HF)
    hf_lo, hf_up = _coupling_triples(HF)
    a_lo, a_up = _coupling_triples(A)
    gdt = (G_samples.re.dtype if isinstance(G_samples, CArray)
           else G_samples.real.dtype)
    TF_pair = CArray(TF.real.astype(gdt), TF.imag.astype(gdt))
    as_pair = lambda z: z if isinstance(z, CArray) else CArray.of(z)
    return SweepingPreconditioner9(
        G=as_pair(G_samples), TF=TF_pair,
        hf_l=CArray.of(hf_lo), hf_u=CArray.of(hf_up),
        a_l=CArray.of(a_lo), a_u=CArray.of(a_up),
        b=b, d2_replace=d2_replace, g_w=g_w, g_lo=g_lo, g_stride=g_stride)


def setup_preconditioner9(A: Stencil9, hm: Stencil9, b: int, *,
                          d2_replace: bool = True,
                          setup_chunk: int = 128,
                          pad_lanes: bool | None = None,
                          g_dtype=None,
                          factor_stride: int = 1,
                          hm_sampled: bool = False,
                          g_compress: bool = False
                          ) -> SweepingPreconditioner9:
    """Factor the 9-point moving-PML preconditioner: H_F9 block-Thomas +
    the batched corner inverses of the 9-point subgrid family — the
    5-point `setup_preconditioner` with the tridiagonal-coupling Schur
    recursion plugged into the shared chunk/stride machinery.

    `hm_sampled=True` declares that `hm` holds ONLY the subgrids at
    `sample_positions(M, factor_stride)` (assembled via
    build_hm_stencils9's `rows` — the memory-lean path: the FULL 9-field
    family at production b does not fit HBM); the samples are factored
    and lerp-expanded to the dense stack.

    `g_compress=True` (requires factor_stride > 1) stores ONLY the
    sampled corner inverses plus per-step lerp tables instead of
    expanding to the dense stack — the same capacity contract as the
    5-point `setup_preconditioner(g_compress=True)` (at-rest factor
    memory drops ~stride-fold; values identical to the expanded stack,
    so iteration counts match it exactly).  Especially consequential
    here: the 9-point scheme needs b ~ n/14 (module docstring), so its
    dense G stack grows faster with n than the 5-point path's."""
    from .sweeping import compress_tables, expand_strided_samples, \
        sample_positions

    _, _, n = hm.cc.shape
    M = A.cc.shape[0] - b
    if pad_lanes is None:
        pad_lanes = jax.default_backend() == "tpu"
    n_pad = (-(-n // 128) * 128) if pad_lanes else n
    g_dtype = g_dtype or hm.cc.real.dtype
    g_w = g_lo = None
    g_stride = 0
    if g_compress and (factor_stride <= 1 or M <= factor_stride):
        raise ValueError("g_compress requires factor_stride > 1 (and "
                         "M > stride): the compressed layout stores the "
                         "strided samples")
    if hm_sampled:
        if factor_stride <= 1:
            raise ValueError("hm_sampled requires factor_stride > 1")
        sample_dt = g_dtype if g_compress else hm.cc.real.dtype
        Ts = factor_corner_inverses(hm, n_pad=n_pad, g_dtype=sample_dt,
                                    setup_chunk=setup_chunk,
                                    corner_fn=_schur_corner_inverse9)
        if g_compress:
            G = Ts
            g_w, g_lo = compress_tables(M, factor_stride)
            g_stride = factor_stride
        else:
            G = expand_strided_samples(Ts, M=M, stride=factor_stride,
                                       g_dtype=g_dtype,
                                       setup_chunk=setup_chunk)
    elif g_compress:
        pos = sample_positions(M, factor_stride)
        hm_s = jax.tree.map(lambda f: f[jnp.asarray(pos)], hm)
        G = factor_corner_inverses(hm_s, n_pad=n_pad, g_dtype=g_dtype,
                                   setup_chunk=setup_chunk,
                                   corner_fn=_schur_corner_inverse9)
        g_w, g_lo = compress_tables(M, factor_stride)
        g_stride = factor_stride
    else:
        G = factor_corner_inverses(hm, n_pad=n_pad, g_dtype=g_dtype,
                                   setup_chunk=setup_chunk,
                                   stride=factor_stride,
                                   corner_fn=_schur_corner_inverse9)
    HF = fd_stencil.extract_hf_stencil9(A, b)
    TF = _schur_t_stack9(HF)
    hf_lo, hf_up = _coupling_triples(HF)
    a_lo, a_up = _coupling_triples(A)

    # TF stored at the G dtype (bf16 halves the 9-point F-band stack —
    # 4.9 GB f32 at n=2047/b=147; _block_thomas_solve9 upcasts per step)
    TF_pair = CArray(TF.real.astype(g_dtype), TF.imag.astype(g_dtype))
    as_pair = lambda z: z if isinstance(z, CArray) else CArray.of(z)
    return SweepingPreconditioner9(
        G=as_pair(G), TF=TF_pair,
        hf_l=CArray.of(hf_lo), hf_u=CArray.of(hf_up),
        a_l=CArray.of(a_lo), a_u=CArray.of(a_up),
        b=b, d2_replace=d2_replace, g_w=g_w, g_lo=g_lo, g_stride=g_stride)


def apply_preconditioner9(P: SweepingPreconditioner9,
                          f: jax.Array, impl: str = "auto") -> jax.Array:
    """One 9-point sweep solve u ~= A9^{-1} f — Algorithm 2.4 with
    tridiagonal coupling applications; same fused two-pass structure (and
    the same corrected/as-shipped D2 switch) as the 5-point
    `apply_preconditioner`.

    `impl`: "pallas" runs the two sweeps as the Pallas recursion kernel
    (the kernel's tridiagonal-coupling mode — `c` triples applied with
    lane rolls), "xla" the lax.scan formulation, "auto" picks Pallas on
    TPU when the lane-padded layout allows (same dispatch rule as the
    5-point apply)."""
    b = P.b
    L, n = P.grid_shape
    TF = P.TF                        # split-real pair, upcast per Thomas step
    hf_l, hf_u = P.hf_l.cplx, P.hf_u.cplx
    a_l, a_u = P.a_l.cplx, P.a_u.cplx
    Gre, Gim = P.G.re, P.G.im
    n_pad = Gre.shape[-1]
    if impl == "auto":
        impl = ("pallas" if (jax.default_backend() == "tpu"
                             and n_pad % 128 == 0) else "xla")
    M_total = L - b
    u = f

    trip = lambda t: (t[..., 0, :], t[..., 1, :], t[..., 2, :])

    def g_matvec(gre, gim, v):
        V = jnp.stack([jnp.real(v), jnp.imag(v)], axis=-1)
        if n_pad > n:
            V = jnp.pad(V, ((0, n_pad - n), (0, 0)))
        RV = _g_dot(gre, V)
        IV = _g_dot(gim, V)
        return jax.lax.complex(RV[:n, 0] - IV[:n, 1], RV[:n, 1] + IV[:n, 0])

    thomas = lambda r: _block_thomas_solve9(TF, trip(hf_l), trip(hf_u), r)

    # H_F solve + first correction: u_b -= L_b @ (T_F u_F)[b-1]
    TFuF = thomas(u[:b])
    u = u.at[b].add(-_tridiag_matvec(*trip(a_l[b]), TFuF[b - 1]))

    # top-row upper coupling zeroed (no layer above)
    a_u_top0 = jnp.concatenate([a_u[b:-1], jnp.zeros_like(a_u[-1:])], axis=0)

    if impl == "pallas":
        from ..ops.pallas.sweep import pallas_sweep

        interp = jax.default_backend() == "cpu"
        rows_tri = lambda z, sl: CArray(z.re[sl], z.im[sl])   # (S, 3, n)
        ck = dict(interpret=interp, g_lo=P.g_lo, g_w=P.g_w)
        if M_total > 1:
            u_fwd = pallas_sweep(
                P.G, CArray.of(u[b + 1:]),
                rows_tri(P.a_l, slice(b + 1, None)),
                CArray.of(u[b]), mode="fwd", **ck)
            u = jnp.concatenate([u[:b + 1], u_fwd.cplx], axis=0)
        u_bwd = pallas_sweep(
            P.G, CArray.of(u[b:]), CArray.of(a_u_top0),
            CArray.of(jnp.zeros_like(u[-1])),
            mode=("bwd" if P.d2_replace else "bwd_sub"), **ck)
        u = jnp.concatenate([u[:b], u_bwd.cplx], axis=0)
    else:
        ks = jnp.arange(M_total - 1)

        def g_row(k):
            if P.g_stride:
                # sample-compressed G: f32 weights / accumulation exactly
                # like the 5-point XLA fallback (precond.sweeping g_row)
                wdt = jnp.promote_types(Gre.dtype, jnp.float32)
                lo = P.g_lo[k]
                w0 = P.g_w[k, 0].astype(wdt)
                w1 = P.g_w[k, 1].astype(wdt)
                pick = lambda g, i: jax.lax.dynamic_index_in_dim(
                    g, i, 0, keepdims=False).astype(wdt)
                return (w0 * pick(Gre, lo) + w1 * pick(Gre, lo + 1),
                        w0 * pick(Gim, lo) + w1 * pick(Gim, lo + 1))
            return (jax.lax.dynamic_index_in_dim(Gre, k, 0,
                                                 keepdims=False),
                    jax.lax.dynamic_index_in_dim(Gim, k, 0,
                                                 keepdims=False))

        # forward sweep j = b+1..L-1: u_j -= L_j @ (G_{j-1} u_{j-1})
        def fwd(prev, inputs):
            l_j, u_j, k = inputs
            gre, gim = g_row(k)
            new = u_j - _tridiag_matvec(*trip(l_j),
                                        g_matvec(gre, gim, prev))
            return new, new

        _, u_fwd = jax.lax.scan(fwd, u[b], (a_l[b + 1:], u[b + 1:], ks))
        u = jnp.concatenate([u[:b + 1], u_fwd], axis=0)

        # fused diagonal + backward sweep (reverse scan):
        #   corrected:  u_j = G_j (u_j - U_j u_{j+1})
        #   as-shipped: u_j = u_j - G_j (u_j + U_j u_{j+1})
        def bwd(nxt, inputs):
            u_j, uj_trip, k = inputs
            gre, gim = g_row(k)
            coup = _tridiag_matvec(*trip(uj_trip), nxt)
            if P.d2_replace:
                new = g_matvec(gre, gim, u_j - coup)
            else:
                new = u_j - g_matvec(gre, gim, u_j + coup)
            return new, new

        ks_all = jnp.arange(M_total)
        _, u_bwd = jax.lax.scan(
            bwd, jnp.zeros_like(u[-1]), (u[b:], a_u_top0, ks_all),
            reverse=True)
        u = jnp.concatenate([u[:b], u_bwd], axis=0)

    # F-block closure (shared by both impls):
    # u_F = T_F u_F - T_F (U_{b-1}-coupling of u_b)
    rhs = jnp.zeros_like(TFuF).at[b - 1].set(
        _tridiag_matvec(*trip(a_u[b - 1]), u[b]))
    uF = TFuF - thomas(rhs)
    return jnp.concatenate([uF, u[b:]], axis=0)


def apply_preconditioner9_multi(P: SweepingPreconditioner9, F: jax.Array,
                                impl: str = "auto") -> jax.Array:
    """Batched-RHS 9-point apply: F of shape (B, L, n) -> (B, L, n).

    On TPU the whole batch rides ONE stream of the G stack through the
    Pallas kernel's batched rows (exactly like the 5-point
    `apply_preconditioner_multi`); elsewhere it vmaps the single-RHS
    apply."""
    b = P.b
    L, n = P.grid_shape
    n_pad = P.G.re.shape[-1]
    if impl == "auto":
        impl = ("pallas" if (jax.default_backend() == "tpu"
                             and n_pad % 128 == 0) else "xla")
    if impl != "pallas":
        return jax.vmap(lambda f: apply_preconditioner9(P, f, impl))(F)

    from ..ops.pallas.sweep import pallas_sweep

    interp = jax.default_backend() == "cpu"
    TF = P.TF                        # split-real pair, upcast per Thomas step
    hf_l, hf_u = P.hf_l.cplx, P.hf_u.cplx
    a_l, a_u = P.a_l.cplx, P.a_u.cplx
    trip = lambda t: (t[..., 0, :], t[..., 1, :], t[..., 2, :])
    thomas = jax.vmap(lambda r: _block_thomas_solve9(
        TF, trip(hf_l), trip(hf_u), r))
    rows_tri = lambda z, sl: CArray(z.re[sl], z.im[sl])
    to_sbn = lambda x: CArray.of(jnp.swapaxes(x, 0, 1))   # (B,S,n)->(S,B,n)

    u = F
    TFuF = thomas(u[:, :b])                               # (B, b, n)
    u = u.at[:, b].add(-jax.vmap(
        lambda v: _tridiag_matvec(*trip(a_l[b]), v))(TFuF[:, b - 1]))

    M_total = L - b
    a_u_top0 = jnp.concatenate([a_u[b:-1], jnp.zeros_like(a_u[-1:])],
                               axis=0)
    ck = dict(interpret=interp, g_lo=P.g_lo, g_w=P.g_w)
    if M_total > 1:
        u_fwd = pallas_sweep(
            P.G, to_sbn(u[:, b + 1:]), rows_tri(P.a_l, slice(b + 1, None)),
            CArray.of(u[:, b]), mode="fwd", **ck)
        u = jnp.concatenate(
            [u[:, :b + 1], jnp.swapaxes(u_fwd.cplx, 0, 1)], axis=1)
    u_bwd = pallas_sweep(
        P.G, to_sbn(u[:, b:]), CArray.of(a_u_top0),
        CArray.of(jnp.zeros_like(u[:, -1])),
        mode=("bwd" if P.d2_replace else "bwd_sub"), **ck)
    u = jnp.concatenate([u[:, :b], jnp.swapaxes(u_bwd.cplx, 0, 1)], axis=1)

    rhs = jnp.zeros_like(TFuF).at[:, b - 1].set(jax.vmap(
        lambda v: _tridiag_matvec(*trip(a_u[b - 1]), v))(u[:, b]))
    uF = TFuF - thomas(rhs)
    return jnp.concatenate([uF, u[:, b:]], axis=1)


def batchable_operator9(P: SweepingPreconditioner9):
    """Flat-vector callable whose vmap rule dispatches to
    `apply_preconditioner9_multi` — the 9-point mirror of
    `sweeping.batchable_operator`, for vmap-built batched solvers."""
    L, n = P.grid_shape
    p_leaves, p_tree = jax.tree.flatten(P)

    @jax.custom_batching.custom_vmap
    def M_impl(x, *leaves):
        return jax.tree.unflatten(p_tree, leaves)(x)

    @M_impl.def_vmap
    def _rule(axis_size, in_batched, xs, *leaves):
        P_ = jax.tree.unflatten(p_tree, leaves)
        out = apply_preconditioner9_multi(P_, xs.reshape(axis_size, L, n))
        return out.reshape(axis_size, L * n), True

    return lambda x: M_impl(x, *p_leaves)
