"""Distributed sweeping-preconditioner application (staged pipeline).

The sweep recursion u_j <- u_j - cs_j * (G_{j-1} u_{j-1}) is inherently
sequential in j (SURVEY.md section 7.3 item 2) — the TPU formulation stages
it across the layer-partitioned mesh like a pipeline schedule: stage s
belongs to device s, and the inter-device carry (the propagated boundary
row) moves with one `lax.ppermute` per stage.  Wall-clock equals the serial
sweep length, as the recursion demands; batched RHS fills the idle stages
(SURVEY.md section 2.3 'batched RHS parallelism').

TPU-grade since round 2 (VERDICT round 1 item 2):

  * every per-stage local sweep is gated by `lax.cond(d == s, ...)`, so an
    inactive device runs an O(1) pass-through instead of re-scanning its
    full G shard — per-apply G traffic is ~2 passes over the local shard
    total (one fwd + one bwd), not 2 * n_devices;
  * on TPU the active device's local sweep runs the Pallas recursion kernel
    (ops.pallas.sweep) — same kernel as the single-chip apply — instead of
    the ~2x-slower XLA `lax.scan`;
  * a batch of right-hand sides rides the SAME staged schedule and the same
    G stream (the kernel widens its per-panel contraction), giving the
    distributed analog of `apply_preconditioner_multi`.

The carry passed between devices for the forward sweep is t_j = G_j @ u_j
(the propagated row, already multiplied), not u_j itself, so each device
only ever needs its own G blocks (row-aligned shards, `dist.partition`).

Why no GPipe-style wavefront over RHS microbatches: the sweep is
G-bandwidth-bound and a whole RHS batch shares one G stream (the per-panel
contraction just widens), so the staged schedule's wall-clock is already
the serial lower bound — one full pass of G per sweep direction,
n_dev * T_local_pass(B) with T_local_pass nearly independent of B.
Splitting the batch into microbatches to overlap stages would run
(n_dev + n_micro) stages of the SAME bandwidth cost each, i.e. strictly
more G traffic epochs.  Wavefronting only pays in a compute-bound regime
(very large B), which this workload does not reach before HBM capacity
does.

No masking is needed in the Pallas path: G_pad rows for the F band
(j < b) are zero and the initial forward carry is zero, so the recursion
leaves F rows untouched through the forward sweep, and the backward sweep's
garbage F outputs are overwritten by the F-block closure.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.complexlib import CArray
from ..precond.sweeping import _block_thomas_solve
from .partition import DistSweepState, DistSweepState9


def _g_matvec(gre, gim, v):
    # v: (B, n) batch of rows.  (n, 2B) RHS: one read of gre and one of gim;
    # precision handling (f32 HIGHEST vs bf16-stored native) follows
    # precond.sweeping._g_dot.  G may be lane-padded to (n_pad, n_pad).
    from ..precond.sweeping import _g_dot

    B, n = v.shape
    V = jnp.concatenate([jnp.real(v).T, jnp.imag(v).T], axis=1)  # (n, 2B)
    if gre.shape[-1] > n:
        V = jnp.pad(V, ((0, gre.shape[-1] - n), (0, 0)))
    RV = _g_dot(gre, V)
    IV = _g_dot(gim, V)
    return jax.lax.complex(RV[:n, :B] - IV[:n, B:],
                           RV[:n, B:] + IV[:n, :B]).T


def _trimv_rows(trip, V):
    """Batched tridiagonal coupling application: trip = (3, n) stacked
    [sub, diag, sup] per-row triple, V = (B, n) batch of carry rows ->
    (B, n).  The distributed 9-point mirror of
    precond.sweeping9._tridiag_matvec (edge coefficients are
    assembly-masked zero)."""
    sub, dia, sup = trip[0], trip[1], trip[2]
    Y = dia[None, :] * V
    Y = Y.at[:, 1:].add(sub[None, 1:] * V[:, :-1])
    Y = Y.at[:, :-1].add(sup[None, :-1] * V[:, 1:])
    return Y


def dist_apply_preconditioner9(S: DistSweepState9, f_local: jax.Array, *,
                               axis_name: str, n_devices: int,
                               n_rows_global: int,
                               impl: str = "auto") -> jax.Array:
    """u_local ~= (A9^{-1} f)_local inside shard_map — the staged 9-point
    sweep: `dist_apply_preconditioner` with tridiagonal inter-layer
    coupling applications (triples applied with shifted adds; the Pallas
    local sweeps use the kernel's lane-roll tridiagonal mode via the
    (S, 3, n) coupling rank).  Same carry protocol (the pre-multiplied
    boundary row t_j = G_j u_j moves with one ppermute per stage), same
    compressed-G contract."""
    squeeze = f_local.ndim == 2
    u = f_local[None] if squeeze else f_local              # (B, n_loc, n)
    B, n_loc, n = u.shape
    b = S.b
    L = n_rows_global
    d = jax.lax.axis_index(axis_name)
    jrows = d * n_loc + jnp.arange(n_loc)                  # global rows

    TF = S.TF                       # split-real pair, upcast per Thomas step
    hf_l, hf_u = S.hf_l.cplx, S.hf_u.cplx
    a_l, a_u = S.a_l.cplx, S.a_u.cplx                      # (n_loc, 3, n)
    Gre, Gim = S.G_pad.re, S.G_pad.im
    n_pad = Gre.shape[-1]
    compressed = S.g_stride > 0
    if impl == "auto":
        impl = ("pallas" if (jax.default_backend() == "tpu"
                             and n_pad % 128 == 0) else "xla")

    wdt = jnp.promote_types(Gre.dtype, jnp.float32)

    def g_panel(k):
        pick = lambda g, i: jax.lax.dynamic_index_in_dim(
            g, i, 0, keepdims=False)
        if compressed:
            lo = S.g_lo[k]
            w0 = S.g_w[k, 0].astype(wdt)
            w1 = S.g_w[k, 1].astype(wdt)
            pickw = lambda g, i: pick(g, i).astype(wdt)
            return (w0 * pickw(Gre, lo) + w1 * pickw(Gre, lo + 1),
                    w0 * pickw(Gim, lo) + w1 * pickw(Gim, lo + 1))
        return pick(Gre, k), pick(Gim, k)

    up_perm = [(i, i + 1) for i in range(n_devices - 1)]
    down_perm = [(i, i - 1) for i in range(1, n_devices)]
    from ..precond.sweeping9 import _block_thomas_solve9
    trip = lambda t: (t[..., 0, :], t[..., 1, :], t[..., 2, :])
    thomas = jax.vmap(
        lambda r: _block_thomas_solve9(TF, trip(hf_l), trip(hf_u), r))

    # --- H_F9 solve + row-b correction (device 0; b < n_loc) -------------
    TFuF = thomas(u[:, :b])                                # (B, b, n)
    TFuF = jnp.where(d == 0, TFuF, jnp.zeros_like(TFuF))
    row_b = (jrows == b)[None, :, None]
    # L_b @ TFuF[b-1] applied through every local row's triple, masked to
    # the one row that is globally row b (device 0 only)
    corr = jax.vmap(lambda t_: _trimv_rows(t_, TFuF[:, b - 1]),
                    in_axes=0, out_axes=1)(a_l)            # (B, n_loc, n)
    u = u - jnp.where(row_b, corr, 0)

    def pallas_local(u_loc, c_rows, carry0, mode):
        """One device-local 9-point sweep through the Pallas kernel
        (c_rows: (S, 3, n) coupling triples -> the kernel's tridiagonal
        lane-roll mode)."""
        from ..ops.pallas.sweep import pallas_sweep
        interp = jax.default_backend() == "cpu"
        to_sbn = lambda x: CArray.of(jnp.swapaxes(x, 0, 1))
        ck = (dict(g_lo=S.g_lo, g_w=S.g_w) if compressed else {})
        out = pallas_sweep(CArray(Gre, Gim), to_sbn(u_loc),
                           CArray.of(c_rows), CArray.of(carry0),
                           mode=mode, interpret=interp, **ck)
        return jnp.swapaxes(out.cplx, 0, 1)

    # --- forward sweep (staged) ------------------------------------------
    def local_fwd_xla(t0, u_loc):
        def step(t, inp):
            u_j, l_j, jg, k = inp
            u_new = jnp.where(jg >= b + 1, u_j - _trimv_rows(l_j, t), u_j)
            gre, gim = g_panel(k)
            t_new = _g_matvec(gre, gim, u_new)
            t_new = jnp.where(jg >= b, t_new, t)
            return t_new, u_new
        t_last, u_out = jax.lax.scan(
            step, t0, (jnp.swapaxes(u_loc, 0, 1), a_l, jrows,
                       jnp.arange(n_loc)))
        return jnp.swapaxes(u_out, 0, 1), t_last

    def local_fwd_pallas(t0, u_loc):
        u0 = u_loc[:, 0] - _trimv_rows(a_l[0], t0)
        if n_loc > 1:
            u_rest = pallas_local(u_loc[:, 1:], a_l[1:], u0, "fwd")
            u_out = jnp.concatenate([u0[:, None], u_rest], axis=1)
        else:
            u_out = u0[:, None]
        gre_l, gim_l = g_panel(n_loc - 1)
        t_last = _g_matvec(gre_l, gim_l, u_out[:, -1])
        return u_out, t_last

    local_fwd = local_fwd_pallas if impl == "pallas" else local_fwd_xla

    t = jax.lax.pcast(jnp.zeros((B, n), u.dtype), (axis_name,),
                      to='varying')
    for s in range(n_devices):
        u, t_last = jax.lax.cond(
            d == s, lambda tu: local_fwd(tu[0], tu[1]),
            lambda tu: (tu[1], tu[0]), (t, u))
        if s + 1 < n_devices:
            t = jax.lax.ppermute(t_last, axis_name, up_perm)

    # --- fused diagonal + backward sweep (staged, reverse) ---------------
    def local_bwd_xla(un0, u_loc):
        def step(un, inp):
            u_j, up_j, jg, k = inp
            up_eff = jnp.where(jg <= L - 2, up_j, jnp.zeros_like(up_j))
            gre, gim = g_panel(k)
            if S.d2_replace:
                cand = _g_matvec(gre, gim, u_j - _trimv_rows(up_eff, un))
            else:
                cand = u_j - _g_matvec(gre, gim,
                                       u_j + _trimv_rows(up_eff, un))
            u_new = jnp.where(jg >= b, cand, u_j)
            return u_new, u_new
        u_first, u_out = jax.lax.scan(
            step, un0, (jnp.swapaxes(u_loc, 0, 1), a_u, jrows,
                        jnp.arange(n_loc)),
            reverse=True)
        return jnp.swapaxes(u_out, 0, 1), u_first

    def local_bwd_pallas(un0, u_loc):
        mode = "bwd" if S.d2_replace else "bwd_sub"
        # top-row upper triple is already assembly-masked zero at
        # j = L-1 (build_a_stencil9_rows), matching the kernel contract
        u_out = pallas_local(u_loc, a_u, un0, mode)
        u_out = jnp.where((jrows >= b)[None, :, None], u_out, u_loc)
        return u_out, u_out[:, 0]

    local_bwd = local_bwd_pallas if impl == "pallas" else local_bwd_xla

    un = jax.lax.pcast(jnp.zeros((B, n), u.dtype), (axis_name,),
                       to='varying')
    for s in reversed(range(n_devices)):
        u, u_first = jax.lax.cond(
            d == s, lambda tu: local_bwd(tu[0], tu[1]),
            lambda tu: (tu[1], tu[0]), (un, u))
        if s > 0:
            un = jax.lax.ppermute(u_first, axis_name, down_perm)

    # --- F-block closure (device 0) --------------------------------------
    u_row_b = jnp.sum(jnp.where((jrows == b)[None, :, None], u, 0), axis=1)
    # the F->(b+1) coupling is the global operator's upper TRIPLE at row
    # b-1 (the 9-point U_{b-1}), summed out of the local shard
    up_bm1 = jnp.sum(
        jnp.where((jrows == b - 1)[:, None, None], a_u, 0), axis=0)
    rhs = jnp.zeros_like(TFuF).at[:, b - 1].set(
        _trimv_rows(up_bm1, u_row_b))
    uF = TFuF - thomas(rhs)
    f_rows = (jrows < b)[None, :, None]
    uF_padded = (jnp.concatenate(
        [uF, jnp.zeros((B, n_loc - b, n), u.dtype)], axis=1)
        if n_loc > b else uF)
    u = jnp.where(f_rows & (d == 0), uF_padded, u)
    return u[0] if squeeze else u


def dist_apply_preconditioner(S: DistSweepState, f_local: jax.Array, *,
                              axis_name: str, n_devices: int,
                              n_rows_global: int,
                              impl: str = "auto") -> jax.Array:
    """u_local ~= (A^{-1} f)_local inside shard_map (rows sharded on axis 0).

    f_local: (n_loc, n) or batched (B, n_loc, n) — the batch shares the
    staged schedule and the G stream.  Requires b < n_loc (the F band and
    row b live on device 0).  `impl`: "pallas" routes each active local
    sweep through the Pallas recursion kernel (interpret mode on CPU),
    "xla" uses lax.scan, "auto" picks Pallas on TPU when G is lane-padded.
    """
    squeeze = f_local.ndim == 2
    u = f_local[None] if squeeze else f_local              # (B, n_loc, n)
    B, n_loc, n = u.shape
    b = S.b
    L = n_rows_global
    d = jax.lax.axis_index(axis_name)
    jrows = d * n_loc + jnp.arange(n_loc)                  # global rows

    TF = S.TF.cplx
    hf_cs, hf_cn = S.hf_cs.cplx, S.hf_cn.cplx
    a_cs, a_cn = S.a_cs.cplx, S.a_cn.cplx
    # dense: (n_loc, np, np) row-aligned; compressed (S.g_stride > 0):
    # (Ms_loc, np, np) SAMPLES with per-row local indices/weights
    Gre, Gim = S.G_pad.re, S.G_pad.im
    n_pad = Gre.shape[-1]
    compressed = S.g_stride > 0
    if impl == "auto":
        impl = ("pallas" if (jax.default_backend() == "tpu"
                             and n_pad % 128 == 0) else "xla")

    wdt = jnp.promote_types(Gre.dtype, jnp.float32)

    def g_panel(k):
        """Corner inverse applied at LOCAL row k (weighted samples when
        compressed — f32 weights, matching ops.pallas.sweep's lerp)."""
        pick = lambda g, i: jax.lax.dynamic_index_in_dim(
            g, i, 0, keepdims=False)
        if compressed:
            lo = S.g_lo[k]
            w0 = S.g_w[k, 0].astype(wdt)
            w1 = S.g_w[k, 1].astype(wdt)
            pickw = lambda g, i: pick(g, i).astype(wdt)
            return (w0 * pickw(Gre, lo) + w1 * pickw(Gre, lo + 1),
                    w0 * pickw(Gim, lo) + w1 * pickw(Gim, lo + 1))
        return pick(Gre, k), pick(Gim, k)

    up_perm = [(i, i + 1) for i in range(n_devices - 1)]
    down_perm = [(i, i - 1) for i in range(1, n_devices)]
    thomas = jax.vmap(lambda r: _block_thomas_solve(TF, hf_cs, hf_cn, r))

    # --- H_F solve + row-b correction (device 0; b < n_loc) ---------------
    TFuF = thomas(u[:, :b])                                # (B, b, n)
    TFuF = jnp.where(d == 0, TFuF, jnp.zeros_like(TFuF))
    row_b = (jrows == b)[None, :, None]
    u = u - jnp.where(row_b, (a_cs * TFuF[:, b - 1][:, None, :]), 0)

    def pallas_local(u_loc, c_rows, carry0, mode):
        """One device-local sweep through the Pallas kernel.

        u_loc: (B, S, n); c_rows: (S, n); carry0: (B, n).  Logical step
        alignment: the kernel's step m maps to local row m (fwd, which
        updates row m+1 with row m's panel) or local row S-1-m (bwd), so
        the per-row g_lo/g_w shards pass through unsliced — the kernel
        takes the leading S entries itself.
        """
        from ..ops.pallas.sweep import pallas_sweep
        interp = jax.default_backend() == "cpu"
        to_sbn = lambda x: CArray.of(jnp.swapaxes(x, 0, 1))
        ck = (dict(g_lo=S.g_lo, g_w=S.g_w) if compressed else {})
        out = pallas_sweep(CArray(Gre, Gim), to_sbn(u_loc),
                           CArray.of(c_rows), CArray.of(carry0),
                           mode=mode, interpret=interp, **ck)
        return jnp.swapaxes(out.cplx, 0, 1)

    # --- forward sweep (staged) ------------------------------------------
    # Active device: u_new[0] = u[0] - cs[0] * t_in (t_in is the incoming
    # pre-multiplied carry), then the kernel recursion over rows 1..n_loc-1,
    # then t_out = G[last] @ u_new[last].
    def local_fwd_xla(t0, u_loc):
        def step(t, inp):
            u_j, cs_j, jg, k = inp
            u_new = jnp.where(jg >= b + 1, u_j - cs_j[None, :] * t, u_j)
            gre, gim = g_panel(k)
            t_new = _g_matvec(gre, gim, u_new)
            t_new = jnp.where(jg >= b, t_new, t)
            return t_new, u_new
        t_last, u_out = jax.lax.scan(
            step, t0, (jnp.swapaxes(u_loc, 0, 1), a_cs, jrows,
                       jnp.arange(n_loc)))
        return jnp.swapaxes(u_out, 0, 1), t_last

    def local_fwd_pallas(t0, u_loc):
        u0 = u_loc[:, 0] - a_cs[0][None, :] * t0
        if n_loc > 1:
            u_rest = pallas_local(u_loc[:, 1:], a_cs[1:], u0, "fwd")
            u_out = jnp.concatenate([u0[:, None], u_rest], axis=1)
        else:
            u_out = u0[:, None]
        gre_l, gim_l = g_panel(n_loc - 1)
        t_last = _g_matvec(gre_l, gim_l, u_out[:, -1])
        return u_out, t_last

    local_fwd = local_fwd_pallas if impl == "pallas" else local_fwd_xla

    t = jax.lax.pcast(jnp.zeros((B, n), u.dtype), (axis_name,), to='varying')
    for s in range(n_devices):
        u, t_last = jax.lax.cond(
            d == s, lambda tu: local_fwd(tu[0], tu[1]),
            lambda tu: (tu[1], tu[0]), (t, u))
        if s + 1 < n_devices:
            t = jax.lax.ppermute(t_last, axis_name, up_perm)

    # --- fused diagonal + backward sweep (staged, reverse) ---------------
    # one pass over the local G shard per stage
    # (precond.sweeping.apply_preconditioner has the single-device analog):
    #   corrected:  u_j = G_j (u_j - cn_j * u_{j+1})   (cn zero at j=L-1
    #               from the assembly boundary mask)
    #   as-shipped: u_j = u_j - G_j (u_j + cn_j * u_{j+1})
    def local_bwd_xla(un0, u_loc):
        def step(un, inp):
            u_j, cn_j, jg, k = inp
            cn_eff = jnp.where(jg <= L - 2, cn_j, jnp.zeros_like(cn_j))
            gre, gim = g_panel(k)
            if S.d2_replace:
                cand = _g_matvec(gre, gim, u_j - cn_eff[None, :] * un)
            else:
                cand = u_j - _g_matvec(gre, gim, u_j + cn_eff[None, :] * un)
            u_new = jnp.where(jg >= b, cand, u_j)
            return u_new, u_new
        u_first, u_out = jax.lax.scan(
            step, un0, (jnp.swapaxes(u_loc, 0, 1), a_cn, jrows,
                        jnp.arange(n_loc)),
            reverse=True)
        return jnp.swapaxes(u_out, 0, 1), u_first

    def local_bwd_pallas(un0, u_loc):
        mode = "bwd" if S.d2_replace else "bwd_sub"
        u_out = pallas_local(u_loc, a_cn, un0, mode)
        # F-row outputs on device 0 are garbage (zero G blocks) but are
        # overwritten by the F closure below; keep the raw rows for safety
        # in the as-shipped mode where cand == u_j only if G is zero.
        u_out = jnp.where((jrows >= b)[None, :, None], u_out, u_loc)
        return u_out, u_out[:, 0]

    local_bwd = local_bwd_pallas if impl == "pallas" else local_bwd_xla

    un = jax.lax.pcast(jnp.zeros((B, n), u.dtype), (axis_name,), to='varying')
    for s in reversed(range(n_devices)):
        u, u_first = jax.lax.cond(
            d == s, lambda tu: local_bwd(tu[0], tu[1]),
            lambda tu: (tu[1], tu[0]), (un, u))
        if s > 0:
            un = jax.lax.ppermute(u_first, axis_name, down_perm)

    # --- F-block closure (device 0) --------------------------------------
    u_row_b = jnp.sum(jnp.where((jrows == b)[None, :, None], u, 0), axis=1)
    # the F->(b+1) coupling is the *global* operator's cn at row b-1
    # (code.py:381 uses A_{F,b+1}, not an H_F block) — locally on device 0
    cn_bm1 = jnp.sum(jnp.where((jrows == b - 1)[:, None], a_cn, 0), axis=0)
    rhs = jnp.zeros_like(TFuF).at[:, b - 1].set(cn_bm1[None, :] * u_row_b)
    uF = TFuF - thomas(rhs)
    f_rows = (jrows < b)[None, :, None]
    uF_padded = (jnp.concatenate(
        [uF, jnp.zeros((B, n_loc - b, n), u.dtype)], axis=1)
        if n_loc > b else uF)
    u = jnp.where(f_rows & (d == 0), uF_padded, u)
    return u[0] if squeeze else u
