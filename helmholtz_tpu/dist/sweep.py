"""Distributed sweeping-preconditioner application (staged pipeline).

The sweep recursion u_j <- u_j - cs_j * (G_{j-1} u_{j-1}) is inherently
sequential in j (SURVEY.md section 7.3 item 2) — the TPU formulation stages
it across the layer-partitioned mesh like a pipeline schedule: every device
runs its local `lax.scan` each stage (SPMD), but only the device whose turn
it is commits its rows; the inter-device carry (the propagated boundary row)
moves with one `lax.ppermute` per stage.  Wall-clock equals the serial sweep
length, as the recursion demands; batched RHS fills the idle stages
(SURVEY.md section 2.3 'batched RHS parallelism').

The carry passed between devices for the forward sweep is t_j = G_j @ u_j
(the propagated row), not u_j itself, so each device only ever needs its own
G blocks (row-aligned shards, `dist.partition`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..precond.sweeping import _block_thomas_solve
from .partition import DistSweepState


def _g_matvec(gre, gim, v):
    # (n, 2) RHS: one read of gre and one of gim per step; HIGHEST precision
    # so the bf16 MXU default does not degrade the sweep (precond.sweeping).
    # G may be lane-padded to (n_pad, n_pad) (setup pad_lanes) — pad/slice.
    n = v.shape[0]
    V = jnp.stack([jnp.real(v), jnp.imag(v)], axis=-1)
    if gre.shape[-1] > n:
        V = jnp.pad(V, ((0, gre.shape[-1] - n), (0, 0)))
    RV = jnp.matmul(gre, V, precision=jax.lax.Precision.HIGHEST)
    IV = jnp.matmul(gim, V, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.complex(RV[:n, 0] - IV[:n, 1], RV[:n, 1] + IV[:n, 0])


def dist_apply_preconditioner(S: DistSweepState, f_local: jax.Array, *,
                              axis_name: str, n_devices: int,
                              n_rows_global: int) -> jax.Array:
    """u_local ~= (A^{-1} f)_local inside shard_map (rows sharded on axis 0).

    Requires b < n_loc (the F band and row b live on device 0).
    """
    b = S.b
    n_loc, n = f_local.shape
    L = n_rows_global
    d = jax.lax.axis_index(axis_name)
    jrows = d * n_loc + jnp.arange(n_loc)          # global row indices

    TF = S.TF.cplx
    hf_cs, hf_cn = S.hf_cs.cplx, S.hf_cn.cplx
    a_cs, a_cn = S.a_cs.cplx, S.a_cn.cplx
    Gre, Gim = S.G_pad.re, S.G_pad.im              # (n_loc, n, n) local

    up_perm = [(i, i + 1) for i in range(n_devices - 1)]
    down_perm = [(i, i - 1) for i in range(1, n_devices)]

    u = f_local

    # --- H_F solve + row-b correction (device 0; b < n_loc) ---------------
    TFuF = _block_thomas_solve(TF, hf_cs, hf_cn, u[:b])
    TFuF = jnp.where(d == 0, TFuF, jnp.zeros_like(TFuF))
    row_b = (jrows == b)[:, None]
    u = u - jnp.where(row_b, a_cs * TFuF[b - 1][None, :], 0)

    # --- forward sweep (staged) ------------------------------------------
    def local_fwd(t0, u_loc):
        def step(t, inp):
            u_j, cs_j, gre, gim, jg = inp
            u_new = jnp.where(jg >= b + 1, u_j - cs_j * t, u_j)
            t_new = _g_matvec(gre, gim, u_new)
            t_new = jnp.where(jg >= b, t_new, t)
            return t_new, u_new
        t_last, u_out = jax.lax.scan(step, t0, (u_loc, a_cs, Gre, Gim, jrows))
        return u_out, t_last

    t = jax.lax.pcast(jnp.zeros((n,), u.dtype), (axis_name,), to='varying')
    for s in range(n_devices):
        u_new, t_last = local_fwd(t, u)
        u = jnp.where(d == s, u_new, u)
        if s + 1 < n_devices:
            t = jax.lax.ppermute(t_last, axis_name, up_perm)

    # --- fused diagonal + backward sweep (staged, reverse) ---------------
    # one pass over the local G shard per stage instead of two
    # (precond.sweeping.apply_preconditioner has the single-device analog):
    #   corrected:  u_j = G_j (u_j - cn_j * u_{j+1})   (cn zeroed at j=L-1)
    #   as-shipped: u_j = u_j - G_j (u_j + cn_j * u_{j+1})
    def local_bwd(un0, u_loc):
        def step(un, inp):
            u_j, cn_j, gre, gim, jg = inp
            cn_eff = jnp.where(jg <= L - 2, cn_j, jnp.zeros_like(cn_j))
            if S.d2_replace:
                cand = _g_matvec(gre, gim, u_j - cn_eff * un)
            else:
                cand = u_j - _g_matvec(gre, gim, u_j + cn_eff * un)
            u_new = jnp.where(jg >= b, cand, u_j)
            return u_new, u_new
        u_first, u_out = jax.lax.scan(step, un0, (u_loc, a_cn, Gre, Gim, jrows),
                                      reverse=True)
        return u_out, u_first

    un = jax.lax.pcast(jnp.zeros((n,), u.dtype), (axis_name,), to='varying')
    for s in reversed(range(n_devices)):
        u_new, u_first = local_bwd(un, u)
        u = jnp.where(d == s, u_new, u)
        if s > 0:
            un = jax.lax.ppermute(u_first, axis_name, down_perm)

    # --- F-block closure (device 0) --------------------------------------
    u_row_b = jnp.sum(jnp.where((jrows == b)[:, None], u, 0), axis=0)
    # the F->(b+1) coupling is the *global* operator's cn at row b-1
    # (code.py:381 uses A_{F,b+1}, not an H_F block) — locally on device 0
    cn_bm1 = jnp.sum(jnp.where((jrows == b - 1)[:, None], a_cn, 0), axis=0)
    rhs = jnp.zeros_like(TFuF).at[b - 1].set(cn_bm1 * u_row_b)
    uF = TFuF - _block_thomas_solve(TF, hf_cs, hf_cn, rhs)
    f_rows = (jrows < b)[:, None]
    uF_padded = jnp.concatenate(
        [uF, jnp.zeros((n_loc - b, n), u.dtype)], axis=0) if n_loc > b else uF
    return jnp.where(f_rows & (d == 0), uF_padded, u)