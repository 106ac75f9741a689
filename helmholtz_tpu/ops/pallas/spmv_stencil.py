"""Fused Pallas TPU kernel for the 5-point complex stencil SpMV.

This is the domain's headline kernel (the north-star metric is complex SpMV
nnz/s vs the HBM roofline, BASELINE.json): y = A @ u for the Stencil5
operator, computed in one pass over HBM.

Design (split-real convention, core.complexlib):
  * all arrays are f32 pairs, lane-padded to a multiple of 128 with ZERO
    coefficient padding — in-row neighbor access is then a cheap lane
    `pltpu.roll`, because wrapped-around lanes always meet a zero
    coefficient (boundary masks + zero padding);
  * the grid tiles the layer axis; each program owns a (BL, n_pad) block of
    coefficients/outputs streamed through VMEM by the Pallas pipeline;
  * u needs one halo row above and below the block, so u stays in ANY/HBM
    and each program DMAs its (BL+2, n_pad) slice (u is pre-padded with one
    zero row on each side, which also realizes the Dirichlet boundary);
  * per-point work: 5 complex multiply-adds = 20 real FMAs on the VPU.

Memory traffic: 14 f32 arrays per point (10 coeff + 2 u + 2 y) = 56 B for
5 nnz -> roofline nnz/s = HBM_BW * 5/56.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.complexlib import CArray
from ...core.sparse import Stencil5


def _kernel(ur_hbm, ui_hbm,
            ccr, cci, cwr, cwi, cer, cei, csr_, csi, cnr, cni,
            yr, yi, u_scr, sem, *, bl, n_pad):
    i = pl.program_id(0)

    # (bl+8)-row window starting at i*bl: 8-aligned sublane slice shape.
    # Window row k holds u_pad[i*bl + k]; the center rows are at offset 1,
    # reached with sublane rolls (off-by-one slices are not tile-aligned).
    dma = pltpu.make_async_copy(
        ur_hbm.at[pl.ds(i * bl, bl + 8), :], u_scr.at[0], sem.at[0])
    dma_i = pltpu.make_async_copy(
        ui_hbm.at[pl.ds(i * bl, bl + 8), :], u_scr.at[1], sem.at[1])
    dma.start()
    dma_i.start()
    dma.wait()
    dma_i.wait()

    win_r, win_i = u_scr[0], u_scr[1]
    usr = win_r[0:bl, :]            # row below (j-1)
    usi = win_i[0:bl, :]
    ctr_r = pltpu.roll(win_r, bl + 7, 0)   # shift -1: row k -> u_pad[ibl+k+1]
    ctr_i = pltpu.roll(win_i, bl + 7, 0)
    ucr = ctr_r[0:bl, :]            # centered u rows
    uci = ctr_i[0:bl, :]
    up_r = pltpu.roll(win_r, bl + 6, 0)    # shift -2: row k -> u_pad[ibl+k+2]
    up_i = pltpu.roll(win_i, bl + 6, 0)
    unr = up_r[0:bl, :]             # row above (j+1)
    uni = up_i[0:bl, :]
    # in-row neighbors: lane roll; wraparound lanes hit zero coefficients
    uwr = pltpu.roll(ucr, 1, 1)     # u[j, i-1]
    uwi = pltpu.roll(uci, 1, 1)
    uer = pltpu.roll(ucr, n_pad - 1, 1)    # u[j, i+1] (negative shift)
    uei = pltpu.roll(uci, n_pad - 1, 1)

    def cmla(ar, ai, br, bi, accr, acci):
        return accr + ar * br - ai * bi, acci + ar * bi + ai * br

    outr, outi = cmla(ccr[...], cci[...], ucr, uci,
                      jnp.zeros_like(ucr), jnp.zeros_like(uci))
    outr, outi = cmla(cwr[...], cwi[...], uwr, uwi, outr, outi)
    outr, outi = cmla(cer[...], cei[...], uer, uei, outr, outi)
    outr, outi = cmla(csr_[...], csi[...], usr, usi, outr, outi)
    outr, outi = cmla(cnr[...], cni[...], unr, uni, outr, outi)
    yr[...] = outr
    yi[...] = outi


def _pad_lanes(x, n_pad):
    return jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1])))


@functools.partial(jax.jit, static_argnames=("block_layers", "interpret"))
def pallas_stencil_matvec(A_pair: Stencil5, u: CArray, *,
                          block_layers: int = 128,
                          interpret: bool = False) -> CArray:
    """y = A @ u with A a Stencil5 of CArray fields and u a CArray (L, n).

    Returns a CArray of the same shape.  Pure function of pair-typed data —
    TPU-storable end to end.
    """
    L, n = A_pair.cc.shape
    n_pad = -(-n // 128) * 128
    # VMEM budget: 12 (bl, n_pad) f32 blocks double-buffered + the
    # (2, bl+8, n_pad) u window must stay well under the ~16 MB scoped
    # limit (24*4*n_pad bytes per layer row + window) — cap bl accordingly.
    bl_budget = max(8, int(8e6) // (24 * 4 * n_pad) // 8 * 8)
    bl = min(block_layers, bl_budget, L)
    # pad the layer axis up to a block multiple (zero coeffs -> zero output)
    L_pad = -(-L // bl) * bl

    def prep(f):
        f = _pad_lanes(f, n_pad)
        return jnp.pad(f, ((0, L_pad - L), (0, 0)))

    coeffs = []
    for field in (A_pair.cc, A_pair.cw, A_pair.ce, A_pair.cs, A_pair.cn):
        coeffs += [prep(field.re), prep(field.im)]

    # u: one zero halo row on top, halo + alignment rows at the bottom
    # (each program DMAs an aligned (bl+8)-row window) — Dirichlet for free
    def prep_u(f):
        f = _pad_lanes(f, n_pad)
        return jnp.pad(f, ((1, L_pad - L + 7), (0, 0)))

    u_re, u_im = prep_u(u.re), prep_u(u.im)

    grid = (L_pad // bl,)
    coeff_spec = pl.BlockSpec((bl, n_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_kernel, bl=bl, n_pad=n_pad),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
                 + [coeff_spec] * 10,
        out_specs=(coeff_spec, coeff_spec),
        out_shape=(jax.ShapeDtypeStruct((L_pad, n_pad), u.re.dtype),
                   jax.ShapeDtypeStruct((L_pad, n_pad), u.re.dtype)),
        scratch_shapes=[
            pltpu.VMEM((2, bl + 8, n_pad), u.re.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(u_re, u_im, *coeffs)
    return CArray(yr[:L, :n], yi[:L, :n])
