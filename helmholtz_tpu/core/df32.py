"""Double-float32 (compensated) arithmetic for the TPU precision story.

TPU has no native float64 (SURVEY.md section 7.3 item 3: "need a precision
story"); everything in flight is f32.  Two places in the solve pipeline are
precision-critical beyond f32 (measured: plain complex64 GMRES at n=1023
stalls at a true relative residual of ~5e-6, so the north-star rtol 1e-6 is
unreachable):

  * the solution accumulator x — rounding each correction into a single f32
    buffer floors the attainable accuracy at eps_f32 * ||x||;
  * the residual r = b - A x — catastrophic cancellation: the terms of A x
    are ~1/h^2 * |x| (1e6 at n=1023) while r shrinks toward 1e-6 * ||b||.

Both are fixed with classic error-free transformations (Knuth two_sum,
Dekker two_prod — no FMA required, exact in IEEE f32, which XLA preserves:
it does not reassociate floating point):

  * `DF32` — an unevaluated hi + lo pair ("double-float32", ~49-bit
    effective mantissa) used as the solution carry in `solve.ir.ir_gmres`;
  * `stencil_residual_comp` — r = b - A (x.hi + x.lo) with every product
    error-tracked and the 5-point sum compensated, so the result is
    accurate to ~eps * |r| + eps^2 * |A||x| instead of eps * |A||x|.

Costs ~20x the flops of the plain stencil apply but it is an O(N) VPU pass
invoked once per outer refinement cycle — noise next to one O(N * n) sweep.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .sparse import Stencil5, Stencil9

def _split_const(dtype):
    # Dekker split constant 2^ceil(p/2) + 1 for a p-bit mantissa
    return 134217729.0 if jnp.finfo(dtype).bits == 64 else 4097.0


def two_sum(a, b):
    """Error-free sum: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(x):
    t = jnp.asarray(_split_const(x.dtype), x.dtype) * x
    hi = t - (t - x)
    return hi, x - hi


def two_prod(a, b):
    """Error-free product: p + e == a * b exactly (Dekker, FMA-free)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["hi", "lo"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class DF32:
    """Unevaluated hi + lo pair; hi, lo may be real or complex arrays.

    Complex leaves decompose into independent re/im double-floats (complex
    add needs no cross terms), so `two_sum` applies plane-wise and works
    unchanged on complex dtypes.
    """

    hi: jax.Array
    lo: jax.Array

    @classmethod
    def zeros_like(cls, x) -> "DF32":
        return cls(jnp.zeros_like(x), jnp.zeros_like(x))

    @property
    def value(self) -> jax.Array:
        """Best single-precision representation."""
        return self.hi + self.lo

    def add(self, d) -> "DF32":
        """self + d for a single-width d, renormalized."""
        s, e = two_sum(self.hi, d)
        hi, lo = fast_two_sum(s, e + self.lo)
        return DF32(hi, lo)


def _shift_w(u):
    z = jnp.zeros_like(u[..., :, :1])
    return jnp.concatenate([z, u[..., :, :-1]], axis=-1)


def _shift_e(u):
    z = jnp.zeros_like(u[..., :, :1])
    return jnp.concatenate([u[..., :, 1:], z], axis=-1)


def _shift_s(u):
    z = jnp.zeros_like(u[..., :1, :])
    return jnp.concatenate([z, u[..., :-1, :]], axis=-2)


def _shift_n(u):
    z = jnp.zeros_like(u[..., :1, :])
    return jnp.concatenate([u[..., 1:, :], z], axis=-2)


_SHIFTS = (lambda u: u, _shift_w, _shift_e, _shift_s, _shift_n)


def _residual_comp_core(fields, b, views):
    """Shared compensated-residual kernel: r = b - sum_k fields[k] * u_k
    with u_k given as (hi, lo) complex view pairs aligned with `fields`.

    Each term contributes 4 real two_prods per plane (complex multiply);
    their rounding errors and the lo-part contributions accumulate in a
    plain single-width error channel (they are already ~eps relative to
    the terms, so first-order accuracy of the channel suffices).
    """
    sr, si = jnp.real(b), jnp.imag(b)
    er, ei = jnp.zeros_like(sr), jnp.zeros_like(sr)
    for a, (uh, ul) in zip(fields, views):
        ar, ai = jnp.real(a), jnp.imag(a)
        uhr, uhi = jnp.real(uh), jnp.imag(uh)
        ulr, uli = jnp.real(ul), jnp.imag(ul)
        # real plane: -(ar*uhr - ai*uhi), error-free products
        for coef, vec in ((-ar, uhr), (ai, uhi)):
            p, pe = two_prod(coef, vec)
            sr, e2 = two_sum(sr, p)
            er = er + e2 + pe
        # imag plane: -(ar*uhi + ai*uhr)
        for coef, vec in ((-ar, uhi), (-ai, uhr)):
            p, pe = two_prod(coef, vec)
            si, e2 = two_sum(si, p)
            ei = ei + e2 + pe
        # low-part contributions (first order is enough)
        er = er - (ar * ulr - ai * uli)
        ei = ei - (ar * uli + ai * ulr)
    return jax.lax.complex(sr + er, si + ei)


def stencil_residual_comp(A: Stencil5, b: jax.Array, x: DF32) -> jax.Array:
    """r = b - A @ (x.hi + x.lo), compensated, on the (L, n) grid.

    A: complex Stencil5 (in-flight complex over split-real storage); b
    complex (L, n); x a DF32 of complex (L, n).  Returns complex (L, n)
    accurate to ~eps * |r| — the residual the f32 inner solver can trust.
    """
    fields = (A.cc, A.cw, A.ce, A.cs, A.cn)
    views = [(shift(x.hi), shift(x.lo)) for shift in _SHIFTS]
    return _residual_comp_core(fields, b, views)


def stencil9_residual_comp(A: Stencil9, b: jax.Array, x: DF32) -> jax.Array:
    """r = b - A9 @ (x.hi + x.lo), compensated — `stencil_residual_comp`
    for the 9-point footprint: the four corner couplings are composed
    axis shifts (csw couples to u_{j-1,i-1} = shift_s(shift_w(u)), the
    convention of ops.spmv.stencil9_matvec / driver._host_stencil9_matvec).
    What lets the 9-point path reach rtol 1e-6 in f32 (ir-df32)."""
    shifts9 = _SHIFTS + (
        lambda u: _shift_s(_shift_w(u)),      # csw
        lambda u: _shift_s(_shift_e(u)),      # cse
        lambda u: _shift_n(_shift_w(u)),      # cnw
        lambda u: _shift_n(_shift_e(u)),      # cne
    )
    fields = (A.cc, A.cw, A.ce, A.cs, A.cn, A.csw, A.cse, A.cnw, A.cne)
    views = [(shift(x.hi), shift(x.lo)) for shift in shifts9]
    return _residual_comp_core(fields, b, views)


def halo_stencil_residual_comp(A_local: Stencil5, b_local: jax.Array,
                               x: DF32, axis_name: str,
                               n_devices: int) -> jax.Array:
    """Row-sharded compensated residual inside shard_map (the distributed
    counterpart of `stencil_residual_comp` — what lets `distributed_solve`
    reach rtol 1e-6 in f32).

    x is a DF32 of the LOCAL (n_loc, n) grid; the +-n couplings need one
    neighbor row of BOTH the hi and lo planes, exchanged as one ppermute
    message per direction (hi and lo stacked).  Devices at the domain
    boundary receive zeros — consistent with the masked boundary
    coefficients, exactly as in `dist.spmv.halo_stencil_matvec`.
    """
    up_perm = [(i, i + 1) for i in range(n_devices - 1)]
    down_perm = [(i, i - 1) for i in range(1, n_devices)]

    edge_lo = jnp.stack([x.hi[-1], x.lo[-1]])       # (2, n) last local row
    edge_hi = jnp.stack([x.hi[0], x.lo[0]])         # (2, n) first local row
    below = jax.lax.ppermute(edge_lo, axis_name, up_perm)    # from d-1
    above = jax.lax.ppermute(edge_hi, axis_name, down_perm)  # from d+1

    def ext(u, lo_row, hi_row):
        return jnp.concatenate([lo_row[None], u, hi_row[None]], axis=0)

    xe_hi = ext(x.hi, below[0], above[0])           # (n_loc + 2, n)
    xe_lo = ext(x.lo, below[1], above[1])
    center = (xe_hi[1:-1], xe_lo[1:-1])
    views = [
        center,
        (_shift_w(center[0]), _shift_w(center[1])),
        (_shift_e(center[0]), _shift_e(center[1])),
        (xe_hi[:-2], xe_lo[:-2]),                   # south neighbor rows
        (xe_hi[2:], xe_lo[2:]),                     # north neighbor rows
    ]
    fields = (A_local.cc, A_local.cw, A_local.ce, A_local.cs, A_local.cn)
    return _residual_comp_core(fields, b_local, views)


def halo_stencil9_residual_comp(A_local: Stencil9, b_local: jax.Array,
                                x: DF32, axis_name: str,
                                n_devices: int) -> jax.Array:
    """Row-sharded compensated 9-POINT residual inside shard_map — the
    distributed ir-df32 leg of the 9-point path.  The corner couplings
    need only within-row shifts of the SAME single halo row per direction
    (dist.spmv.halo_stencil9_matvec), so the exchange is unchanged: one
    (hi, lo)-stacked row up, one down."""
    up_perm = [(i, i + 1) for i in range(n_devices - 1)]
    down_perm = [(i, i - 1) for i in range(1, n_devices)]

    edge_lo = jnp.stack([x.hi[-1], x.lo[-1]])
    edge_hi = jnp.stack([x.hi[0], x.lo[0]])
    below = jax.lax.ppermute(edge_lo, axis_name, up_perm)
    above = jax.lax.ppermute(edge_hi, axis_name, down_perm)

    def ext(u, lo_row, hi_row):
        return jnp.concatenate([lo_row[None], u, hi_row[None]], axis=0)

    xe_hi = ext(x.hi, below[0], above[0])
    xe_lo = ext(x.lo, below[1], above[1])
    pair = lambda sl: (xe_hi[sl], xe_lo[sl])
    shift_pair = lambda shift, p: (shift(p[0]), shift(p[1]))
    center = pair(slice(1, -1))
    south = pair(slice(None, -2))
    north = pair(slice(2, None))
    views = [
        center,
        shift_pair(_shift_w, center),
        shift_pair(_shift_e, center),
        south,
        north,
        shift_pair(_shift_w, south),        # csw -> u[j-1, i-1]
        shift_pair(_shift_e, south),        # cse
        shift_pair(_shift_w, north),        # cnw
        shift_pair(_shift_e, north),        # cne
    ]
    fields = (A_local.cc, A_local.cw, A_local.ce, A_local.cs, A_local.cn,
              A_local.csw, A_local.cse, A_local.cnw, A_local.cne)
    return _residual_comp_core(fields, b_local, views)
