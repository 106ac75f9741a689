"""Problem assembly: config -> operators + RHS.

The high-level entry that replaces the assembly portion of the reference's
`run_solver` (code.py:440-450): velocity/forcing construction, global
operator A, and (for the preconditioner) the H_F / H_m operator family and
interlayer coupling vectors.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import HelmholtzConfig
from ..core.sparse import Stencil5
from . import problems, stencil


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "c_full", "f_grid"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Problem:
    """Assembled discrete problem: operator A (Stencil5 on the (n, n) grid),
    velocity field on the full grid, and forcing on the interior grid."""

    A: Stencil5
    c_full: jax.Array   # (n+2, n+2) real
    f_grid: jax.Array   # (n, n) complex

    @property
    def f_vec(self) -> jax.Array:
        return self.f_grid.reshape(-1)


def assemble_problem(cfg: HelmholtzConfig, problem: str = "c1_f1",
                     complex_dtype=jnp.complex128) -> Problem:
    """Build velocity, forcing, and the global operator for a named problem
    instance (equivalent of code.py:447-450)."""
    init = problems.PROBLEMS[problem]
    c_full, f_grid = init(cfg.omega, cfg.n, complex_dtype=complex_dtype)
    A = stencil.build_a_stencil(
        cfg.n, cfg.b, cfg.const, cfg.eta, cfg.omega, cfg.h, c_full,
        fidelity=cfg.fidelity, complex_dtype=complex_dtype)
    return Problem(A=A, c_full=c_full, f_grid=f_grid.astype(complex_dtype))


def interlayer_couplings(A: Stencil5):
    """The diagonal interlayer coupling vectors used by the sweep.

    Returns (down, up) of shape (L, n):
      down[j] = the diagonal of block A_{j, j-1} (coupling to layer below,
                reference's `lo_A_ra`, code.py:503-507) = A.cs[j];
      up[j]   = the diagonal of block A_{j, j+1} (reference's `up_A_ra`)
                = A.cn[j].
    No separate assembly is needed — they are rows of the stencil fields.
    """
    return A.cs, A.cn
