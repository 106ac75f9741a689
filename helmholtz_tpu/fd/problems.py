"""Canonical velocity fields and forcings of the reference experiments.

Vectorized re-implementations of the four problem-instance constructors
(PDF p.2; SURVEY.md section 0): velocity fields c1 (converging lens) and c2
(waveguide), forcings f1 (Gaussian point source) and f2 (directed Gaussian
wave packet), with the reference's exact sampling conventions
(code.py:40-66, 390-408):

  * velocity fields live on the full (n+2, n+2) grid including boundary,
    [row, col] = value at (x = col*h, y = row*h);
  * forcings live on the (n, n) interior grid, same orientation;
  * f1/f2 use the *complex* omega = 2*pi*wave_num + i*alpha in their
    Gaussians, so f is complex-valued (Appendix B item 6).
"""
from __future__ import annotations

import jax.numpy as jnp


def _grids(n, interior):
    x = jnp.linspace(0.0, 1.0, n + 2)
    if interior:
        x = x[1:-1]
    return jnp.meshgrid(x, x)  # xx varies along columns, yy along rows


def init_c1_mat(r1, r2, n):
    """Converging lens: 4/3 * (1 - .5*exp(-32*((x-r1)^2 + (y-r2)^2)))
    on the full grid (code.py:40-44)."""
    xx, yy = _grids(n, interior=False)
    return 4.0 / 3.0 * (1.0 - 0.5 * jnp.exp(-32.0 * ((xx - r1) ** 2 + (yy - r2) ** 2)))


def init_c2_mat(n):
    """Waveguide: 4/3 * (1 - .5*exp(-32*(x-.5)^2)) (code.py:47-51)."""
    xx, _ = _grids(n, interior=False)
    return 4.0 / 3.0 * (1.0 - 0.5 * jnp.exp(-32.0 * (xx - 0.5) ** 2))


def init_f1_mat(r1, r2, omega, n, complex_dtype=jnp.complex128):
    """Gaussian point source exp(-(4w/pi)^2 * r^2), interior grid
    (code.py:54-58).  Complex because omega is complex."""
    xx, yy = _grids(n, interior=True)
    omega = jnp.asarray(omega, complex_dtype)
    return jnp.exp(-((4.0 * omega / jnp.pi) ** 2)
                   * ((xx - r1) ** 2 + (yy - r2) ** 2))


def init_f2_mat(r1, r2, d1, d2, omega, n, complex_dtype=jnp.complex128):
    """Directed Gaussian wave packet aimed along (d1, d2) (code.py:61-66)."""
    xx, yy = _grids(n, interior=True)
    omega = jnp.asarray(omega, complex_dtype)
    return (jnp.exp(-4.0 * omega * ((xx - r1) ** 2 + (yy - r2) ** 2))
            * jnp.exp(1j * omega * (xx * d1 + yy * d2)))


# -- named problem instances with the paper's default positions --------------
# (code.py:390-408)

def init_c1_f1(omega, n, cr1=0.5, cr2=0.5, fr1=0.5, fr2=0.125,
               complex_dtype=jnp.complex128):
    return (init_c1_mat(cr1, cr2, n),
            init_f1_mat(fr1, fr2, omega, n, complex_dtype))


def init_c1_f2(omega, n, cr1=0.5, cr2=0.5, fr1=0.125, fr2=0.125,
               d1=2.0 ** -0.5, d2=2.0 ** -0.5, complex_dtype=jnp.complex128):
    return (init_c1_mat(cr1, cr2, n),
            init_f2_mat(fr1, fr2, d1, d2, omega, n, complex_dtype))


def init_c2_f1(omega, n, r1=0.5, r2=0.5, complex_dtype=jnp.complex128):
    return (init_c2_mat(n),
            init_f1_mat(r1, r2, omega, n, complex_dtype))


def init_c2_f2(omega, n, r1=0.5, r2=0.5, d1=2.0 ** -0.5, d2=2.0 ** -0.5,
               complex_dtype=jnp.complex128):
    return (init_c2_mat(n),
            init_f2_mat(r1, r2, d1, d2, omega, n, complex_dtype))


PROBLEMS = {
    "c1_f1": init_c1_f1,
    "c1_f2": init_c1_f2,
    "c2_f1": init_c2_f1,
    "c2_f2": init_c2_f2,
}

# Velocity fields with no x2 (layer) dependence under CORRECTED sampling:
# every moving-PML subgrid H_m samples the identical velocity window, so the
# whole family collapses to ONE subgrid (setup factors one corner inverse;
# the sweep broadcasts it — see precond.sweeping 'shared_g').  Not valid for
# fidelity="as-shipped", whose transposed read (code.py:108) makes the
# sampled velocity layer-dependent even for a waveguide.
ROW_INVARIANT_VELOCITY = frozenset({"c2_f1", "c2_f2"})

# Velocity fields verified smooth on the scale of a few grid rows (the two
# reference Gaussians, feature scale ~0.18 in unit-square coordinates) —
# the precondition for strided factorization with interpolated corner
# inverses (precond.sweeping.factor_corner_inverses `stride` docstring).
# The driver's auto `factor_stride` applies ONLY to problems in this set;
# problems registered later (rough or discontinuous media) default to
# stride 1 unless the user opts in explicitly.
SMOOTH_VELOCITY = frozenset({"c1_f1", "c1_f2", "c2_f1", "c2_f2"})
