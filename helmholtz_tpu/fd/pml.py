"""PML damping profiles and complex coordinate-stretching functions.

Vectorized TPU-friendly re-design of the reference's scalar numba kernels
(`sigma1`/`sigma2`/`s1`/`s2`/`s2m`, code.py:11-37).  The reference evaluates
these point-by-point inside assembly loops; here they are pure `jnp`
element-wise functions over whole coordinate grids so XLA fuses them straight
into the stencil-materialization computation (SURVEY.md section 2.2 row 1).

Conventions (SURVEY.md Appendix B item 4):
  * sigma1 is two-sided (PML at x<=eta and x>=1-eta) — the x1 direction.
  * sigma2 is one-sided (PML at x<=eta only) — the x2 direction; the top
    boundary (x2=1) is plain Dirichlet, no PML.
  * s(x) = 1 / (1 + i*sigma(x)/omega), the complex stretching factor.
  * s2m is sigma2 translated by (m-b)*h: the "moving PML" of Engquist-Ying
    Algorithm 2.3 — the absorbing layer slides up to sit just below layer m.
"""
from __future__ import annotations

import jax.numpy as jnp


def sigma1(x, const, eta):
    """Two-sided quadratic damping profile (reference code.py:11-18)."""
    x = jnp.asarray(x)
    amp = const / eta
    lo = amp * ((x - eta) / eta) ** 2
    hi = amp * ((x - 1.0 + eta) / eta) ** 2
    zero = jnp.zeros_like(lo)
    return jnp.where(x <= eta, lo, jnp.where(x >= 1.0 - eta, hi, zero))


def sigma2(x, const, eta):
    """One-sided (bottom-only) quadratic damping profile (code.py:20-25)."""
    x = jnp.asarray(x)
    amp = const / eta
    lo = amp * ((x - eta) / eta) ** 2
    return jnp.where(x <= eta, lo, jnp.zeros_like(lo))


def _stretch(sig, omega, complex_dtype):
    sig = sig.astype(complex_dtype)
    omega = jnp.asarray(omega, dtype=complex_dtype)
    return 1.0 / (1.0 + 1j * sig / omega)


def s1(x, const, eta, omega, complex_dtype=jnp.complex128):
    """Complex stretching for the x1 direction (code.py:27-29)."""
    return _stretch(sigma1(x, const, eta), omega, complex_dtype)


def s2(x, const, eta, omega, complex_dtype=jnp.complex128):
    """Complex stretching for the x2 direction (code.py:31-33)."""
    return _stretch(sigma2(x, const, eta), omega, complex_dtype)


def s2m(x, m, b, const, eta, omega, h, complex_dtype=jnp.complex128):
    """Moved-PML stretching: s2 evaluated at x - (m-b)*h (code.py:35-37).

    For subgrid layer coordinates x = j*h with j in m-b+1..m this equals
    s2(l*h) with l = j-(m-b) in 1..b — i.e. the moved PML profile depends
    only on the *local* layer index, a structural fact the batched subgrid
    assembly exploits (SURVEY.md section 3.3).
    """
    return _stretch(sigma2(x - (m - b) * h, const, eta), omega, complex_dtype)
