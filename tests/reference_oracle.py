"""Independent scalar-loop oracle for the Helmholtz discretization.

Implements the formulas of SURVEY.md section 0 / Appendix B directly, point by
point, in numpy complex128 + scipy.sparse — deliberately the *opposite* style
of the vectorized production code so the two act as cross-checks.  Produces
matrices elementwise-comparable with the reference's (`code.py:202-219,
283-290`) under the "as-shipped" velocity-sampling convention.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse


def sigma1(x, const, eta):
    if x <= eta:
        return const / eta * ((x - eta) / eta) ** 2
    if x >= 1 - eta:
        return const / eta * ((x - 1 + eta) / eta) ** 2
    return 0.0


def sigma2(x, const, eta):
    if x <= eta:
        return const / eta * ((x - eta) / eta) ** 2
    return 0.0


def s1(x, const, eta, omega):
    return 1.0 / (1.0 + 1j * sigma1(x, const, eta) / omega)


def s2(x, const, eta, omega):
    return 1.0 / (1.0 + 1j * sigma2(x, const, eta) / omega)


def point_coeffs(i, j, s2_of_x2, const, eta, omega, h, c_val):
    """The five stencil coefficients at grid point (i, j), 1-based.

    `s2_of_x2` is the stretching used in the x2 direction (plain s2 for A,
    the moved profile for H_m).  Returns (c1, c2, c3, c4, c5) — the west,
    east, south, north couplings and the diagonal — *unmasked*.
    """
    ih2 = 1.0 / h**2
    c1 = ih2 * s1((i - 0.5) * h, const, eta, omega) / s2_of_x2(j * h)
    c2 = ih2 * s1((i + 0.5) * h, const, eta, omega) / s2_of_x2(j * h)
    c3 = ih2 * s2_of_x2((j - 0.5) * h) / s1(i * h, const, eta, omega)
    c4 = ih2 * s2_of_x2((j + 0.5) * h) / s1(i * h, const, eta, omega)
    c5 = omega**2 / (s1(i * h, const, eta, omega) * s2_of_x2(j * h) * c_val**2) \
        - (c1 + c2 + c3 + c4)
    return c1, c2, c3, c4, c5


def build_a_dense(n, b, const, eta, omega, h, c_full):
    """Dense (n^2, n^2) Helmholtz operator, as-shipped velocity sampling."""
    N = n * n
    A = np.zeros((N, N), dtype=np.complex128)
    s2_plain = lambda x2: s2(x2, const, eta, omega)
    for j in range(1, n + 1):       # layer (x2)
        for i in range(1, n + 1):   # in-layer (x1)
            k = (j - 1) * n + (i - 1)
            c_val = c_full[i - 1, j - 1]   # as-shipped quirk (code.py:108)
            c1, c2, c3, c4, c5 = point_coeffs(i, j, s2_plain, const, eta,
                                              omega, h, c_val)
            A[k, k] = c5
            if i > 1:
                A[k, k - 1] = c1
            if i < n:
                A[k, k + 1] = c2
            if j > 1:
                A[k, k - n] = c3
            if j < n:
                A[k, k + n] = c4
    return A


def build_hm_dense(m, n, b, const, eta, omega, h, c_full):
    """Dense (b*n, b*n) moving-PML subgrid operator H_m for top layer m."""
    N = b * n
    H = np.zeros((N, N), dtype=np.complex128)
    s2_moved = lambda x2: s2(x2 - (m - b) * h, const, eta, omega)
    for l in range(1, b + 1):       # local layer; global j = m - b + l
        j = m - b + l
        for i in range(1, n + 1):
            k = (l - 1) * n + (i - 1)
            c_val = c_full[i - 1, j - 1]
            c1, c2, c3, c4, c5 = point_coeffs(i, j, s2_moved, const, eta,
                                              omega, h, c_val)
            H[k, k] = c5
            if i > 1:
                H[k, k - 1] = c1
            if i < n:
                H[k, k + 1] = c2
            if l > 1:
                H[k, k - n] = c3
            if l < b:
                H[k, k + n] = c4
    return H


def build_a_scipy(n, b, const, eta, omega, h, c_full):
    return scipy.sparse.csr_matrix(build_a_dense(n, b, const, eta, omega, h, c_full))


def velocity_c1(r1, r2, n):
    x = np.linspace(0.0, 1.0, n + 2)
    xx, yy = np.meshgrid(x, x)
    return 4.0 / 3.0 * (1.0 - 0.5 * np.exp(-32.0 * ((xx - r1) ** 2 + (yy - r2) ** 2)))


def forcing_f1(r1, r2, omega, n):
    x = np.linspace(0.0, 1.0, n + 2)[1:-1]
    xx, yy = np.meshgrid(x, x)
    return np.exp(-((4.0 * omega / np.pi) ** 2) * ((xx - r1) ** 2 + (yy - r2) ** 2))
