"""Discretization-accuracy oracles (bench.accuracy — VERDICT round 4
task 2): the manufactured-solution study must show the 5-point scheme at
2nd order and the Mehrstellen-completed 9-point scheme at 4th order with
a decisively smaller error at fixed points-per-wavelength."""
import numpy as np

import jax.numpy as jnp

from helmholtz_tpu.bench.accuracy import convergence_orders, measure_error


def test_mass_filter9_interior_weights():
    """Away from the PML the filter is exactly [0 1 0; 1 8 1; 0 1 0]/12;
    deep inside the PML it approaches the identity."""
    from helmholtz_tpu.fd.stencil import mass_filter9

    n, b = 31, 8
    h = 1.0 / (n + 1)
    omega = 2 * jnp.pi * 4.0 + 2j
    f = jnp.zeros((n, n), jnp.complex128).at[n // 2, n // 2].set(1.0)
    Mf = np.asarray(mass_filter9(n, b, 60.0, b * h, omega, h, f))
    c = n // 2
    assert np.isclose(Mf[c, c], 8.0 / 12.0)
    for dj, di in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        assert np.isclose(Mf[c + dj, c + di], 1.0 / 12.0)
    assert np.isclose(Mf[c + 1, c + 1], 0.0)
    # deep-PML point: filter ~ identity (weights tapered off)
    f2 = jnp.zeros((n, n), jnp.complex128).at[0, 0].set(1.0)
    Mf2 = np.asarray(mass_filter9(n, b, 60.0, b * h, omega, h, f2))
    assert abs(Mf2[0, 0]) > 0.95


def test_accuracy_orders_and_9pt_advantage():
    """Refine study at fixed omega: 5pt converges at order ~2, the
    Mehrstellen 9pt at order ~4, and the 9pt error is >= 20x smaller at
    both resolutions (measured round 5: 85x at ppw 8, 326x at ppw 16)."""
    rows = []
    for stencil in ("5pt", "9pt"):
        for n in (63, 127):
            rec = measure_error(n, 8.0, stencil, rtol=1e-10, maxiter=150)
            rec["study"] = "refine"
            assert rec["converged"], rec
            rows.append(rec)
    orders = convergence_orders(rows)
    assert 1.6 < orders["5pt"][0] < 2.4, orders
    assert orders["9pt"][0] > 3.4, orders
    err = {(r["stencil"], r["n"]): r["err_rel_interior"] for r in rows}
    assert err[("9pt", 63)] < err[("5pt", 63)] / 20
    assert err[("9pt", 127)] < err[("5pt", 127)] / 20
