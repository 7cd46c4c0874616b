"""Adiabatic-to-diabatic transformation (reference
pyqed/models/jahn_teller.py:463 ``ADT`` — an `angle = 0.` stub, made
real): closed-loop test against an analytic avoided crossing.
"""
import numpy as np

from pyqed_tpu.grid import adt_1d, adt_angle


def _linear_crossing(x, c=0.3):
    """H_dia = [[x, c], [c, -x]]: analytic adiabats, NAC, and angle."""
    E = np.sqrt(x**2 + c**2)
    apes = np.stack([-E, E], axis=-1)
    # exact mixing angle of the 2x2: theta = 0.5 atan2(2c, (a - b))
    theta = 0.5 * np.arctan2(2 * c, 2 * x)
    nac = np.gradient(theta, x)          # tau = d theta / dx
    return apes, nac, theta


def test_adt_recovers_diabats():
    x = np.linspace(-6, 6, 4001)
    c = 0.3
    apes, nac, theta_exact = _linear_crossing(x, c)
    V, theta = adt_1d(x, apes, nac, theta0=theta_exact[0])
    V = np.asarray(V)
    # recover H_dia = [[x, c], [c, -x]] up to integration error
    assert np.max(np.abs(V[:, 0, 0] - x)) < 2e-3
    assert np.max(np.abs(V[:, 1, 1] + x)) < 2e-3
    assert np.max(np.abs(V[:, 0, 1] - c)) < 2e-3
    # the recovered angle follows the analytic one
    assert np.max(np.abs(np.asarray(theta) - theta_exact)) < 1e-4


def test_adt_removes_coupling_any_gauge():
    """With theta0 = 0 the diabats differ by a constant rotation but the
    frame is still strictly diabatic: d/dx of the transformation absorbs
    the NAC, so the off-diagonal element is smooth through the crossing
    (no sign flip / kink), and eigenvalues of V reproduce the apes."""
    x = np.linspace(-5, 5, 2001)
    apes, nac, _ = _linear_crossing(x, 0.2)
    V, theta = adt_1d(x, apes, nac)
    V = np.asarray(V)
    w = np.linalg.eigvalsh(V)
    assert np.max(np.abs(w - np.sort(apes, axis=-1))) < 1e-10
    # smoothness of V12 through x=0 (adiabatic quantities are not)
    d = np.diff(V[:, 0, 1])
    assert np.max(np.abs(d)) < 5e-3
