"""Adiabatic-to-diabatic transformation (ADT) for two coupled states.

TPU-native counterpart of the reference's ``ADT`` (reference:
pyqed/models/jahn_teller.py:463 — the body there is ``angle = 0.`` and
nothing else; made real here).

For two states in one nuclear coordinate the ADT is exactly solvable:
the mixing angle integrates the derivative coupling,

    theta(x) = theta0 + int_{x0}^{x} tau(x') dx',
    tau(x) = <phi_1(x) | d phi_2(x) / dx>,

and the diabatic potential matrix is V_dia = R(theta) diag(E_1, E_2)
R(theta)^T with R the 2x2 rotation.  In 1D (and for any path in N-D)
this removes the derivative coupling identically — curl terms only
obstruct ADT for >2 states / multiple dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["adt_angle", "adt_1d", "ADT"]


def _cumtrapz(y, x):
    dy = 0.5 * (y[1:] + y[:-1]) * (x[1:] - x[:-1])
    return jnp.concatenate([jnp.zeros(1, dtype=dy.dtype), jnp.cumsum(dy)])


def adt_angle(x, nac, theta0=0.0):
    """Mixing angle theta(x) from the scalar derivative coupling
    tau(x) = <phi_1|d phi_2/dx> by cumulative trapezoid integration."""
    x = jnp.asarray(x)
    nac = jnp.asarray(nac)
    return theta0 + _cumtrapz(nac, x)


def adt_1d(x, apes, nac, theta0=0.0):
    """Diabatize two adiabatic surfaces.

    Parameters
    ----------
    x : (nx,) grid.
    apes : (nx, 2) adiabatic energies (lower, upper).
    nac : (nx,) derivative coupling <phi_1|d phi_2/dx>.
    theta0 : gauge — the mixing angle at x[0].

    Returns
    -------
    V : (nx, 2, 2) diabatic potential matrices,
    theta : (nx,) the ADT mixing angle.
    """
    apes = jnp.asarray(apes)
    theta = adt_angle(x, nac, theta0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    el, eu = apes[:, 0], apes[:, 1]
    # Convention: the UPPER adiabat's eigenvector is u+ = (cos t, sin t)
    # and the lower's u- = (-sin t, cos t), so that
    # tau = <lower| d upper/dx> = d theta/dx exactly.  Then
    # V = E_l u- u-^T + E_u u+ u+^T:
    v11 = s**2 * el + c**2 * eu
    v22 = c**2 * el + s**2 * eu
    v12 = c * s * (eu - el)
    V = jnp.stack([jnp.stack([v11, v12], axis=-1),
                   jnp.stack([v12, v22], axis=-1)], axis=-2)
    return V, theta


ADT = adt_1d    # reference drop-in name (pyqed/models/jahn_teller.py:463)
