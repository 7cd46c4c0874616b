"""Small math helpers shared across solvers.

(reference: pyqed/phys.py — ``lorentzian:1084``, ``gaussian:1106``,
``coth:1181``, ``heaviside:1153``, ``fermi:1066``, ``sinc:806``,
``rect:603``, ``interval:606``, ``stepsize:610``, ``fftfreq:613``,
``jacobi_anger:281``, ``morse:447``; pyqed/quadrature.py — Gauss-Hermite.)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def lorentzian(x, width=1.0):
    """Normalized Lorentzian with HWHM ``width``
    (reference: pyqed/phys.py:1084)."""
    return 1.0 / jnp.pi * width / (width**2 + x**2)


def gaussian(x, sigma=1.0):
    """Normalized Gaussian (reference: pyqed/phys.py:1106)."""
    return 1.0 / sigma / jnp.sqrt(2.0 * jnp.pi) * jnp.exp(-(x**2) / 2.0 / sigma**2)


def coth(x):
    return 1.0 / jnp.tanh(x)


def heaviside(x):
    return jnp.heaviside(x, 0.5)


def fermi(E, Ef=0.0, T=1e-4):
    """Fermi-Dirac occupation (reference: pyqed/phys.py:1066)."""
    return 1.0 / (jnp.exp((E - Ef) / T) + 1.0)


def sinc(x):
    """sin(x)/x (NOT numpy's normalized sinc; reference: pyqed/phys.py:806)."""
    return jnp.sinc(x / jnp.pi)


def rect(x):
    """Rectangular window on [-1/2, 1/2] (reference: pyqed/phys.py:603)."""
    return jnp.where(jnp.abs(x) <= 0.5, 1.0, 0.0)


def interval(x):
    """Grid spacing of a uniform grid (reference: pyqed/phys.py:606)."""
    return x[1] - x[0]


stepsize = interval


def fftfreq(times):
    """Angular frequency grid conjugate to ``times``
    (reference: pyqed/phys.py:613)."""
    n = len(times)
    dt = times[1] - times[0]
    return 2.0 * np.pi * np.fft.fftshift(np.fft.fftfreq(n, d=dt))


def morse(r, D, a, re):
    """Morse potential D(1-e^{-a(r-re)})^2 (reference: pyqed/phys.py:447)."""
    return D * (1.0 - jnp.exp(-a * (r - re))) ** 2


def pdf_normal(x, mu=0.0, sigma=1.0):
    return 1.0 / (sigma * jnp.sqrt(2 * jnp.pi)) * jnp.exp(-0.5 * ((x - mu) / sigma) ** 2)


def discretize(a=0.0, b=1.0, l=4, endpoints=True):
    """Dyadic discretization of [a, b] with 2^l points
    (reference: pyqed/phys.py:158)."""
    n = 2**l
    if endpoints:
        return np.linspace(a, b, n)
    x, dx = np.linspace(a, b, n, endpoint=False, retstep=True)
    return x + dx / 2


def cartesian_product(arrays):
    """All coordinate tuples of a tensor-product grid
    (reference: pyqed/phys.py:129)."""
    la = len(arrays)
    arr = np.empty([len(a) for a in arrays] + [la])
    for i, a in enumerate(np.ix_(*arrays)):
        arr[..., i] = a
    return arr.reshape(-1, la)


def is_positive_def(A):
    try:
        np.linalg.cholesky(np.asarray(A))
        return True
    except np.linalg.LinAlgError:
        return False
