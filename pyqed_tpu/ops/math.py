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


def meshgrid(*args):
    """ij-indexed meshgrid (reference: pyqed/phys.py meshgrid — "fix the
    indexing of the Numpy meshgrid")."""
    return jnp.meshgrid(*args, indexing="ij")


def cartesian(*args):
    """Cartesian product as a list of lists (reference: pyqed/phys.py)."""
    ans = [[]]
    for arg in args:
        ans = [x + [y] for x in ans for y in arg]
    return ans


def logarithmic_discretize(n, base=2.0):
    """Logarithmic discretization points Lambda^-k, k = 0..n, of (0, 1]
    in descending order (reference: pyqed/phys.py; used by NRG)."""
    return jnp.asarray(float(base) ** (-jnp.arange(n + 1, dtype=float)))


def polar2cartesian(r, theta):
    """(r, theta) -> (x, y) (reference: pyqed/phys.py)."""
    return r * jnp.cos(theta), r * jnp.sin(theta)


def cartesian2polar(x, y):
    """(x, y) -> (r, theta) (reference: pyqed/phys.py)."""
    return jnp.sqrt(x ** 2 + y ** 2), jnp.arctan2(y, x)


def nlargest(a, n=1, with_index=False):
    """Largest n elements (optionally with indices), descending
    (reference: pyqed/phys.py — heapq there; one argsort here)."""
    a = jnp.asarray(a)
    idx = jnp.argsort(a)[::-1][:n]
    if with_index:
        return a[idx], idx
    return a[idx]


def get_index(array, value):
    """Index of the element closest to `value` (reference: pyqed/phys.py)."""
    return int(jnp.argmin(jnp.abs(jnp.asarray(array) - value)))


def polarization_vector(pol="x"):
    """Unit polarization vector: 'x', 'y', 'z', 'lcp', 'rcp'
    (reference: pyqed/phys.py — x/y/lcp/rcp there)."""
    import numpy as _np
    vecs = {
        "x": _np.array([1.0, 0.0, 0.0]),
        "y": _np.array([0.0, 1.0, 0.0]),
        "z": _np.array([0.0, 0.0, 1.0]),
        "lcp": _np.array([1.0, 1j, 0.0]) / _np.sqrt(2),
        "rcp": _np.array([1.0, -1j, 0.0]) / _np.sqrt(2),
    }
    try:
        return jnp.asarray(vecs[pol])
    except KeyError:
        raise ValueError(f"unknown polarization {pol!r}") from None


def rotate(angle):
    """2D rotation matrix (reference: pyqed/phys.py rotate — which
    returns the invalid ``np.array()`` there; made real)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]])


def polar(x, y):
    """(rho, phi) from cartesian (reference: pyqed/mol.py:1296)."""
    return cartesian2polar(x, y)


def square_barrier(x, width, height):
    """Rectangular barrier of given width/height starting at x=0
    (reference: pyqed/wpd.py:1965)."""
    x = jnp.asarray(x)
    return height * (jnp.heaviside(x, 0.5) - jnp.heaviside(x - width, 0.5))
