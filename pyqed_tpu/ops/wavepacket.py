"""Gaussian wavepacket constructors.

(reference: pyqed/phys.py — ``gwp:877``, ``rgwp:855``, ``gwp2:472``,
``gwp_k:952``.)
"""
from __future__ import annotations

import jax.numpy as jnp


def rgwp(x, x0=0.0, sigma=1.0):
    """Real Gaussian wavepacket, L2-normalized on the line
    (reference: pyqed/phys.py:855)."""
    return 1.0 / jnp.sqrt(jnp.sqrt(jnp.pi) * sigma) * jnp.exp(-((x - x0) ** 2) / 2.0 / sigma**2)


def gwp(x, a=None, x0=0.0, p0=0.0, ndim=1):
    """Complex Gaussian wavepacket with width matrix ``a``
    (reference: pyqed/phys.py:877):

        g(x) = det(a)^{1/4}/pi^{n/4} exp(-1/2 (x-x0)ᵀ a (x-x0) + i p0·(x-x0))

    For ndim == 1, x may be a grid array. For ndim > 1, x is a single point
    (vmap over grid points for fields).
    """
    if ndim == 1:
        if a is None:
            a = 1.0
        return (a / jnp.pi) ** 0.25 * jnp.exp(
            -a * (x - x0) ** 2 / 2.0 + 1j * p0 * (x - x0)
        )
    x = jnp.asarray(x)
    if a is None:
        a = jnp.eye(ndim)
    x0 = jnp.broadcast_to(jnp.asarray(x0, dtype=float), (ndim,))
    p0 = jnp.broadcast_to(jnp.asarray(p0, dtype=float), (ndim,))
    u = x - x0
    delta = u @ (a @ u)
    return (jnp.linalg.det(a) ** 0.25 / jnp.pi ** (ndim / 4)
            * jnp.exp(-0.5 * delta + 1j * p0 @ u))


def gwp_k(k, sigma, x0, k0):
    """Analytic FT of the 1D Gaussian packet (reference: pyqed/phys.py:952)."""
    a = 1.0 / sigma**2
    return ((a / jnp.sqrt(jnp.pi)) ** 0.5
            * jnp.exp(-0.5 * (a * (k - k0)) ** 2 - 1j * (k - k0) * x0))


def gwp2(x, y, sigma=None, xc=(0.0, 0.0), kc=(0.0, 0.0)):
    """2D Gaussian packet on a meshgrid (reference: pyqed/phys.py:472)."""
    if sigma is None:
        sigma = jnp.eye(2)
    A = jnp.linalg.inv(sigma)
    dx = x - xc[0]
    dy = y - kc[0] * 0 - xc[1]
    delta = A[0, 0] * dx**2 + (A[0, 1] + A[1, 0]) * dx * dy + A[1, 1] * dy**2
    phase = kc[0] * dx + kc[1] * dy
    return (jnp.linalg.det(A) ** 0.25 / jnp.pi ** 0.5
            * jnp.exp(-0.5 * delta + 1j * phase))
