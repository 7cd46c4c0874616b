"""Lippmann-Schwinger scattering solvers.

TPU-native counterpart of the reference scattering module
(reference: pyqed/LippmanSchwinger.py — ``LippmannSchwingerSolver:44`` 1D,
``LippmannSchwinger2DSolver:85``).

The integral equation psi = phi + G0 V psi is discretized to a dense linear
system; k-point scans are batched with vmap (the reference loops in
Python). Dense solves run on the MXU.
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


class LippmannSchwingerSolver:
    """1D scattering from a localized potential
    (reference: pyqed/LippmanSchwinger.py:44)."""

    def __init__(self, a, b, n, V: Callable):
        self.a, self.b, self.n = a, b, n
        self.V = V
        self.x = np.linspace(a, b, n + 1)
        self.h = self.x[1] - self.x[0]

    def run(self, k_vec, mass=1.0):
        """Solve (I - h G0 V) psi = e^{ikx} for each k (vmapped).

        Returns (psi (nk, n+1), transmission |psi(b)|)."""
        x = jnp.asarray(self.x)
        Vx = jnp.asarray(self.V(self.x)).astype(complex)
        h = self.h
        XX, TT = jnp.meshgrid(x, x, indexing="xy")

        def solve_one(k):
            # 1D retarded Green's function G0(x, x') = -i m/k e^{ik|x-x'|}
            G = -1j * mass / k * jnp.exp(1j * k * jnp.abs(XX - TT))
            K = (G * Vx[:, None]).T
            A = jnp.eye(len(x), dtype=complex) - h * K
            phi = jnp.exp(1j * k * x)
            return jnp.linalg.solve(A, phi)

        psi = jax.vmap(solve_one)(jnp.asarray(k_vec))
        transmission = jnp.abs(psi[:, -1])
        return psi, transmission


class LippmannSchwinger2DSolver:
    """2D scattering (reference: pyqed/LippmanSchwinger.py:85).

    Green's function G0 = -(i/4) H0^(1)(k|r-r'|); the Hankel function is
    evaluated on host (SciPy), the dense solve on device.
    """

    def __init__(self, x, y, V: Callable):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.V = V
        X, Y = np.meshgrid(self.x, self.y, indexing="ij")
        self.X, self.Y = X, Y
        self.coords = np.stack([X.ravel(), Y.ravel()], axis=1)
        self.h = (self.x[1] - self.x[0]) * (self.y[1] - self.y[0])

    def run(self, k, angle=0.0):
        import scipy.spatial
        import scipy.special
        eps = 1e-4
        S = scipy.spatial.distance.cdist(self.coords, self.coords + eps)
        G = -0.25j * scipy.special.hankel1(0, k * S)
        Vg = np.ravel(self.V(self.X + eps, self.Y + eps))
        A = np.eye(len(Vg)) + self.h * G * Vg[None, :]
        kvec = k * np.array([np.cos(angle), np.sin(angle)])
        phi = np.exp(1j * (self.coords @ kvec))
        psi = jnp.linalg.solve(jnp.asarray(A), jnp.asarray(phi))
        return jnp.reshape(psi, self.X.shape)
