"""Wavepacket dynamics in a moving/fixed Gaussian basis.

TPU-native counterpart of the reference moving-Gaussian layer
(reference: pyqed/moving_gaussian.py — ``GWP:29``, ``_overlap:96``,
``_moment``, ``WPD:157`` fixed-basis dynamics, ``WPD2:434``,
``NAWPD:737``; pyqed/ldr/gwp.py moving-basis matrix elements).

All pairwise basis matrix elements (overlap, moments, kinetic) are closed
Gaussian formulas evaluated as broadcast outer products (no double loops);
dynamics in the nonorthogonal basis solves S dc/dt = -i H c with a
generalized eigen-decomposition once (fixed basis).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.result import Result


@dataclasses.dataclass
class GWP:
    """A 1D Gaussian wavepacket basis function
    (reference: pyqed/moving_gaussian.py:29)."""
    q: float
    p: float = 0.0
    a: float = 1.0
    phase: float = 0.0

    def evaluate(self, x):
        return ((self.a / np.pi) ** 0.25
                * jnp.exp(-0.5 * self.a * (x - self.q) ** 2
                          + 1j * self.p * (x - self.q) + 1j * self.phase))


def overlap_real(aj, qj, ak, qk):
    """<g_j|g_k> for real Gaussians (reference:
    pyqed/moving_gaussian.py:96), broadcastable."""
    dq = qk - qj
    return ((aj * ak) ** 0.25 * jnp.sqrt(2.0 / (aj + ak))
            * jnp.exp(-0.5 * aj * ak / (aj + ak) * dq**2))


def moment_real(aj, qj, ak, qk, n=1):
    """<g_j|(x - q_j)^n|g_k> (reference: pyqed/moving_gaussian.py:?_moment)."""
    S = overlap_real(aj, qj, ak, qk)
    if n == 1:
        return (ak * (qk - qj) / (aj + ak)) * S
    if n == 2:
        return (1.0 / (aj + ak) + ak**2 * (qk - qj) ** 2 / (aj + ak) ** 2) * S
    raise ValueError(n)


def kinetic_real(aj, qj, ak, qk, mass=1.0):
    """<g_j| -1/(2m) d^2/dx^2 |g_k> for real Gaussians (closed form)."""
    S = overlap_real(aj, qj, ak, qk)
    mu = aj * ak / (aj + ak)
    dq = qj - qk
    return S * mu / (2 * mass) * (1.0 - mu * dq**2)


class WPD:
    """Dynamics on one PES in a fixed real-Gaussian basis
    (reference: pyqed/moving_gaussian.py:157).

    H and S built in closed form; evolution c(t) = S^{-1/2} e^{-i Ht' t}
    S^{-1/2} ... via the generalized eigenproblem (Löwdin).
    """

    def __init__(self, centers, widths=None, mass=1.0):
        self.q = np.asarray(centers, dtype=float)
        self.nb = len(self.q)
        self.a = (np.full(self.nb, widths if np.isscalar(widths or 1.0)
                          else 1.0) if widths is None or np.isscalar(widths)
                  else np.asarray(widths, dtype=float))
        if widths is not None and np.isscalar(widths):
            self.a = np.full(self.nb, float(widths))
        self.mass = mass
        self.v = None

    def overlap_matrix(self):
        aj = self.a[:, None]
        ak = self.a[None, :]
        qj = self.q[:, None]
        qk = self.q[None, :]
        return overlap_real(aj, qj, ak, qk)

    def kinetic_matrix(self):
        aj = self.a[:, None]
        ak = self.a[None, :]
        qj = self.q[:, None]
        qk = self.q[None, :]
        return kinetic_real(aj, qj, ak, qk, self.mass)

    def potential_matrix(self, V, nquad=40):
        """<g_j|V|g_k> by Gauss-Hermite quadrature on each pair's product
        Gaussian — vectorized over all pairs."""
        xg, wg = np.polynomial.hermite.hermgauss(nquad)
        aj = self.a[:, None, None]
        ak = self.a[None, :, None]
        qj = self.q[:, None, None]
        qk = self.q[None, :, None]
        p_ = aj + ak
        qc = (aj * qj + ak * qk) / p_
        x = qc + xg[None, None, :] * np.sqrt(2.0 / p_)
        S = np.asarray(overlap_real(self.a[:, None], self.q[:, None],
                                    self.a[None, :], self.q[None, :]))
        Vq = np.asarray(V(x))
        integral = np.einsum("q, jkq -> jk", wg, Vq) / np.sqrt(np.pi)
        return jnp.asarray(S * integral)

    def buildH(self, V):
        S = self.overlap_matrix()
        H = self.kinetic_matrix() + self.potential_matrix(V)
        self.S, self.H = jnp.asarray(S), jnp.asarray(H)
        return self.H, self.S

    def eigenstates(self, V=None, k=5):
        if V is not None or not hasattr(self, "H"):
            self.buildH(V)
        # generalized eigenproblem via Löwdin orthogonalization
        s, U = jnp.linalg.eigh(self.S)
        keep = s > 1e-10
        X = U[:, keep] * (1.0 / jnp.sqrt(s[keep]))[None, :]
        Ht = X.T @ self.H @ X
        w, c = jnp.linalg.eigh(Ht)
        return w[:k], X @ c[:, :k]

    def project(self, psi_fn, xgrid):
        """Expansion coefficients of psi(x) sampled on ``xgrid`` by solving
        S c = b with b_j = <g_j|psi> (trapezoid quadrature)."""
        x = np.asarray(xgrid)
        dx = x[1] - x[0]
        psi = np.asarray(psi_fn(x) if callable(psi_fn) else psi_fn)
        g = ((self.a[None, :] / np.pi) ** 0.25
             * np.exp(-0.5 * self.a[None, :]
                      * (x[:, None] - self.q[None, :]) ** 2))
        b = g.T @ psi * dx
        return jnp.linalg.solve(self.overlap_matrix().astype(complex),
                                jnp.asarray(b))

    def run(self, c0, dt, nt, V=None, nout=1) -> Result:
        """Propagate coefficients: i S dc/dt = H c."""
        if V is not None or not hasattr(self, "H"):
            self.buildH(V)
        s, U = jnp.linalg.eigh(self.S)
        X = U * (1.0 / jnp.sqrt(s))[None, :]
        Ht = X.T @ self.H @ X
        w, Z = jnp.linalg.eigh(Ht)
        c0 = jnp.asarray(c0, dtype=complex)
        # transform c into orthonormal basis: d = X^{-1} c = sqrt(s) U^T c
        d0 = (jnp.sqrt(s)[:, None] * U.T) @ c0
        ns = nt // nout
        times = jnp.arange(ns + 1) * dt * nout
        phases = jnp.exp(-1j * w[None, :] * times[:, None])
        d_t = jnp.einsum("nk, tk, k -> tn", Z, phases, Z.T @ d0)
        c_t = (X @ d_t.T).T
        r = Result(times=times, dt=dt, nt=nt, nout=nout)
        r.states = c_t
        r.psi = c_t[-1]
        return r

    def wavefunction(self, c, x):
        """Reconstruct psi(x) from coefficients."""
        x = jnp.asarray(x)
        g = ((self.a[None, :] / np.pi) ** 0.25
             * jnp.exp(-0.5 * self.a[None, :]
                       * (x[:, None] - self.q[None, :]) ** 2))
        return g @ jnp.asarray(c)
