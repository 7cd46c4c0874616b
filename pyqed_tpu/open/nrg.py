"""Bosonic numerical renormalization group for spin-boson models.

TPU-native counterpart of the reference NRG module
(reference: pyqed/nrg.py — ``Boson:18``, ``SBM:64``, ``NRG:194`` with
logarithmic discretization + Lanczos chain mapping ``discretize:225``).

The iterative diagonalization keeps the lowest ``nkeep`` states per shell;
each shell step is one dense eigh on the MXU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.linalg import dag
from ..ops.operators import destroy, boson, pauli


class SBM:
    """Spin-boson model container (reference: pyqed/nrg.py:64)."""

    def __init__(self, epsilon, Delta, omegac=1.0):
        self.omegac = omegac
        I, X, Y, Z = pauli()
        self.H = 0.5 * (-epsilon * Z + Delta * X)

    def spectral_density(self, omega, s=1.0, alpha=1.0):
        """Power-law J(w) = 2 pi alpha w_c^{1-s} w^s, w < w_c."""
        return jnp.where(omega < self.omegac,
                         2 * jnp.pi * alpha * self.omegac ** (1 - s)
                         * omega**s, 0.0)


class NRG:
    """(reference: pyqed/nrg.py:194)."""

    def __init__(self, Himp, L=2.0):
        self.L = L
        self.H = jnp.asarray(Himp)
        self.nmodes = None
        self.eta0 = None

    def discretize(self, N, s=1.0, omegac=1.0, alpha=1.0):
        """Logarithmic discretization + Lanczos tridiagonalization to the
        Wilson chain (reference: pyqed/nrg.py:225, after PRB 71, 045122).

        Returns (epsilon_n onsite, t_n hopping)."""
        n = np.arange(N)
        L = self.L
        xi = ((s + 1) / (s + 2) * (1.0 - L ** (-s - 2))
              / (1.0 - L ** (-s - 1)) * omegac * L ** (-n))
        g2 = (2 * np.pi * alpha / (s + 1) * omegac**2
              * (1 - L ** (-s - 1)) * L ** (-n * (s + 1)))
        eta0 = np.sum(g2)
        self.eta0 = eta0
        self.nmodes = N

        U = np.zeros((N, N))
        U[0, :] = np.sqrt(g2) / np.sqrt(eta0)
        t = np.zeros(N)
        eps = np.zeros(N)
        eps[0] = np.sum(U[0] ** 2 * xi)
        t[0] = np.sqrt(np.sum((xi - eps[0]) ** 2 * g2) / eta0)
        U[1] = (xi - eps[0]) * U[0] / t[0]
        for m in range(1, N - 1):
            eps[m] = np.sum(U[m] ** 2 * xi)
            t[m] = np.sqrt(np.sum(((xi - eps[m]) * U[m]
                                   - t[m - 1] * U[m - 1]) ** 2))
            U[m + 1] = ((xi - eps[m]) * U[m] - t[m - 1] * U[m - 1]) / t[m]
        eps[N - 1] = np.sum(U[N - 1] ** 2 * xi)
        self.eps_chain = eps
        self.t_chain = t
        return eps, t

    def run(self, N=10, nz=8, nkeep=64, s=1.0, omegac=1.0, alpha=0.1):
        """Iterative NRG: add Wilson-chain boson sites one at a time,
        rescale, keep the lowest ``nkeep`` states
        (completing the reference's truncated ``run``, pyqed/nrg.py:296).

        Returns the flow of the lowest few rescaled energies per shell.
        """
        I, X, Y, Z = pauli()
        eps, t = self.discretize(N, s=s, omegac=omegac, alpha=alpha)

        a = destroy(nz)
        x1 = a + dag(a)
        h_site0 = boson(eps[0], nz)

        # impurity + site 0
        H = (jnp.kron(self.H, jnp.eye(nz, dtype=complex))
             + jnp.kron(I.astype(complex), h_site0)
             + np.sqrt(self.eta0 / np.pi)
             * jnp.kron(Z.astype(complex) / 2, x1))
        w, v = jnp.linalg.eigh(H)
        nk = min(nkeep, H.shape[0])
        w, v = w[:nk], v[:, :nk]
        # chain operator b_0 in the kept basis
        bn = dag(v) @ jnp.kron(jnp.eye(2, dtype=complex), a) @ v

        flow = [np.asarray(w[:6] - w[0])]
        for m in range(1, N):
            dim = w.shape[0]
            Hk = jnp.diag(w.astype(jnp.complex128))
            Hnew = (jnp.kron(Hk, jnp.eye(nz, dtype=complex))
                    + jnp.kron(jnp.eye(dim, dtype=complex), boson(eps[m], nz))
                    + t[m - 1] * (jnp.kron(bn, dag(a))
                                  + jnp.kron(dag(bn), a)))
            w2, v2 = jnp.linalg.eigh(Hnew)
            nk = min(nkeep, Hnew.shape[0])
            w, v2 = w2[:nk], v2[:, :nk]
            bn = dag(v2) @ jnp.kron(jnp.eye(dim, dtype=complex), a) @ v2
            flow.append(np.asarray((w[:6] - w[0]) * self.L ** (m / 2)))
        self.flow = flow
        self.energies = w
        return flow
