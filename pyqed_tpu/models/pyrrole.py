"""Pyrrole N-H photodissociation model: S0/1pisigma* conical
intersection in Jacobi coordinates (r, q).

TPU-native counterpart of the reference pyrrole models
(reference: pyqed/models/pyrrole.py:33 ``Pyrrole``, :243
``PyrroleCation`` — the Domcke-group diabatic surfaces for the
pyrrole N-H stretch / out-of-plane coupling mode; the cation
surfaces are the fitted D0/D1 potentials).  All PES functions
broadcast over coordinate arrays and are jax-traceable; the
reference's ``eigenstates`` stub is made real here via the sine-DVR
of the radial Hamiltonian.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..units import au2ev, atomic_mass, au2amu


def _morse(r, D, a, r0):
    return D * (1.0 - jnp.exp(-a * (r - r0))) ** 2


class Pyrrole:
    """Two-state (S0 / 1pisigma*) pyrrole model in Jacobi coordinates:
    r the H--ring distance, q the dissociation-path bending angle.

    ``dpes(r, q)`` returns the (nx, ny, 2, 2) diabatic matrix on the
    product grid (reference: pyqed/models/pyrrole.py:112 ``DPES``).
    """

    nstates = 2
    r0 = 1.959                      # N-H equilibrium distance (bohr)
    rMN = 2.168                     # ring-center -- N distance

    def __init__(self):
        self.reduced_mass = self._reduced_mass()

    @staticmethod
    def _reduced_mass():
        mH = atomic_mass["H"] / au2amu
        mN = atomic_mass["N"] / au2amu
        mM = 4.0 * (atomic_mass["C"] / au2amu + mH)
        return mH * (mM + mN) / (mH + mM + mN)

    # ------------------------------------------------ internal coords
    def transform(self, r, q):
        """Jacobi (r, q) -> internal (r_NH, theta)."""
        rNH = jnp.sqrt(r ** 2 * jnp.sin(q) ** 2
                       + (r * jnp.cos(q) - self.rMN) ** 2)
        theta = jnp.arcsin(r / rNH * jnp.sin(q))
        return rNH, theta

    # ------------------------------------------------ 1D cuts (in au)
    @staticmethod
    def v11(r):
        return _morse(r, 5.117 / au2ev, 1.196, 1.959)

    @staticmethod
    def v21(r):
        return _morse(r, 8.07 / au2ev, 0.882, 1.922) + 5.584 / au2ev

    @staticmethod
    def v22(r):
        return 0.091 / au2ev * jnp.exp(-1.290 * (r - 5.203)) \
            + 4.092 / au2ev

    @staticmethod
    def omegac1(r):
        f1 = 0.5 * (1.0 + jnp.tanh((r - 2.696) / 0.00015))
        return ((5.147 / au2ev - 1.344 / au2ev * r) * (1.0 - f1)
                + 0.884 / au2ev * jnp.exp(-1.2910 * (r - 3.1)) * f1)

    @staticmethod
    def omegac2(r):
        B22 = -1.219 / au2ev
        return jnp.where(
            r <= 2.55,
            0.5 * (3.819 / au2ev + B22 * r)
            - 0.5 * jnp.sqrt((2.335 / au2ev + B22 * r) ** 2
                             + 4 * (0.226 / au2ev) ** 2),
            0.0)

    @staticmethod
    def l12(r):
        return 0.5 * (2.4 / au2ev) * (1 - jnp.tanh((r - 3.454) / 1.942))

    # ------------------------------------------------ surfaces
    def dpes(self, r, q):
        """Diabatic matrix on the (r, q) product grid -> (nx, ny, 2, 2)."""
        R, Q = jnp.meshgrid(jnp.asarray(r), jnp.asarray(q), indexing="ij")
        rNH, theta = self.transform(R, Q)
        l22 = 1.669 / au2ev
        v00 = self.v11(rNH) + 0.5 * self.omegac1(rNH) * theta ** 2
        v11 = (0.5 * (self.v21(rNH) + self.v22(rNH))
               - 0.5 * jnp.sqrt((self.v21(rNH) - self.v22(rNH)) ** 2
                                + 4 * l22 ** 2)
               + 0.5 * self.omegac2(rNH) * theta ** 2)
        v01 = self.l12(rNH) * theta
        return jnp.stack(
            [jnp.stack([v00, v01], -1), jnp.stack([v01, v11], -1)], -2)

    # keep the reference's name
    DPES = dpes

    def apes(self, r, q):
        return jnp.linalg.eigvalsh(self.dpes(r, q))

    def S0(self, r, q):
        rNH, theta = self.transform(jnp.asarray(r), jnp.asarray(q))
        return self.v11(rNH) + 0.5 * self.omegac1(rNH) * theta ** 2

    def moment_of_inertia(self, r):
        mH = atomic_mass["H"] / au2amu
        mN = atomic_mass["N"] / au2amu
        mM = 4.0 * (atomic_mass["C"] / au2amu + mH)
        mu_MN = mM * mN / (mM + mN)
        return 1.0 / (1.0 / (self.reduced_mass * r ** 2)
                      + 1.0 / (mu_MN * self.rMN ** 2))

    def eigenstates(self, nstates=3, domain=(1.5, 4.0), npts=128):
        """Vibrational levels on the S0 1D cut (the reference's
        ``eigenstates`` is a ``pass`` stub — real here via sine-DVR)."""
        from ..grid.dvr import SineDVR
        dvr = SineDVR(*domain, npts, mass=self.reduced_mass)
        rg = jnp.asarray(dvr.x)
        H = dvr.t() + jnp.diag(self.v11(rg))
        w, u = jnp.linalg.eigh(H)
        return w[:nstates], u[:, :nstates]


class PyrroleCation:
    """Pyrrole-cation D0/D1 adiabatic surfaces in the same Jacobi
    coordinates (reference: pyqed/models/pyrrole.py:243)."""

    nstates = 2
    r0 = 1.9404
    E0 = 0.2999
    rMN = 2.168

    def __init__(self):
        self.reduced_mass = Pyrrole._reduced_mass()

    transform = Pyrrole.transform
    moment_of_inertia = Pyrrole.moment_of_inertia

    @staticmethod
    def _omega(r, d2, alpha1, B11, B12, B13, B14):
        f1 = 0.5 * (1.0 + jnp.tanh((r - d2) / alpha1))
        return (B11 + B12 * r) * (1.0 - f1) + B13 * jnp.exp(-B14 * r) * f1

    def D0(self, r, q):
        rNH, theta = self.transform(jnp.asarray(r), jnp.asarray(q))
        return (_morse(rNH, 0.2167, 1.055, self.r0)
                + 0.5 * self._omega(rNH, 4.6353, 2.0202, 0.0851,
                                    -0.0126, 6.1015, 1.9383) * theta ** 2)

    def D1(self, r, q):
        rNH, theta = self.transform(jnp.asarray(r), jnp.asarray(q))
        return (_morse(rNH, 0.2028, 1.0732, 1.9537)
                + 0.5 * self._omega(rNH, 4.4689, 0.5077, 0.1278,
                                    -0.0257, 36.7638, 1.6474) * theta ** 2)

    def apes(self, r, q, n=0):
        return self.D0(r, q) if n == 0 else self.D1(r, q)
